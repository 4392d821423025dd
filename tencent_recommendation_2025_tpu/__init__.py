"""TPU-native generative sequence-recommender engine.

A from-scratch JAX/XLA/Pallas framework covering (and extending) the role of
the reference competition entry ``Puiching-Memory/Tencent_Recommendation_2025``
(``/root/reference``): next-item retrieval over user behavior sequences on
TencentGR-format data.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

- ``data``      — L0 binary formats + L1 streaming, fixed-shape input pipeline
- ``models``    — L2 feature-fusion towers, transformer & HSTU encoders, RQ-VAE
- ``ops``       — Pallas TPU kernels + XLA compute ops (attention, lookup, losses)
- ``parallel``  — mesh/axis conventions, sharded embedding tables, ring attention
- ``retrieval`` — L3 exact MIPS top-k on device + C++ HNSW host tool + HR/NDCG eval
- ``train``     — L4 training loop, checkpointing, telemetry
- ``cli``       — train/infer drivers with the reference's env-var contract
"""

__version__ = "0.1.0"
