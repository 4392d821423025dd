from . import mesh, partition, sharded_embedding, ring_attention  # noqa: F401
