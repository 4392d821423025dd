"""Partition rules: parameter/batch pytrees -> PartitionSpecs (F1-F4).

Regex-over-path rules in the style of public JAX LLM codebases (SNIPPETS.md
[3] ``match_partition_rules``). The rules encode the sharding design:

- **Tables** (``item_emb``, ``user_emb``, ``fused_feat``): row-sharded over the
  flattened (data, model) axes — the "EP" layout. XLA compiles lookups into
  collective gathers; the explicit all-to-all path lives in
  sharded_embedding.py.
- **TP**: tower DNNs and attention/FFN projections column-split on the input
  side (``P(None, 'model')``) and row-split on the output side
  (``P('model', None)``) so each pair needs one psum.
- **Replicated**: LayerNorms, positional table, biases of row-split layers.
- **Batch**: leading axis on ``data``; activations constrained via
  ``with_sharding_constraint`` where XLA needs the hint.
"""

from __future__ import annotations

import re
from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TABLE_AXES = ("pipe", "data", "model")

# (path regex, PartitionSpec) — first match wins. Paths look like
# "item_emb", "blocks/3/attn/q/w", "mm_proj/81/w", ...
PARAM_RULES: Tuple[Tuple[str, P], ...] = (
    (r"^(item_emb|user_emb|fused_feat)$", P(TABLE_AXES, None)),
    (r"^pos_emb$", P()),
    (r"^(itemdnn|userdnn|mm_proj/[^/]+)/w$", P(None, "model")),
    (r"^(itemdnn|userdnn|mm_proj/[^/]+)/b$", P("model")),
    # attention: qkv column-split, o row-split
    (r"/attn/(q|k|v)/w$", P(None, "model")),
    (r"/attn/(q|k|v)/b$", P("model")),
    (r"/attn/o/w$", P("model", None)),
    (r"/attn/o/b$", P()),
    # HSTU: packed uvqk column-split, out row-split, rab replicated
    (r"/hstu/uvqk/w$", P(None, "model")),
    (r"/hstu/uvqk/b$", P("model")),
    (r"/hstu/out/w$", P("model", None)),
    (r"/hstu/out/b$", P()),
    (r"/hstu/(rab|attn_ln/.*)$", P()),
    # FFN: in column-split, out row-split
    (r"/ffn/(fc1/w|w13)$", P(None, "model")),
    (r"/ffn/fc1/b$", P("model")),
    (r"/ffn/(fc2/w|w2)$", P("model", None)),
    (r"/ffn/fc2/b$", P()),
    # everything else (layernorms, rqvae, ...) replicated
    (r".*", P()),
)

BATCH_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*", P(("pipe", "data"))),
)


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def match_partition_rules(rules, tree) -> Any:
    """Map every leaf to the first rule whose regex matches its path."""

    def match(path, leaf):
        s = _path_str(path)
        for pattern, spec in rules:
            if re.search(pattern, s):
                ndim = getattr(leaf, "ndim", 0)
                # encoder blocks are stacked with a leading [num_blocks] scan
                # axis (models/encoder.py): rules address the trailing dims;
                # the leading axis shards over ``pipe`` (a no-op at pipe=1,
                # the stage slice under pipeline parallelism)
                if s.startswith("blocks/"):
                    spec = P("pipe", *spec)
                # drop axes the leaf doesn't have (e.g. 1-D bias with 2-D rule)
                return P(*spec[:ndim]) if len(spec) > ndim else spec
        return P()

    return jax.tree_util.tree_map_with_path(match, tree)


def param_shardings(mesh: Mesh, params) -> Any:
    specs = match_partition_rules(PARAM_RULES, params)
    return jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                        is_leaf=lambda x: isinstance(x, P))


def shard_params(mesh: Mesh, params) -> Any:
    """device_put params with the rule shardings, padding row-sharded tables
    to a shard multiple first (padding rows are never addressed — ids stay
    below the logical row count; table norms are unchanged by zero rows)."""
    specs = match_partition_rules(PARAM_RULES, params)
    n_row_shards = int(jax.numpy.prod(
        jax.numpy.asarray([mesh.shape[a] for a in TABLE_AXES])))

    def put(leaf, spec):
        if (spec and len(spec) >= 1 and spec[0] == TABLE_AXES
                and getattr(leaf, "ndim", 0) == 2):
            rows = leaf.shape[0]
            padded = n_row_shards * (-(-rows // n_row_shards))
            if padded != rows:
                leaf = jax.numpy.pad(leaf, ((0, padded - rows), (0, 0)))
        if (spec and len(spec) >= 1 and spec[0] == TABLE_AXES
                and getattr(leaf, "ndim", 0) == 3):
            # PACKED table [G, 8, 128]: the group dim must divide evenly —
            # padded_table_rows pads to 256 rows (16 groups at D=64), which
            # covers up to 16 table shards; never pad here (the host shard
            # plans and the checkpoint layout assume the init-time shape)
            assert leaf.shape[0] % n_row_shards == 0, (
                f"packed table group dim {leaf.shape[0]} not divisible by "
                f"{n_row_shards} table shards (max supported: 16)")
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, params, specs,
                        is_leaf=lambda x: not isinstance(x, (dict, list)))


def unpad_like(params_padded, params_template) -> Any:
    """Strip table-row padding added by shard_params (for checkpoint save)."""

    def cut(p, t):
        if getattr(p, "shape", None) != getattr(t, "shape", None) \
                and getattr(p, "ndim", 0) == 2:
            return p[: t.shape[0]]
        return p

    return jax.tree.map(cut, params_padded, params_template)


def batch_shardings(mesh: Mesh, batch) -> Any:
    """Batch leaves shard consumer-consistently: [B, L, ...] leaves put L on
    the ``seq`` axis (the layout the ring-attention shard_map and the
    seq-sharded loss path consume — anything else makes the SPMD partitioner
    fully rematerialize ids to re-shard them), 1-D leaves just on ``data``.
    Sparse-table plan leaves (host dedup + shard plans) are NOT batch-shaped
    and replicate — the shard_map gather/scatter slices them itself."""

    def spec(path, leaf):
        s = _path_str(path)
        if s.startswith("dedup_") and mesh.shape.get("data", 1) > 1:
            # STACKED tower-dedup plan ([S, cap...] / [S, site...] leaves,
            # one column per data shard — trainer.augment_batch_dedup):
            # shard the stack dim so the vmapped tower + spreads stay
            # shard-local (models/baseline.dedup_spreads). Keyed on the
            # leaf SHAPE too, not just the name: a single-device 1-D plan
            # landing on a data>1 mesh would silently mis-spread along the
            # capacity/site dim — fail loudly instead.
            S = mesh.shape.get("pipe", 1) * mesh.shape["data"]
            if getattr(leaf, "ndim", 0) < 1 or leaf.shape[0] != S:
                raise ValueError(
                    f"stacked tower-dedup leaf {s!r} has shape "
                    f"{getattr(leaf, 'shape', ())} — expected leading dim "
                    f"{S} (one column per data shard); was the batch "
                    "prepared with augment_batch_dedup(n_data_shards="
                    f"{S})?")
            return NamedSharding(mesh, P(("pipe", "data")))
        if s.startswith(("touched_uids", "tshard_", "sparse_plans",
                         "scatter_", "sampled_neg_ids", "dedup_")):
            # single-device dedup_* leaves index a replicated [U, D] tower
            return NamedSharding(mesh, P())
        if getattr(leaf, "ndim", 1) >= 2:
            return NamedSharding(mesh, P(("pipe", "data"), "seq"))
        return NamedSharding(mesh, P(("pipe", "data")))

    return jax.tree_util.tree_map_with_path(spec, batch)


def replicated(mesh: Mesh, tree) -> Any:
    return jax.tree.map(lambda _: NamedSharding(mesh, P()), tree)


def opt_state_shardings(mesh: Mesh, opt_state, params) -> Any:
    """Optimizer moments shard like their parameters; scalars replicate.

    Walks the opt-state pytree; any subtree whose structure equals the param
    tree (optax's mu/nu moments) gets the param shardings, other leaves
    replicate.
    """
    pshard = param_shardings(mesh, params)
    param_treedef = jax.tree.structure(params)

    def assign(sub):
        if jax.tree.structure(sub) == param_treedef:
            return pshard
        return jax.tree.map(lambda _: NamedSharding(mesh, P()), sub)

    # opt_state is a (possibly nested) tuple of optax states (NamedTuples)
    def walk(node):
        if jax.tree.structure(node) == param_treedef:
            return pshard
        if isinstance(node, tuple) and type(node) is not tuple:  # NamedTuple
            return type(node)(*[walk(f) for f in node])
        if isinstance(node, (tuple, list)):
            return type(node)(walk(f) for f in node)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return NamedSharding(mesh, P())

    return walk(opt_state)
