"""Parameter partitioning rules (t5x-style, but rule-free: by leaf shape).

Tensor parallelism for conv nets maps naturally onto the output-channel axis:
conv weights (D,H,W,I,O) shard on O, per-channel vectors (bias, BN stats) on
their only axis, 2-D linear weights (out,in) on out. GSPMD then runs each
conv as a channel-sharded contraction and inserts all-gathers only where a
layer consumes the full channel axis (concats, decoder head).

Any leaf whose target axis is not divisible by the mesh's model-axis size is
replicated — correctness never depends on divisibility.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_VEC_KEYS = {"b", "scale", "bias", "mean", "var", "in_proj_b"}


def _spec_for_leaf(path: tuple, leaf, model_size: int) -> P:
    keys = [p.key for p in path if hasattr(p, "key")]
    key = keys[-1] if keys else None
    if leaf.ndim == 0:
        return P()
    if key == "w" and leaf.ndim >= 3:
        # conv DHWIO / WIO: shard the out-channel (last) axis;
        # bilinear (O,I,J): shard O
        axis = 0 if "bilinear" in keys else leaf.ndim - 1
        if leaf.shape[axis] % model_size == 0:
            spec = [None] * leaf.ndim
            spec[axis] = "model"
            return P(*spec)
        return P()
    if key in ("w", "in_proj_w") and leaf.ndim == 2:
        if leaf.shape[0] % model_size == 0:
            return P("model", None)
        return P()
    if key in _VEC_KEYS and leaf.ndim == 1:
        if leaf.shape[0] % model_size == 0:
            return P("model")
        return P()
    return P()


def param_partition_specs(params, mesh: Mesh):
    """PartitionSpec pytree for a params/state tree."""
    model_size = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _spec_for_leaf(path, leaf, model_size), params
    )


def shard_pytree(tree, mesh: Mesh, specs=None):
    """Place a pytree on the mesh according to specs (default: partition rules)."""
    if specs is None:
        specs = param_partition_specs(tree, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )
