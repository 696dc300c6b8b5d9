"""Parameter sharding rules (tensor parallelism).

Simple, robust heuristic sharding for the Serenade model family: kernels
whose final (output-feature) dimension is divisible by the ``model`` axis
size and large enough to be worth splitting are sharded on that axis;
everything else is replicated.  Because every weight use is a plain matmul /
conv on the feature axis, XLA's SPMD partitioner turns these annotations
into all-gather/reduce-scatter pairs on ICI automatically — no hand-written
collectives in model code.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Don't split tiny tensors: the all-gather latency outweighs the FLOP win.
_MIN_SHARD_ELEMS = 1 << 16


def _leaf_spec(path: str, leaf, model_size: int) -> P:
    if model_size <= 1 or leaf.ndim == 0:
        return P()
    last = leaf.shape[-1]
    if leaf.size >= _MIN_SHARD_ELEMS and last % model_size == 0 and last >= 128:
        # kernel (*, in, out) or bias-like (out,): split output features
        return P(*([None] * (leaf.ndim - 1)), "model")
    return P()


def infer_param_shardings(params, mesh: Mesh):
    """Pytree of NamedShardings matching ``params`` under ``mesh``."""
    model_size = mesh.shape.get("model", 1)

    def to_sharding(path, leaf):
        spec = _leaf_spec(jax.tree_util.keystr(path), leaf, model_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(to_sharding, params)


def shard_params(params, mesh: Mesh):
    """Device-put params according to ``infer_param_shardings``."""
    shardings = infer_param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
