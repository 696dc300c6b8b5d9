"""Device mesh construction and batch sharding.

The reference's only distribution strategy is single-node DDP over NCCL
(SURVEY §2.3; ssc_train.py:179,351-359).  Here distribution is first-class:
a `jax.sharding.Mesh` with named axes

* ``data``  — batch (data parallel; gradient psum inserted by XLA),
* ``model`` — tensor parallel: large kernels are sharded on their output
  feature axis, attention on heads (see ``sharding.py``).

Multi-host initialization uses ``jax.distributed.initialize`` (call
``maybe_init_distributed`` once per process); within a slice collectives ride
ICI, across slices DCN — XLA handles placement from the mesh device order.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_distributed_initialized = False


def maybe_init_distributed() -> None:
    """Initialize JAX multi-process runtime when launched under a cluster
    (no-op for single-process; safe to call repeatedly).

    Order matters: the env check comes FIRST — ``jax.process_count()`` (or
    any device query) initializes the backend, after which
    ``jax.distributed.initialize`` is a no-op-too-late.  When the
    coordinator env is unset this function must not touch any jax API that
    freezes the backend.
    """
    global _distributed_initialized
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not coord:
        return
    if _distributed_initialized:
        return
    try:
        if jax._src.distributed.global_state.client is not None:
            _distributed_initialized = True
            return
    except Exception:  # pragma: no cover - private-API drift; flag below
        pass
    # On SLURM/OpenMPI/TPU pods jax auto-detects process topology; for a
    # plain launcher (utils/launch_hosts.sh) it comes from env.
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    try:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc) if nproc else None,
            process_id=int(pid) if pid else None,
        )
    except RuntimeError as e:  # pragma: no cover
        if "already initialized" not in str(e):
            raise
    _distributed_initialized = True


def make_mesh(
    data: int = -1,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a 2-D ('data', 'model') mesh.

    ``data=-1`` consumes all remaining devices. The model axis is placed
    innermost (fastest-varying) so tensor-parallel collectives stay on the
    shortest ICI hops.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(
            f"mesh data={data} x model={model} needs {data * model} "
            f"devices but only {n} are available"
        )
    if data * model != n:
        devices = devices[: data * model]
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays with a leading batch axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec(tree):
    """PartitionSpec pytree sharding every leaf's leading axis on 'data'."""
    return jax.tree_util.tree_map(lambda _: P("data"), tree)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with its leading axis sharded over 'data'."""
    sharding = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)
