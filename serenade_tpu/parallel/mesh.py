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

import logging
import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

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
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Build a 2-D mesh (default axes ('data', 'model')).

    ``data=-1`` consumes all remaining devices. The second axis is placed
    innermost (fastest-varying) so its collectives stay on the shortest
    ICI hops; when the mesh uses ALL devices the layout comes from
    ``mesh_utils.create_device_mesh``, which orders axes along the
    physical TPU topology (a plain ``jax.devices()`` reshape guarantees
    no adjacency on multi-host pods).

    ``expert_mesh``/``pipeline_mesh`` (moe.py, pipeline.py) are this with
    axis_names ('data', 'expert') / ('data', 'pipe').
    """
    explicit = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model != 0:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model > n:
        raise ValueError(
            f"mesh {axis_names[0]}={data} x {axis_names[1]}={model} needs "
            f"{data * model} devices but only {n} are available"
        )
    if data * model != n:
        # legitimate for tests/partial meshes, but never silent: the
        # remaining devices IDLE
        logger.warning(
            "mesh %s=%d x %s=%d uses %d of %d devices; %d stay idle",
            axis_names[0], data, axis_names[1], model, data * model, n,
            n - data * model)
        devices = devices[: data * model]
    elif not explicit:
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_device_mesh(
                (data, model), devices=devices)
            return Mesh(dev_array, axis_names=tuple(axis_names))
        except Exception:  # pragma: no cover — odd shapes/backends
            logger.info("create_device_mesh failed; using enumeration "
                        "order", exc_info=True)
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def composed_mesh(
    data: int = 1,
    model: int = 1,
    pipe: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """3-axis ``('pipe', 'data', 'model')`` mesh composing dp × tp × pp
    in ONE program (VERDICT r3 item 8).

    Axis placement follows collective frequency: ``model`` innermost —
    its per-layer psum is the latency-critical collective and rides the
    shortest ICI hops; ``data`` middle (one gradient all-reduce per
    step); ``pipe`` outermost (one ppermute per pipeline tick).
    """
    explicit = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    need = data * model * pipe
    if need > n:
        raise ValueError(
            f"mesh pipe={pipe} x data={data} x model={model} needs "
            f"{need} devices but only {n} are available")
    if need != n:
        logger.warning(
            "mesh pipe=%d x data=%d x model=%d uses %d of %d devices; "
            "%d stay idle", pipe, data, model, need, n, n - need)
        devices = devices[:need]
    elif not explicit:
        try:
            from jax.experimental import mesh_utils

            dev_array = mesh_utils.create_device_mesh(
                (pipe, data, model), devices=devices)
            return Mesh(dev_array, axis_names=("pipe", "data", "model"))
        except Exception:  # pragma: no cover — odd shapes/backends
            logger.info("create_device_mesh failed; using enumeration "
                        "order", exc_info=True)
    dev_array = np.asarray(devices).reshape(pipe, data, model)
    return Mesh(dev_array, axis_names=("pipe", "data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for arrays with a leading batch axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_spec(tree):
    """PartitionSpec pytree sharding every leaf's leading axis on 'data'."""
    return jax.tree_util.tree_map(lambda _: P("data"), tree)


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with its leading axis sharded over 'data'.

    One pytree ``device_put`` (single runtime dispatch), not one per leaf
    — per-dispatch overhead is ~2.3 ms on tunneled links and this runs
    per serving request / train step."""
    return jax.device_put(batch, data_sharding(mesh))
