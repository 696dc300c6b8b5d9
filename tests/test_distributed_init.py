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
