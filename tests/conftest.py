"""Test harness: force an 8-device virtual CPU mesh.

This environment's sitecustomize registers the `axon` remote-TPU platform at
interpreter startup and exports JAX_PLATFORMS=axon, so env vars alone don't
stick — the platform must be switched via jax.config after import.
XLA_FLAGS must still be set before the CPU client initializes.

Multi-chip sharding logic is tested by splitting the host CPU into 8 XLA
devices (SURVEY §4 note: the reference has no analogue — its DDP paths
simply don't run without GPUs).
"""

import os

# subprocess-spawning tests (recipe stages, launch.sh, dryrun re-exec) need
# serenade_tpu importable in children regardless of how pytest was invoked
_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_pp = os.environ.get("PYTHONPATH", "")
if _repo_root not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _repo_root + (os.pathsep + _pp if _pp else "")
    )

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
# amortize XLA CPU compiles across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/serenade_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.device_count() >= 8, (
    f"expected 8 virtual CPU devices, got {jax.device_count()} "
    f"on {jax.default_backend()}"
)
