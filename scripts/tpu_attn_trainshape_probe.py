"""xla vs flash attention at the TRAINING shape (B=16), fwd+bwd.

FLASH_MIN_T=2048 was set from B=1 decode-shape device traces
(docs/PROFILING.md).  At batch 16 the (B,H,T,T) f32 score tensor is 16x
bigger (419 MB at T=1280) and XLA must materialize it in fwd AND bwd —
the crossover plausibly sits far below 2048.  Chained-dispatch probe,
operands varied, scalar-fetch barrier (tunnel methodology).

Geometry matches the flagship UNet's BasicTransformerBlock exactly
(models/unet.py:177-178): heads=4 x head_dim=512, packed q/k/v dim
2048.  (An earlier revision probed Dh=128/packed 512 — 4x fewer QK/PV
FLOPs than the real block — and its crossover did not transfer;
ADVICE r4.)"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

from serenade_tpu.ops.attention import multi_head_attention

B, H, DH = 16, 4, 512   # models/unet.py:177-178 (head_dim is PER HEAD)


def probe(t, backend, iters=20):
    q = jax.random.normal(jax.random.key(0), (B, t, H * DH), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (B, t, H * DH), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (B, t, H * DH), jnp.bfloat16)
    mask = jnp.ones((B, t), jnp.float32).at[1:, t - 37:].set(0.0)

    def loss(q, k, v):
        o = multi_head_attention(q, k, v, num_heads=H, key_mask=mask,
                                 backend=backend)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    grad = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))

    def run(i):
        return grad(q + jnp.bfloat16(1e-3 * i), k, v)

    float(run(1000)[0])  # compile+warm
    float(run(2000)[0])
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = run(i)
    float(out[0])
    return (time.perf_counter() - t0) / iters * 1e3


if __name__ == "__main__":
    res = {}
    # 512/1280 = the bench + real-length bucket tops; 640 = the UNet
    # mid-block resolution (T/2) inside a T=1280 step
    for t in (512, 640, 1280):
        for backend in ("xla", "flash"):
            try:
                ms = probe(t, backend)
                res[f"T{t}_{backend}"] = round(ms, 2)
                print(f"T={t} {backend}: {ms:.2f} ms", flush=True)
            except Exception as e:
                res[f"T{t}_{backend}"] = f"ERROR {str(e)[:120]}"
                print(f"T={t} {backend}: ERROR {e}", flush=True)
    print(json.dumps(res))
