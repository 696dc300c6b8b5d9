"""Sustained bf16 matmul ceiling probe for the MFU roofline writeup.

Measures what a *pure chained matmul* sustains on this chip at (a) the
ideal 4096^3 shape and (b) the UNet's own training geometry (rows = B*T,
C = contraction width), so the train-step MFU can be compared against a
practical, measured ceiling instead of the 197 TFLOP/s nameplate
(docs/PROFILING.md "roofline" section).

Tunnel-safe methodology (CLAUDE.md / docs/PROFILING.md): the matmul is
chained inside one jitted ``lax.scan`` (operands device-resident, no
per-dispatch upload), every dispatch varies its operand (fold the
iteration index in), and timing ends with a scalar fetch barrier.
"""

import json
import os
import time

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

CHAIN = 64          # matmuls per dispatch: amortizes the ~2.3 ms tunnel floor


def probe(rows, k, cols, iters=30):
    """TFLOP/s sustained by `CHAIN` chained (rows,k)x(k,cols) bf16 matmuls."""
    key = jax.random.key(0)
    x = jax.random.normal(key, (rows, k), jnp.bfloat16)
    # one weight per chain step so the chain cannot collapse; weights are
    # scaled so the activations stay finite across 64 applications
    ws = jax.random.normal(jax.random.key(1), (CHAIN, k, cols),
                           jnp.bfloat16) * (1.0 / jnp.sqrt(k))

    @jax.jit
    def chain(x, ws, eps):
        x = x + eps  # operand varies per dispatch (tunnel dedupe)

        def body(h, w):
            h = lax.dot(h, w, precision=lax.Precision.DEFAULT,
                        preferred_element_type=jnp.bfloat16)
            return h, ()

        if k == cols:
            h, _ = lax.scan(body, x, ws)
        else:  # non-square: alternate (k->cols) and (cols->k) pairs
            def body2(h, w2):
                w, wt = w2
                h = lax.dot(h, w, preferred_element_type=jnp.bfloat16)
                h = lax.dot(h, wt, preferred_element_type=jnp.bfloat16)
                return h, ()
            wts = jnp.swapaxes(ws, 1, 2) * (jnp.sqrt(k) / jnp.sqrt(cols))
            h, _ = lax.scan(body2, x, (ws, wts))
        return jnp.sum(h.astype(jnp.float32))

    # warmup (compile + first run)
    float(chain(x, ws, jnp.bfloat16(0.001)))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = chain(x, ws, jnp.bfloat16(1e-4 * (i + 1)))
    float(out)  # scalar fetch barrier
    dt = (time.perf_counter() - t0) / iters
    n_mm = CHAIN if k == cols else 2 * CHAIN
    flops = n_mm * 2.0 * rows * k * cols
    return flops / dt / 1e12, dt * 1e3


if __name__ == "__main__":
    results = {}
    shapes = [
        ("ideal_4096", 4096, 4096, 4096),
        # UNet training geometry: rows = B*T at the bench shape (16*512)
        # and the real-length shape (16*1280); C=512 square kernels
        ("unet_b16_T512_C512", 16 * 512, 512, 512),
        ("unet_b16_T1280_C512", 16 * 1280, 512, 512),
        # the UNet FFN / time-MLP wide shapes
        ("wide_8192x512x2048", 8192, 512, 2048),
        ("timemlp_16x2048x2048", 16, 2048, 2048),
    ]
    for name, r, k, c in shapes:
        try:
            tflops, ms = probe(r, k, c)
            results[name] = {"tflops": round(tflops, 1),
                             "ms_per_dispatch": round(ms, 2)}
            print(name, results[name], flush=True)
        except Exception as e:  # keep going; partial data is still data
            results[name] = {"error": str(e)[:200]}
            print(name, "ERROR", e, flush=True)
    print(json.dumps(results))
