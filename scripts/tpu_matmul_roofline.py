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

CHAIN = 64          # weight bank size (HBM-bounded); see `repeats` below


def probe(rows, k, cols, iters=30):
    """TFLOP/s sustained by chained (rows,k)x(k,cols) bf16 matmuls.

    Every chained matmul runs the SAME (rows,k)x(k,cols) geometry: for
    non-square shapes the (rows,cols) output is folded back to (rows,k)
    between steps by a chunk-sum over cols (every output column feeds
    the carry, so the simplifier cannot narrow the dot; the fold fuses
    into the dot epilogue) instead of multiplying by the transpose — so
    the reported rate is the single geometry, not a blend with the
    transposed one.  Requires max(k,cols) % min(k,cols) == 0.

    Small shapes repeat the CHAIN-weight bank enough times that the
    dispatch runs well past the ~2.3 ms tunnel floor (>=100 GFLOP per
    dispatch), so the rate is a device rate, not a floor measurement.
    """
    key = jax.random.key(0)
    x = jax.random.normal(key, (rows, k), jnp.bfloat16)
    # one weight per chain step so the chain cannot collapse; weights are
    # scaled so the activations stay finite across the applications
    ws = jax.random.normal(jax.random.key(1), (CHAIN, k, cols),
                           jnp.bfloat16) * (1.0 / jnp.sqrt(k))
    flops_per_mm = 2.0 * rows * k * cols
    repeats = max(1, int(-(-100e9 // (CHAIN * flops_per_mm))))

    @jax.jit
    def chain(x, ws, eps):
        x = x + eps  # operand varies per dispatch (tunnel dedupe)

        def body(h, w):
            y = lax.dot(h, w, precision=lax.Precision.DEFAULT,
                        preferred_element_type=jnp.bfloat16)
            if cols == k:
                h = y
            elif cols > k:
                assert cols % k == 0, (rows, k, cols)
                h = (y.reshape(rows, cols // k, k).sum(axis=1)
                     * jnp.bfloat16(k / cols))
            else:
                assert k % cols == 0, (rows, k, cols)
                h = jnp.tile(y, (1, k // cols))
            return h, ()

        def rep(_, h):
            h, _ = lax.scan(body, h, ws)
            return h

        h = lax.fori_loop(0, repeats, rep, x)
        return jnp.sum(h.astype(jnp.float32))

    # warmup (compile + first run); eps outside the timed 1e-4*i range so
    # the tunnel cannot serve a timed dispatch from the warmup (dedupe)
    float(chain(x, ws, jnp.bfloat16(7.0)))
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = chain(x, ws, jnp.bfloat16(1e-4 * (i + 1)))
    float(out)  # scalar fetch barrier
    dt = (time.perf_counter() - t0) / iters
    flops = repeats * CHAIN * flops_per_mm
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
