"""Expert-parallel MoE FFN (parallel/moe.py): routing semantics, capacity
overflow, EP-sharded equality, differentiability.

Runs on the 8-device virtual CPU mesh from conftest (like test_parallel).
"""

import jax
import jax.numpy as jnp
import numpy as np

from serenade_tpu.parallel.moe import (
    expert_mesh, init_moe_params, moe_capacity, moe_ffn, place_moe_params,
)


def _setup(b=2, t=16, d=8, d_ff=16, e=4, seed=0, dtype=jnp.float32):
    key = jax.random.key(seed)
    kp, kx = jax.random.split(key)
    params = init_moe_params(kp, e, d, d_ff, dtype=dtype)
    x = jax.random.normal(kx, (b, t, d), dtype)
    return params, x


def _reference_moe(params, x, capacity_factor, group_size=None):
    """Per-token numpy oracle of Switch top-1 routing with per-GROUP
    capacity queues (groups default to batch rows, like moe_ffn)."""
    p = {k: np.asarray(v, np.float64) for k, v in params.items()}
    b, t, d = x.shape
    s = group_size or t
    xg = np.asarray(x, np.float64).reshape(-1, s, d)
    e = p["wi"].shape[0]
    cap = moe_capacity(s, e, capacity_factor)
    y = xg.copy()
    for gi in range(xg.shape[0]):
        counts = np.zeros(e, int)
        for n in range(s):
            logits = xg[gi, n] @ p["router"]
            probs = np.exp(logits - logits.max())
            probs /= probs.sum()
            ex = probs.argmax()
            gate = probs.max()
            if counts[ex] < cap:
                counts[ex] += 1
                from scipy.special import erf

                h = xg[gi, n] @ p["wi"][ex]
                h = 0.5 * h * (1.0 + erf(h / np.sqrt(2)))
                y[gi, n] = xg[gi, n] + gate * (h @ p["wo"][ex])
            # else: overflow -> residual only
    return y.reshape(b, t, d)


def test_moe_matches_per_token_oracle():
    params, x = _setup()
    y, aux = moe_ffn(params, x, capacity_factor=8.0)  # no overflow
    ref = _reference_moe(params, x, 8.0)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
    assert 0.99 < float(aux) < 4.0  # ~1 for balance, <=E always


def test_moe_capacity_overflow_passes_residual():
    params, x = _setup(b=1, t=32)
    # capacity 1: at most one token per expert gets expert compute
    y, _ = moe_ffn(params, x, capacity_factor=1e-9)
    ref = _reference_moe(params, x, 1e-9)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
    changed = np.abs(np.asarray(y) - np.asarray(x)).max(-1) > 1e-7
    assert changed.sum() <= params["wi"].shape[0]  # <= E routed tokens


def test_moe_group_queues_are_independent():
    """Capacity queues are per group (batch row): a row full of expert-0
    fans must not consume another row's capacity — and the dense masks
    stay (G, S, E, C), linear in tokens, not the quadratic (N, E, N·f/E)
    a single global queue would need."""
    params, x = _setup(b=2, t=32)
    y, _ = moe_ffn(params, x, capacity_factor=1.0)
    ref = _reference_moe(params, x, 1.0)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-5)
    # each row gets its own cap-per-expert quota
    changed = np.abs(np.asarray(y) - np.asarray(x)).max(-1) > 1e-7
    cap = moe_capacity(32, params["wi"].shape[0], 1.0)
    for row in changed:
        assert row.sum() <= cap * params["wi"].shape[0]


def test_moe_ep_sharded_matches_single_device():
    params, x = _setup(b=4, t=32, d=16, d_ff=32, e=4)
    y_ref, aux_ref = moe_ffn(params, x, capacity_factor=2.0)

    mesh = expert_mesh(expert=4, data=2)
    placed = place_moe_params(params, mesh)
    # the memory point of EP: expert weights really shard over 'expert'
    for name in ("wi", "wo"):
        spec = placed[name].sharding.spec
        assert spec and spec[0] == "expert", (name, spec)
        shard_shape = placed[name].sharding.shard_shape(placed[name].shape)
        assert shard_shape[0] == 1  # one expert per device group

    fn = jax.jit(lambda p, xx: moe_ffn(p, xx, capacity_factor=2.0,
                                       mesh=mesh))
    with jax.sharding.use_mesh(mesh) if hasattr(
            jax.sharding, "use_mesh") else _null():
        y, aux = fn(placed, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-5)
    np.testing.assert_allclose(float(aux), float(aux_ref), atol=1e-5)


def test_moe_is_differentiable():
    params, x = _setup()

    def loss(p, xx):
        y, aux = moe_ffn(p, xx, capacity_factor=2.0)
        return jnp.sum(y ** 2) + 0.01 * aux

    grads = jax.grad(loss)(params, x)
    for k, g in grads.items():
        assert np.isfinite(np.asarray(g)).all(), k
    # router receives gradient through the gate (Switch property)
    assert np.abs(np.asarray(grads["router"])).max() > 0


def test_moe_capacity_helper():
    assert moe_capacity(64, 4, 1.0) == 16
    assert moe_capacity(64, 4, 1.25) == 20
    assert moe_capacity(3, 4, 1.0) == 1


class _null:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False
