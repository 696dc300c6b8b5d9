"""CFM ODE solver options: euler (reference parity), midpoint, ab2.

A neural vector field is too rough for convergence-order assertions, so
each solver is verified STEP-FOR-STEP against a hand-rolled Python loop
driving the same estimator — this pins the grid, the coefficients, and
the ab2 Euler bootstrap exactly."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from serenade_tpu.models.cfm import CFM

B, T, C_OUT, C_COND = 1, 32, 8, 10


@pytest.fixture(scope="module")
def cfm_setup():
    model = CFM(
        in_channels=C_COND + C_OUT, out_channels=C_OUT, spk_embed_dim=16,
        decoder_channels=(16, 16), decoder_attention_head_dim=16,
    )
    ks = jax.random.split(jax.random.key(0), 4)
    mu = jax.random.normal(ks[0], (B, T, C_COND))
    mask = jnp.ones((B, T, 1))
    spk = jax.random.normal(ks[1], (B, 16))
    x1 = jax.random.normal(ks[2], (B, T, C_OUT))
    params = model.init(
        {"params": jax.random.key(1)}, x1, mask, mu, spk,
        rng=jax.random.key(2), deterministic=True,
    )
    return model, params, mu, mask, spk


def _sample(model, params, mu, mask, spk, n, solver):
    return model.apply(
        params, mu, mask, spk, n_timesteps=n, rng=jax.random.key(5),
        solver=solver, method="inference",
    )


def _field(model, params, mu, mask, spk):
    """v(x, t) through the same estimator the solvers use."""
    def v(x, t):
        return np.asarray(model.apply(
            params, x, mask, mu, jnp.broadcast_to(jnp.float32(t), (B,)),
            spk, True, method=lambda m, *a: m.estimator(*a)))
    return v


def _reference_trajectory(v, z, n, solver):
    ts = np.linspace(0.0, 1.0, n + 1)
    x = np.asarray(z)
    if solver == "euler":
        for t0, t1 in zip(ts[:-1], ts[1:]):
            x = x + (t1 - t0) * v(x, t0)
    elif solver == "midpoint":
        for t0, t1 in zip(ts[:-1], ts[1:]):
            h = t1 - t0
            v1 = v(x, t0)
            x = x + h * v(x + 0.5 * h * v1, t0 + 0.5 * h)
    elif solver == "ab2":
        h = ts[1] - ts[0]
        v_prev = v(x, ts[0])
        x = x + h * v_prev
        for t0, t1 in zip(ts[1:-1], ts[2:]):
            h = t1 - t0
            vn = v(x, t0)
            x = x + h * (1.5 * vn - 0.5 * v_prev)
            v_prev = vn
    return x


@pytest.mark.parametrize("solver", ["euler", "midpoint", "ab2"])
def test_solver_matches_reference_loop(cfm_setup, solver):
    model, params, mu, mask, spk = cfm_setup
    n = 7
    out = _sample(model, params, mu, mask, spk, n, solver)
    # replay the exact initial noise the module draws
    z = jax.random.normal(jax.random.key(5), (B, T, C_OUT), jnp.float32)
    z = z * 0.667
    v = _field(model, params, mu, mask, spk)
    ref = _reference_trajectory(v, z, n, solver)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=1e-4)


def test_solver_through_full_model_and_cli_flag(tmp_path):
    """`solver` plumbs through Serenade.inference (decode CLI flag)."""
    from serenade_tpu.models import Serenade

    model = Serenade(
        input_dim=16, output_dim=8, encoder_channels=8,
        decoder_channels=16, gst_embed_dim=16,
        decoder_attention_head_dim=16, dtype=jnp.float32,
    )
    b, t = 1, 32
    ks = jax.random.split(jax.random.key(0), 6)
    batch = dict(
        x=jax.random.normal(ks[0], (b, t, 16)),
        lengths=jnp.array([t]),
        logmel=jax.random.normal(ks[1], (b, t, 8)),
        midi=jax.random.uniform(ks[2], (b, t, 1)),
        loud=jax.random.uniform(ks[3], (b, t, 1)),
    )
    params = model.init(
        {"params": jax.random.key(1)}, batch["x"], batch["lengths"],
        batch["logmel"], batch["midi"], batch["loud"], rng=jax.random.key(2),
        deterministic=True,
    )
    for solver in ("euler", "ab2"):
        mel = model.apply(
            params, batch["x"], batch["lengths"], batch["midi"],
            batch["loud"], batch["x"], batch["lengths"], batch["logmel"],
            batch["midi"], batch["loud"], rng=ks[4], n_timesteps=4,
            solver=solver, method="inference",
        )
        assert mel.shape == (b, t, 8)
        assert np.isfinite(np.asarray(mel)).all()
