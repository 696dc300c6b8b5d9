"""Few-step distillation: endpoint + reflow modes, quantified quality.

trainers/distill.py pairs each noise draw with the trained teacher's ODE
endpoint and fine-tunes the CFM on them — 'endpoint' mode regresses the
student's own k-step rollout onto the endpoint (best at the fixed k),
'reflow' fine-tunes the straight-path CFM loss (rectified flow;
straightens every step count).  These tests pin (a) the explicit-x0
plumbing, (b) the Serenade-level pair generator + step contract
(cfm-only updates), and (c) the headline claim — measured on a TRAINED
field: an endpoint-distilled student at 2 Euler steps reaches the
teacher's 10-step quality, which no undistilled few-step sampler does."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from serenade_tpu.models.cfm import CFM

B, T, C_OUT, C_COND = 4, 32, 8, 10


def _mcd_db(a, b):
    """DCT-cepstral distortion (dB), gain coefficient excluded."""
    import scipy.fft

    ca = scipy.fft.dct(np.asarray(a), type=2, axis=-1, norm="ortho")
    cb = scipy.fft.dct(np.asarray(b), type=2, axis=-1, norm="ortho")
    d = ca[..., 1:] - cb[..., 1:]
    return float(np.mean(10.0 / np.log(10.0)
                         * np.sqrt(2.0 * np.sum(d * d, axis=-1))))


@pytest.fixture(scope="module")
def small_cfm():
    model = CFM(in_channels=C_COND + C_OUT, out_channels=C_OUT,
                spk_embed_dim=16, decoder_channels=(16, 16),
                decoder_attention_head_dim=16)
    ks = jax.random.split(jax.random.key(0), 4)
    mu = jax.random.normal(ks[0], (B, T, C_COND))
    mask = jnp.ones((B, T, 1))
    spk = jax.random.normal(ks[1], (B, 16))
    x1 = jax.random.normal(ks[2], (B, T, C_OUT))
    params = model.init({"params": jax.random.key(1)}, x1, mask, mu, spk,
                        rng=jax.random.key(2), deterministic=True)
    return model, params, mu, mask, spk


def test_inference_x0_matches_rng_draw(small_cfm):
    """inference(x0=...) integrates from exactly that source: feeding the
    rng path's own draw reproduces the rng path bit-for-bit."""
    model, params, mu, mask, spk = small_cfm
    key = jax.random.key(9)
    via_rng = model.apply(params, mu, mask, spk, n_timesteps=4, rng=key,
                          solver="euler", method="inference")
    z = 0.667 * jax.random.normal(key, (B, T, C_OUT), jnp.float32)
    via_x0 = model.apply(params, mu, mask, spk, n_timesteps=4, rng=None,
                         solver="euler", x0=z, method="inference")
    np.testing.assert_array_equal(np.asarray(via_rng), np.asarray(via_x0))


def test_compute_loss_x0_pins_the_flow_source(small_cfm):
    """With x0 given the loss regresses onto u = x1 - (1-σ)·x0 — for a
    constant field this is checkable in closed form at any t."""
    model, params, mu, mask, spk = small_cfm
    x1 = jax.random.normal(jax.random.key(3), (B, T, C_OUT))
    x0 = jax.random.normal(jax.random.key(4), (B, T, C_OUT))
    loss_a, _ = model.apply(params, x1, mask, mu, spk, rng=jax.random.key(5),
                            x0=x0, deterministic=True, method="compute_loss")
    loss_b, _ = model.apply(params, x1, mask, mu, spk, rng=jax.random.key(5),
                            x0=x0, deterministic=True, method="compute_loss")
    # deterministic given (rng, x0): same draw of t, same interpolant
    assert float(loss_a) == float(loss_b)
    # and different from the fresh-z path under the same key
    loss_c, _ = model.apply(params, x1, mask, mu, spk, rng=jax.random.key(5),
                            deterministic=True, method="compute_loss")
    assert float(loss_a) != float(loss_c)


def test_make_reflow_batch_and_step_contract():
    """Serenade-level pair generation + distill step: shapes, teacher
    endpoint consistency, and cfm-only updates (encoder/GST frozen)."""
    from serenade_tpu.models import Serenade
    from serenade_tpu.trainers import build_optimizer
    from serenade_tpu.trainers.distill import (
        build_distill_step, distill_trainable_mask,
    )
    from serenade_tpu.trainers.train_step import create_train_state

    model = Serenade(
        input_dim=12, output_dim=8, encoder_channels=8,
        decoder_channels=16, gst_embed_dim=16,
        decoder_attention_head_dim=16, dtype=jnp.float32,
    )
    b, t = 2, 32
    ks = jax.random.split(jax.random.key(0), 6)
    batch = dict(
        x=jax.random.normal(ks[0], (b, t, 12)),
        lengths=jnp.array([t, t - 8]),
        logmel=jax.random.normal(ks[1], (b, t, 8)),
        midi=jax.random.uniform(ks[2], (b, t, 1)),
        loud=jax.random.uniform(ks[3], (b, t, 1)),
    )
    teacher = model.init(
        {"params": jax.random.key(1)}, batch["x"], batch["lengths"],
        batch["logmel"], batch["midi"], batch["loud"],
        rng=jax.random.key(2), deterministic=True,
    )

    pair = model.apply(
        teacher, batch["x"], batch["lengths"], batch["logmel"],
        batch["midi"], batch["loud"], rng=jax.random.key(7),
        n_timesteps=3, method="make_reflow_batch",
    )
    assert pair["x0"].shape == (b, t, 8)
    assert pair["x1_hat"].shape == (b, t, 8)
    assert pair["mask"].shape == (b, t, 1)
    assert np.isfinite(np.asarray(pair["x1_hat"])).all()
    # teacher endpoint == direct cfm inference from the same source
    redo = model.apply(
        teacher, pair["mu"], pair["mask"], pair["spk"], n_timesteps=3,
        rng=None, x0=pair["x0"],
        method=lambda m, *a, **kw: m.cfm_decoder.inference(*a, **kw),
    )
    np.testing.assert_allclose(np.asarray(redo), np.asarray(pair["x1_hat"]),
                               atol=1e-6)

    cfg = {"optimizer_type": "AdamW", "optimizer_params": {"lr": 1e-3},
           "grad_norm": 1.0}
    mask_tree = distill_trainable_mask(teacher)
    tx, _ = build_optimizer(cfg, trainable_mask=mask_tree)
    student0 = jax.tree_util.tree_map(jnp.copy, teacher)
    state = create_train_state(student0, tx)
    # endpoint mode (the default): backprop through the 2-step rollout
    step = build_distill_step(model, teacher, tx, n_teacher_steps=3,
                              mode="endpoint", student_steps=2,
                              donate=False)
    for i in range(2):
        state, metrics = step(state, batch, jax.random.key(100 + i))
        assert np.isfinite(float(metrics["train/distill_loss"]))
    # reflow mode shares the contract
    step_r = build_distill_step(model, teacher, tx, n_teacher_steps=3,
                                mode="reflow", donate=False)
    state, metrics = step_r(state, batch, jax.random.key(200))
    assert np.isfinite(float(metrics["train/distill_loss"]))

    # encoder/GST identical to the teacher; cfm estimator moved
    flat_t = jax.tree_util.tree_leaves_with_path(teacher)
    flat_s = {jax.tree_util.keystr(p): l for p, l in
              jax.tree_util.tree_leaves_with_path(state.params)}
    moved = 0
    for path, leaf in flat_t:
        key = jax.tree_util.keystr(path)
        new = flat_s[key]
        if "encoder" in key or "gst" in key:
            np.testing.assert_array_equal(np.asarray(leaf), np.asarray(new),
                                          err_msg=key)
        elif not np.array_equal(np.asarray(leaf), np.asarray(new)):
            moved += 1
    assert moved > 0, "cfm estimator params did not update"


@pytest.mark.slow
def test_distill_quality_on_trained_field():
    """The headline measurement: distill a TRAINED teacher field with
    both modes and compare few-step samplers against the teacher's
    converged flow (euler-100 from the same noise), 12 conversions, MCD.

    Measured here (fixed seeds; asserted with slack below):

    ==========================  =====  =========
    sampler                     evals  MCD (dB)
    ==========================  =====  =========
    teacher euler-10              10   ~0.33   (the reference's sampler)
    teacher euler-2                2   ~2.25
    teacher euler-1                1   ~3.90
    endpoint-distilled (k=2)       2   ~0.49   near-teacher at 5x fewer
    endpoint-distilled (k=1)       1   ~1.13
    reflow-distilled, 2 steps      2   ~1.46   any-step straightening
    reflow-distilled, 1 step       1   ~2.30
    ==========================  =====  =========

    With longer budgets (3000 steps, 4x batch) the converged numbers are
    endpoint-2 ~0.42, endpoint-1 ~0.80, reflow-2 ~0.96 — the ranking and
    the conclusion (endpoint mode reaches the teacher-10 league at 2
    evals; reflow trades some per-k quality for any-step validity) are
    budget-stable.  Endpoint students are specialized: sampling the k=2
    student at 1 step (or k=1 at 2) degrades badly, hence the dumped
    ``inference_n_timesteps`` contract."""
    import functools

    import optax

    b, bm = 4, 2  # distillation uses 2x bigger pair batches
    model = CFM(in_channels=C_COND + C_OUT, out_channels=C_OUT,
                spk_embed_dim=16, decoder_channels=(16, 16),
                decoder_attention_head_dim=16)
    ks = jax.random.split(jax.random.key(0), 8)
    mask = jnp.ones((b, T, 1))
    maskb = jnp.ones((b * bm, T, 1))
    spk = jax.random.normal(ks[1], (b, 16))
    spkb = jnp.tile(spk, (bm, 1))
    w_true = jax.random.normal(ks[3], (C_COND, C_OUT)) / np.sqrt(C_COND)

    def make_batch(key):
        k1, k2 = jax.random.split(key)
        mu = jax.random.normal(k1, (b, T, C_COND))
        x1 = mu @ w_true + 0.1 * jax.random.normal(k2, (b, T, C_OUT))
        return mu, x1

    def big_batch(kb, kx0):
        mus, x0s = [], []
        for j in range(bm):
            mu, _ = make_batch(jax.random.fold_in(kb, j))
            x0 = 0.667 * jax.random.normal(jax.random.fold_in(kx0, j),
                                           (b, T, C_OUT), jnp.float32)
            mus.append(mu)
            x0s.append(x0)
        return jnp.concatenate(mus, 0), jnp.concatenate(x0s, 0)

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
    teacher = params

    @functools.partial(jax.jit, static_argnames=("n",))
    def samp(p, mu, x0, n):
        bb = mu.shape[0]
        return model.apply(p, mu, jnp.ones((bb, T, 1)),
                           spk if bb == b else spkb, n_timesteps=n,
                           rng=None, solver="euler", x0=x0,
                           method="inference")

    def distill(mode, k_steps, steps, peak, seed0):
        tx_d = optax.adam(optax.cosine_decay_schedule(peak, steps))
        student = jax.tree_util.tree_map(jnp.copy, teacher)
        opt_d = tx_d.init(student)

        @jax.jit
        def step(student, opt_d, key):
            kb, kx0, kl = jax.random.split(key, 3)
            mu, x0 = big_batch(kb, kx0)
            x1_hat = samp(teacher, mu, x0, 10)

            def loss_fn(p):
                if mode == "endpoint":
                    out = model.apply(p, mu, maskb, spkb,
                                      n_timesteps=k_steps, rng=None,
                                      solver="euler", x0=x0,
                                      method="inference")
                    return jnp.mean(jnp.square(out - x1_hat))
                loss, _ = model.apply(p, x1_hat, maskb, mu, spkb, rng=kl,
                                      x0=x0, deterministic=True,
                                      method="compute_loss")
                return loss

            loss, g = jax.value_and_grad(loss_fn)(student)
            up, opt_d = tx_d.update(g, opt_d)
            return optax.apply_updates(student, up), opt_d, loss

        for i in range(steps):
            student, opt_d, _ = step(student, opt_d,
                                     jax.random.key(seed0 + i))
        return student

    s_reflow = distill("reflow", 0, 600, 1e-3, 20000)
    s_ep2 = distill("endpoint", 2, 1200, 1e-3, 60000)
    s_ep1 = distill("endpoint", 1, 1200, 1e-3, 90000)

    cases = {"teacher10": (teacher, 10), "teacher2": (teacher, 2),
             "teacher1": (teacher, 1), "reflow2": (s_reflow, 2),
             "reflow1": (s_reflow, 1), "ep2": (s_ep2, 2),
             "ep1": (s_ep1, 1)}
    mcd = {k: [] for k in cases}
    for i in range(12):
        km, kx = jax.random.split(jax.random.key(5000 + i))
        mu, _ = make_batch(km)
        x0 = 0.667 * jax.random.normal(kx, (b, T, C_OUT), jnp.float32)
        ref = np.asarray(samp(teacher, mu, x0, 100))  # converged flow
        for name, (p, n) in cases.items():
            mcd[name].append(_mcd_db(np.asarray(samp(p, mu, x0, n)), ref))

    m = {k: float(np.mean(v)) for k, v in mcd.items()}
    print(f"distillation MCD(dB) vs converged teacher flow: {m}")

    # endpoint mode: the 2-step student plays in the teacher-10 league
    # at 5x fewer evals (measured +0.16 dB; asserted with slack)
    assert m["ep2"] <= m["teacher10"] + 0.35, m
    assert m["ep2"] <= 0.35 * m["teacher2"], m
    # endpoint k=1: 10x fewer evals, a bounded quality trade
    assert m["ep1"] <= m["teacher10"] + 1.2, m
    assert m["ep1"] <= 0.45 * m["teacher1"], m
    # reflow mode: straightens the field at every step count
    assert m["reflow2"] <= 0.8 * m["teacher2"], m
    assert m["reflow1"] <= 0.75 * m["teacher1"], m
