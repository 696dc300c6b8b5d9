"""Model-level tests: shapes, finiteness, masking semantics, jit-ability.

Everything (including ``model.init``) runs under ``jax.jit``: eager per-op
dispatch costs ~1 s of XLA CPU compile per unique conv shape in this
environment, while one jitted program compiles once and lands in the
persistent cache (tests/conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from serenade_tpu.models import Serenade, SerenadeNew

SMALL = dict(
    input_dim=16,
    output_dim=8,
    encoder_channels=8,
    decoder_channels=32,
    gst_embed_dim=16,
    decoder_attention_head_dim=16,
    dtype=jnp.float32,
)
B, T = 2, 64


def make_batch(key, b=B, t=T, input_dim=16, output_dim=8):
    ks = jax.random.split(key, 5)
    return dict(
        x=jax.random.normal(ks[0], (b, t, input_dim)),
        lengths=jnp.array([t, t // 2][:b]),
        logmel=jax.random.normal(ks[1], (b, t, output_dim)),
        midi=jax.random.normal(ks[2], (b, t, 1)),
        loud=jax.random.normal(ks[3], (b, t, 1)),
    )


@pytest.fixture(scope="module")
def model_params_loss():
    model = Serenade(**SMALL)
    batch = make_batch(jax.random.key(0))

    @jax.jit
    def init(batch):
        return model.init(
            {"params": jax.random.key(1)},
            batch["x"], batch["lengths"], batch["logmel"], batch["midi"],
            batch["loud"], rng=jax.random.key(2), deterministic=True,
        )

    params = init(batch)

    @jax.jit
    def loss_fn(params, batch, key):
        return model.apply(
            params, batch["x"], batch["lengths"], batch["logmel"],
            batch["midi"], batch["loud"], rng=key, deterministic=True,
        )

    return model, params, loss_fn


def test_training_losses_finite(model_params_loss):
    _, params, loss_fn = model_params_loss
    out = loss_fn(params, make_batch(jax.random.key(3)), jax.random.key(4))
    assert np.isfinite(float(out["loss"]))
    assert np.isfinite(float(out["cfm_loss"]))
    assert np.isfinite(float(out["prior_loss"]))
    assert float(out["cfm_loss"]) > 0


def test_training_is_deterministic_given_key(model_params_loss):
    _, params, loss_fn = model_params_loss
    batch = make_batch(jax.random.key(3))
    l1 = float(loss_fn(params, batch, jax.random.key(7))["loss"])
    l2 = float(loss_fn(params, batch, jax.random.key(7))["loss"])
    l3 = float(loss_fn(params, batch, jax.random.key(8))["loss"])
    assert l1 == l2
    assert l1 != l3


def test_gradients_flow(model_params_loss):
    model, params, _ = model_params_loss
    batch = make_batch(jax.random.key(3))

    @jax.jit
    def grad_fn(params, batch):
        def loss(params):
            out = model.apply(
                params, batch["x"], batch["lengths"], batch["logmel"],
                batch["midi"], batch["loud"], rng=jax.random.key(0),
                deterministic=True,
            )
            return out["loss"]

        return jax.grad(loss)(params)

    grads = grad_fn(params, batch)
    flat = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.linalg.norm(g)) for g in flat]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.7


def test_inference_shapes_and_padding(model_params_loss):
    model, params, _ = model_params_loss
    b, ts, tr = B, T, 32
    ks = jax.random.split(jax.random.key(5), 9)
    args = (
        jax.random.normal(ks[0], (b, ts, SMALL["input_dim"])),
        jnp.array([ts, ts - 10]),
        jax.random.normal(ks[1], (b, ts, 1)),
        jax.random.normal(ks[2], (b, ts, 1)),
        jax.random.normal(ks[3], (b, tr, SMALL["input_dim"])),
        jnp.array([tr, tr - 6]),
        jax.random.normal(ks[4], (b, tr, SMALL["output_dim"])),
        jax.random.normal(ks[5], (b, tr, 1)),
        jax.random.normal(ks[6], (b, tr, 1)),
    )

    @jax.jit
    def infer(params, *args):
        return model.apply(params, *args, rng=ks[7], n_timesteps=2,
                           method="inference")

    mel = infer(params, *args)
    assert mel.shape == (b, ts, SMALL["output_dim"])
    assert np.all(np.isfinite(np.asarray(mel)))


def test_serenade_new_extra_channels():
    model = SerenadeNew(**SMALL)
    batch = make_batch(jax.random.key(0))
    fluc = jax.random.normal(jax.random.key(9), (B, T, 1))

    @jax.jit
    def init_and_loss(batch, fluc):
        params = model.init(
            {"params": jax.random.key(1)},
            batch["x"], batch["lengths"], batch["logmel"], batch["midi"],
            batch["loud"], fluc, rng=jax.random.key(2), deterministic=True,
        )
        out = model.apply(
            params, batch["x"], batch["lengths"], batch["logmel"],
            batch["midi"], batch["loud"], fluc, rng=jax.random.key(3),
            deterministic=True,
        )
        return out["loss"]

    assert np.isfinite(float(init_and_loss(batch, fluc)))
