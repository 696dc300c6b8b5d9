"""Attention backend equivalence tests (CPU: xla vs scan-flash vs
interpret-mode pallas-flash)."""

import chex
import numpy as np
import jax
import jax.numpy as jnp

from serenade_tpu.ops.attention import multi_head_attention
from serenade_tpu.ops.flash import flash_attention
from serenade_tpu.ops.flash_pallas import flash_attention_pallas, _xla_reference


def _data(b=2, h=2, t=200, d=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), jnp.float32)
    mask = jnp.asarray(
        (np.arange(t)[None, :] < np.array([[t], [t - 37]])).astype(np.float32)
    )
    return q, k, v, mask


def test_scan_flash_matches_xla():
    q, k, v, mask = _data()
    scale = q.shape[-1] ** -0.5
    ref = _xla_reference(q, k, v, mask, scale)
    out = flash_attention(q, k, v, key_mask=mask, scale=scale, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_flash_interpret_matches_xla():
    q, k, v, mask = _data(t=256, d=128)
    scale = q.shape[-1] ** -0.5
    ref = _xla_reference(q, k, v, mask, scale)
    out = flash_attention_pallas(q, k, v, mask, scale, 128, 128, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_flash_grad_matches_xla():
    q, k, v, mask = _data(t=128, d=128)
    scale = q.shape[-1] ** -0.5

    g1 = jax.grad(
        lambda q: flash_attention_pallas(q, k, v, mask, scale, 128, 128,
                                         True).sum()
    )(q)
    g2 = jax.grad(lambda q: _xla_reference(q, k, v, mask, scale).sum())(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-5)


def test_packed_interface_masks_padded_keys():
    b, t, hd, h = 2, 64, 32, 2
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(b, t, hd)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, hd)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, hd)), jnp.float32)
    mask = jnp.ones((b, t)).at[1, 40:].set(0.0)
    out = multi_head_attention(q, k, v, num_heads=h, key_mask=mask)
    # changing the masked-out keys must not change the output
    k2 = k.at[1, 40:].set(100.0)
    v2 = v.at[1, 40:].set(-100.0)
    out2 = multi_head_attention(q, k2, v2, num_heads=h, key_mask=mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out2), atol=1e-6)


def test_fused_qkv_matches_unfused(monkeypatch):
    """SERENADE_FUSE_QKV=1 runs the self-attention projections as ONE
    (C, 3*inner) matmul over the SAME to_q/to_k/to_v params — outputs
    must match the unfused QDense path and the param trees must be
    identical (checkpoint compatibility)."""
    from serenade_tpu.models.transformer import BasicTransformerBlock

    block = BasicTransformerBlock(dim=32, num_attention_heads=2,
                                  attention_head_dim=16)
    x = jax.random.normal(jax.random.key(0), (2, 24, 32))
    mask = jnp.ones((2, 24), bool)

    monkeypatch.delenv("SERENADE_FUSE_QKV", raising=False)
    params = block.init(jax.random.key(1), x, key_mask=mask)
    y_ref = block.apply(params, x, key_mask=mask)

    monkeypatch.setenv("SERENADE_FUSE_QKV", "1")
    params_f = block.init(jax.random.key(1), x, key_mask=mask)
    chex.assert_trees_all_equal_structs(params, params_f)
    # same rng path -> same init values
    jax.tree_util.tree_map(np.testing.assert_array_equal, params, params_f)
    y_fused = block.apply(params, x, key_mask=mask)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
