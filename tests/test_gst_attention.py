"""GST attention variant tests (shape + rel-pos index correctness)."""

import jax
import jax.numpy as jnp
import numpy as np

from serenade_tpu.modules.gst_attention import (
    LegacyRelPositionMultiHeadedAttention,
    MultiHeadedAttention,
    RelPositionMultiHeadedAttention,
)


def test_mha_dimension_adapting():
    m = MultiHeadedAttention(n_head=4, n_feat=32)
    q = jnp.zeros((2, 1, 12))    # ref embedding
    kv = jnp.zeros((2, 10, 8))   # tokens
    params = m.init(jax.random.key(0), q, kv, kv)
    out = m.apply(params, q, kv, kv)
    assert out.shape == (2, 1, 32)


def test_relpos_attention_runs_and_uses_positions():
    t = 16
    m = RelPositionMultiHeadedAttention(n_head=2, n_feat=16)
    x = jax.random.normal(jax.random.key(0), (1, t, 16))
    pos = jax.random.normal(jax.random.key(1), (1, 2 * t - 1, 16))
    params = m.init(jax.random.key(2), x, pos)
    out1 = m.apply(params, x, pos)
    out2 = m.apply(params, x, jnp.roll(pos, 3, axis=1))
    assert out1.shape == (1, t, 16)
    # positional encoding must influence the output through linear_pos
    # (bias params are zero-init, so force them nonzero)
    params = jax.tree_util.tree_map(
        lambda p: p + 0.1 if p.ndim == 2 and p.shape == (2, 8) else p, params
    )
    out1 = m.apply(params, x, pos)
    out2 = m.apply(params, x, jnp.roll(pos, 3, axis=1))
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_legacy_relpos_shape():
    t = 12
    m = LegacyRelPositionMultiHeadedAttention(n_head=2, n_feat=16)
    x = jax.random.normal(jax.random.key(0), (1, t, 16))
    pos = jax.random.normal(jax.random.key(1), (1, t, 16))
    params = m.init(jax.random.key(2), x, pos)
    assert m.apply(params, x, pos).shape == (1, t, 16)
