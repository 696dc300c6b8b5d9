"""Legacy NUSVC model: loss finiteness + inference shape."""

import jax
import jax.numpy as jnp
import numpy as np

from serenade_tpu.models import NUSVC


def test_nusvc_train_and_infer():
    model = NUSVC(input_dim=12, output_dim=8, encoder_channels=12,
                  decoder_channels=16, gst_embed_dim=16,
                  decoder_attention_head_dim=16, dtype=jnp.float32)
    b, t = 2, 64
    ks = jax.random.split(jax.random.key(0), 4)
    x = jax.random.normal(ks[0], (b, t, 12))
    mel = jax.random.normal(ks[1], (b, t, 8))
    lengths = jnp.array([t, t - 9])

    @jax.jit
    def run(x, mel, lengths):
        params = model.init({"params": ks[2]}, x, lengths, mel, rng=ks[3],
                            deterministic=True)
        out = model.apply(params, x, lengths, mel, rng=ks[3],
                          deterministic=True)
        mel_pred = model.apply(params, x, lengths, mel, lengths, rng=ks[3],
                               n_timesteps=2, method="inference")
        return out["loss"], mel_pred

    loss, mel_pred = run(x, mel, lengths)
    assert np.isfinite(float(loss))
    assert mel_pred.shape == (b, t, 8)
