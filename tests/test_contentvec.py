"""ContentVec encoder parity: convert a randomly-initialized torch HF
HubertModel (with the reference's stride hack) and compare outputs."""

import numpy as np
import jax.numpy as jnp
import pytest

from serenade_tpu.modules.contentvec import ContentVecEncoder, convert_hf_hubert


@pytest.mark.slow
def test_matches_hf_hubert_with_stride_hack():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    config = transformers.HubertConfig(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072, apply_spec_augment=False,
    )
    torch.manual_seed(0)
    ref = transformers.HubertModel(config).eval()
    # the reference's 20ms -> 10ms stride hack (preprocess.py:361-368)
    ref.feature_extractor.conv_layers[-1].conv.stride = (1,)

    wav = np.random.default_rng(0).normal(size=(1, 16000)).astype(np.float32) * 0.1
    with torch.no_grad():
        expected = ref(torch.from_numpy(wav)).last_hidden_state.numpy()

    model = ContentVecEncoder()
    params = convert_hf_hubert(ref.state_dict())
    got = np.asarray(model.apply(params, jnp.asarray(wav)))

    assert got.shape == expected.shape
    # 12 transformer layers of f32 accumulation divergence (oneDNN vs XLA):
    # require agreement to ~1e-2 absolute on O(1) activations
    np.testing.assert_allclose(got, expected, atol=1.5e-2, rtol=1e-2)
    corr = np.corrcoef(got.ravel(), expected.ravel())[0, 1]
    assert corr > 0.99999
