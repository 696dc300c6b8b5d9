"""Content encoder: MelGAN-style Conv1d + dilated residual stack.

Re-design of reference serenade.py:224-377 (Conv1dResnet/ResnetBlock/WNConv1d)
in channels-last layout with weight-normalized convs and reflection padding.
Maps 768-d ContentVec features to the encoder channel count (80).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from serenade_tpu.models.layers import WNConv1d, reflect_pad_time


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class ResnetBlock(nn.Module):
    """LeakyReLU → reflect-pad → dilated k3 WNConv → LeakyReLU → k1 WNConv,
    plus a k1 WNConv shortcut (reference serenade.py:363-376)."""

    dim: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = leaky_relu(x)
        h = reflect_pad_time(h, self.dilation)
        h = WNConv1d(self.dim, kernel_size=3, dilation=self.dilation,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="conv1")(h)
        h = leaky_relu(h)
        h = WNConv1d(self.dim, kernel_size=1, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="conv2")(h)
        s = WNConv1d(self.dim, kernel_size=1, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="shortcut")(x)
        return s + h


class Conv1dResnet(nn.Module):
    """in (B, T, in_dim) -> out (B, T, out_dim)."""

    out_dim: int
    hidden_dim: int = 512
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, lengths=None):
        x = x.astype(self.dtype)
        x = reflect_pad_time(x, 3)
        x = WNConv1d(self.hidden_dim, kernel_size=7, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="conv_in")(x)
        for n in range(self.num_layers):
            x = ResnetBlock(self.hidden_dim, dilation=2 ** n, dtype=self.dtype,
                            param_dtype=self.param_dtype, name=f"resblock{n}")(x)
        x = leaky_relu(x)
        x = reflect_pad_time(x, 3)
        x = WNConv1d(self.out_dim, kernel_size=7, dtype=self.dtype,
                     param_dtype=self.param_dtype, name="conv_out")(x)
        return x
