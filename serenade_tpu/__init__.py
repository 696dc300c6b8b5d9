"""serenade_tpu: TPU-native singing style conversion (SSC) framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the Serenade
reference framework (flow-matching audio-infilling SSC; see
/root/reference/serenade, arXiv:2503.12388). The compute path is pure
functional JAX sharded over `jax.sharding.Mesh`; hot kernels use Pallas.

Layout convention: features are `(batch, time, channels)` (channels-last so
the channel axis maps onto TPU lanes); masks are `(batch, time, 1)` float.
"""

__version__ = "0.1.0"
