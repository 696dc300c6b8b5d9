from serenade_tpu.vocoder.hifigan import HiFiGANGenerator  # noqa: F401
from serenade_tpu.vocoder.vocoder import Vocoder, load_vocoder  # noqa: F401
