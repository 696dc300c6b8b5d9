from serenade_tpu.sifigan.generator import SiFiGANGenerator  # noqa: F401
from serenade_tpu.sifigan.features import SignalGenerator, dilated_factor  # noqa: F401
