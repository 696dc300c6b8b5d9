from serenade_tpu.sifigan.generator import (  # noqa: F401
    SiFiGANDirectGenerator, SiFiGANGenerator,
)
from serenade_tpu.sifigan.features import SignalGenerator, dilated_factor  # noqa: F401
