from serenade_tpu.models.serenade import Serenade  # noqa: F401
from serenade_tpu.models.serenade_new import SerenadeNew  # noqa: F401
from serenade_tpu.models.cfm import CFM  # noqa: F401
from serenade_tpu.models.unet import Decoder  # noqa: F401
from serenade_tpu.models.gst import StyleEncoder  # noqa: F401
from serenade_tpu.models.conv1d_resnet import Conv1dResnet  # noqa: F401
from serenade_tpu.models.nusvc import NUSVC  # noqa: F401
