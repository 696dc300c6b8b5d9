from serenade_tpu.datasets.feats_dataset import FeatsDataset, FeatsDatasetNew  # noqa: F401
from serenade_tpu.datasets.audio_dataset import AudioSCPDataset  # noqa: F401
