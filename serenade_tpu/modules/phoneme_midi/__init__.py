from serenade_tpu.modules.phoneme_midi.model import (  # noqa: F401
    PhonemeRecognitionModel,
    TranscriptionModel,
    load_transcriber,
)
from serenade_tpu.modules.phoneme_midi.decoding import FramewiseDecoder  # noqa: F401
