from voicepuppet_tpu.audio.frontend import (MelFrontend, hann_window,
                                            linear_to_mel_weight_matrix)
from voicepuppet_tpu.audio.io import load_audio, load_wav

__all__ = ["MelFrontend", "hann_window", "linear_to_mel_weight_matrix",
           "load_audio", "load_wav"]
