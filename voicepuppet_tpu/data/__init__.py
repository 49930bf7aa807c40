from voicepuppet_tpu.data.loaders import (load_text_array, load_image,
                                          load_landmarks)
from voicepuppet_tpu.data.generators import (ArraySource, FileSource,
                                             BFMNetBatcher,
                                             PixReferBatcher,
                                             ear_compute, split_silence)

__all__ = ["load_text_array", "load_image", "load_landmarks",
           "ArraySource", "FileSource", "BFMNetBatcher", "PixReferBatcher",
           "ear_compute", "split_silence"]
