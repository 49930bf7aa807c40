from voicepuppet_tpu.models.bfmnet import BFMNet, BFMNetLoss
from voicepuppet_tpu.models.layers import (MfccNet, ThinNet, TFGRUCell,
                                           masked_gru)

__all__ = ["BFMNet", "BFMNetLoss", "MfccNet", "ThinNet", "TFGRUCell",
           "masked_gru"]
