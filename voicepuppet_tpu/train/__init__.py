from voicepuppet_tpu.train.state import TrainState, GANTrainState
from voicepuppet_tpu.train.optim import (reference_adam,
                                         exponential_decay_schedule)
from voicepuppet_tpu.train.checkpoint import CheckpointManager

__all__ = ["TrainState", "GANTrainState", "reference_adam",
           "exponential_decay_schedule", "CheckpointManager"]
