from hanabi_sad_tpu.train.config import TrainConfig, PRESETS
from hanabi_sad_tpu.train import learner, checkpoint

__all__ = ["TrainConfig", "PRESETS", "learner", "checkpoint"]
