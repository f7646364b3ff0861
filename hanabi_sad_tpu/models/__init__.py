from hanabi_sad_tpu.models.r2d2_net import NetConfig, R2D2NetParams, init_r2d2_net
from hanabi_sad_tpu.models import lstm, r2d2_net

__all__ = ["NetConfig", "R2D2NetParams", "init_r2d2_net", "lstm", "r2d2_net"]
