from hanabi_sad_tpu.game.config import GameConfig
from hanabi_sad_tpu.game.state import GameState, LastAction, new_game
from hanabi_sad_tpu.game import moves, engine, encoder
from hanabi_sad_tpu.game.env import HanabiEnv, EnvConfig

__all__ = [
    "GameConfig",
    "GameState",
    "LastAction",
    "new_game",
    "moves",
    "engine",
    "encoder",
    "HanabiEnv",
    "EnvConfig",
]
