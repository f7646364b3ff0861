from hanabi_sad_tpu.native.bindings import NativeGame, available

__all__ = ["NativeGame", "available"]
