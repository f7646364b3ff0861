"""ctypes bindings for the native C++ Hanabi engine (hanabi_engine.cpp).

The library auto-builds on first use via the Makefile (g++ is baked into the
image). Used as the differential-testing oracle for the JAX engine and as a
fast scalar host-side engine for debugging.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libhanabi_native.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _DIR, "libhanabi_native.so"],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.hanabi_new.restype = ctypes.c_void_p
    lib.hanabi_new.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int),
    ]
    lib.hanabi_free.argtypes = [ctypes.c_void_p]
    lib.hanabi_step.restype = ctypes.c_float
    lib.hanabi_step.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.hanabi_greedy_channel.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.hanabi_legal_moves.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.hanabi_encode.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.hanabi_own_hand.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    for name in [
        "hanabi_num_actions", "hanabi_score", "hanabi_life", "hanabi_info",
        "hanabi_terminal", "hanabi_cur_player", "hanabi_deck_left", "hanabi_turns_left",
    ]:
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int
        fn.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


class NativeGame:
    """One Hanabi game on the C++ engine, dealt from an explicit deck order."""

    def __init__(self, deck: np.ndarray, players: int = 2, hand_size: int = 5, bomb: int = 0):
        lib = _load()
        assert lib is not None, "native engine unavailable (g++/make missing?)"
        self._lib = lib
        deck = np.ascontiguousarray(np.asarray(deck, dtype=np.int32))
        assert deck.shape == (50,)
        self.players = players
        self.hand_size = hand_size
        self._h = lib.hanabi_new(
            players, hand_size, bomb, deck.ctypes.data_as(ctypes.POINTER(ctypes.c_int))
        )
        self.num_actions = lib.hanabi_num_actions(self._h)
        la = 2 * players + 4 + 5 + 5 + 2 * hand_size + 25 + 2
        self.obs_dim = (
            players * (hand_size * 25 + 1)
            + (50 - players * hand_size + 25 + 8 + 3)
            + 50
            + la
            + players * hand_size * 35
        )
        self.last_action_dim = la

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.hanabi_free(self._h)
            self._h = None

    def step(self, uid: int) -> float:
        return self._lib.hanabi_step(self._h, int(uid))

    def legal_moves(self, player: int) -> np.ndarray:
        out = np.zeros(self.num_actions, np.uint8)
        self._lib.hanabi_legal_moves(
            self._h, player, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        )
        return out

    def encode(self, observer: int) -> np.ndarray:
        out = np.zeros(self.obs_dim, np.float32)
        self._lib.hanabi_encode(
            self._h, observer, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return out

    def greedy_channel(self, uid: int, observer: int) -> np.ndarray:
        out = np.zeros(self.last_action_dim, np.float32)
        self._lib.hanabi_greedy_channel(
            self._h, int(uid), observer, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return out

    def own_hand(self, player: int) -> np.ndarray:
        out = np.zeros(3 * self.hand_size, np.float32)
        self._lib.hanabi_own_hand(
            self._h, player, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        return out

    @property
    def score(self) -> int:
        return self._lib.hanabi_score(self._h)

    @property
    def life(self) -> int:
        return self._lib.hanabi_life(self._h)

    @property
    def info(self) -> int:
        return self._lib.hanabi_info(self._h)

    @property
    def terminal(self) -> bool:
        return bool(self._lib.hanabi_terminal(self._h))

    @property
    def cur_player(self) -> int:
        return self._lib.hanabi_cur_player(self._h)

    @property
    def deck_left(self) -> int:
        return self._lib.hanabi_deck_left(self._h)

    @property
    def turns_left(self) -> int:
        return self._lib.hanabi_turns_left(self._h)
