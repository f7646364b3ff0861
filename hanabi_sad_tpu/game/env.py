"""Vectorized Hanabi environment.

TPU-native replacement for the reference's HanabiEnv + HanabiVecEnv
(cpp/hanabi_env.cc, rela/env.h): a single game is a pure `reset`/`step`
function pair over an `EnvState` pytree; the batched variants are just vmap.
Per-step randomness is stateless (a per-env PRNG key carried in the state and
split at each reset).

Semantics matched to the reference:
  * actions are submitted for all players, only the current player's applies
    (cpp/hanabi_env.cc:58-60);
  * SAD mode records the outcome of the submitted greedy action on the
    pre-move state and encodes it as an extra last-action block in the next
    observation (cpp/hanabi_env.cc:82-91,154-160);
  * Other-Play samples a per-player color permutation at reset with one
    random player keeping identity (cpp/hanabi_env.cc:22-44); hint-color
    actions are displayed permuted and inverse-permuted on the way in;
  * per-player epsilon is sampled uniformly from the eps menu at reset
    (cpp/hanabi_env.cc:18-20);
  * with max_len > 0, the episode is force-terminated after max_len steps and
    the reward forfeits all points (cpp/hanabi_env.cc:97-101).

`shuffle_obs` (cpp/hanabi_env.cc:134-143, 2 players only): every encode
samples, per observer, a fresh uniform permutation of the partner's occupied
hand slots and displays the partner's hand, the partner's card-knowledge
block, and partner-slot-indexed last-action bits in that shuffled order —
destroying slot-identity conventions. The fork encoder's exact section
interaction lives in the unavailable submodule; this spec (all
partner-slot-indexed features permuted consistently, resampled per step) is
the behavior the SAD paper's "shuffled observations" baseline requires.
Note the reference trainer itself asserts the flag off (selfplay.py:174,
"not working with 2nd order aux"); this trainer supports it.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from hanabi_sad_tpu.game import encoder, moves, tpuops
from hanabi_sad_tpu.game.config import GameConfig
from hanabi_sad_tpu.game.engine import apply_move, move_outcome
from hanabi_sad_tpu.game.state import GameState, LastAction, empty_last_action, new_game, score


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    game: GameConfig = GameConfig()
    eps_list: Tuple[float, ...] = (0.0,)
    max_len: int = 80  # <= 0 means no forced termination
    sad: bool = False
    shuffle_color: bool = False
    shuffle_obs: bool = False
    # Zero the last-action section of the canonical obs (fork encoder's
    # hideAction; OBL lineage — see encoder.encode_observation). Orthogonal
    # to sad: the SAD greedy block, when enabled, is appended regardless,
    # mirroring the fork where hideAction only gates the main Encode section.
    hide_action: bool = False

    def __post_init__(self):
        if self.shuffle_obs and self.game.players != 2:
            # The reference's shuffle is "hacked for 2 players"
            # (cpp/hanabi_env.cc:136).
            raise ValueError("shuffle_obs requires 2 players")

    @property
    def feature_size(self) -> int:
        return self.game.feature_size(self.sad)


class EnvState(NamedTuple):
    game: GameState
    num_step: jnp.ndarray  # i32
    done: jnp.ndarray  # bool: game terminal OR forced termination
    player_eps: jnp.ndarray  # [P] f32
    color_perm: jnp.ndarray  # [P, C] i32; perm[c] = displayed color of true c
    sad_record: LastAction  # greedy-action outcome for the SAD channel
    key: jax.Array  # per-env PRNG key for the *next* reset
    last_score: jnp.ndarray  # i32, score frozen at termination


Obs = Dict[str, jnp.ndarray]


def _sample_perms(cfg: GameConfig, key: jax.Array, shuffle_color: bool) -> jnp.ndarray:
    P, C = cfg.players, cfg.num_colors
    identity = jnp.tile(jnp.arange(C, dtype=jnp.int32)[None], (P, 1))
    if not shuffle_color:
        return identity
    k_fix, k_perm = jax.random.split(key)
    fix_player = jax.random.randint(k_fix, (), 0, P)
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, jnp.arange(C, dtype=jnp.int32))
    )(jax.random.split(k_perm, P))
    keep = jnp.arange(P) == fix_player
    return jnp.where(keep[:, None], identity, perms)


def observe(cfg: EnvConfig, state: EnvState) -> Obs:
    """Per-player observation dict, shapes [P, ...] — the TensorDict returned
    by computeFeatureAndLegalMove (cpp/hanabi_env.cc:197-204)."""
    g = cfg.game
    players = jnp.arange(g.players, dtype=jnp.int32)

    if cfg.shuffle_obs:
        # Fresh partner-hand shuffle per step per observer. state.key is
        # constant within an episode, so fold in the step counter (and the
        # observer seat) for per-encode randomness; only occupied slots
        # permute (hands are compact, empties stay a suffix). The stream is
        # first decorrelated with a large tag: fold_in(key, i) equals
        # split(key, n)[i] under threefry, and step_autoreset consumes
        # split(state.key) for the next episode's reset — without the tag the
        # step-0/1 shuffle keys would collide with the next deck's keys.
        step_key = jax.random.fold_in(state.key, 0x5AD0_0B5)
        step_key = jax.random.fold_in(step_key, state.num_step)

        def _shuffle_for(p):
            k = jax.random.fold_in(step_key, p)
            partner_hand = state.game.hands[(p + 1) % g.players]
            scores = jnp.where(
                partner_hand >= 0,
                jax.random.uniform(k, (g.hand_size,)),
                jnp.inf,
            )
            return jnp.argsort(scores).astype(jnp.int32)

        shuffles = jax.vmap(_shuffle_for)(players)  # [P, H]
    else:
        shuffles = None

    def _obs_for(p):
        shuf = None if shuffles is None else shuffles[p]
        perm = tpuops.take_row(state.color_perm, p)
        return encoder.encode_observation(
            g, state.game, p, perm, shuf, hide_action=cfg.hide_action
        )

    priv = jax.vmap(_obs_for)(players)  # [P, obs_dim]
    if cfg.sad:

        def _sad_for(p):
            shuf = None if shuffles is None else shuffles[p]
            perm = tpuops.take_row(state.color_perm, p)
            return encoder.encode_last_action(g, state.sad_record, p, perm, shuf)

        sad_block = jax.vmap(_sad_for)(players)
        priv = jnp.concatenate([priv, sad_block], axis=-1)

    legal = moves.legal_moves_all(g, state.game)  # [P, A] bool
    if cfg.shuffle_color:
        legal = jax.vmap(lambda l, perm: moves.permute_hint_colors(g, l, perm))(
            legal, state.color_perm
        )

    own_hand = jax.vmap(lambda p: encoder.encode_own_hand_trinary(g, state.game, p))(players)

    return {
        "priv_s": priv.astype(jnp.float32),
        "legal_move": legal.astype(jnp.float32),
        "eps": state.player_eps,
        "own_hand": own_hand,
    }


def reset(cfg: EnvConfig, key: jax.Array) -> Tuple[EnvState, Obs]:
    state = reset_state(cfg, key)
    return state, observe(cfg, state)


def reset_state(cfg: EnvConfig, key: jax.Array) -> EnvState:
    """reset() without the observation encode (see step_autoreset)."""
    g = cfg.game
    k_deck, k_eps, k_perm, k_next = jax.random.split(key, 4)
    game = new_game(g, k_deck)
    eps_menu = jnp.asarray(cfg.eps_list, dtype=jnp.float32)
    eps_idx = jax.random.randint(k_eps, (g.players,), 0, len(cfg.eps_list))
    player_eps = tpuops.take_vec(eps_menu, eps_idx)
    state = EnvState(
        game=game,
        num_step=jnp.asarray(0, dtype=jnp.int32),
        done=jnp.asarray(False),
        player_eps=player_eps,
        color_perm=_sample_perms(g, k_perm, cfg.shuffle_color),
        sad_record=empty_last_action(g),
        key=k_next,
        last_score=jnp.asarray(-1, dtype=jnp.int32),
    )
    return state


def step(cfg: EnvConfig, state: EnvState, action: Dict[str, jnp.ndarray]):
    """One env step. action = {"a": [P] i32, "greedy_a": [P] i32} (greedy_a
    only consumed in SAD mode). Returns (state, obs, reward, done). Stepping a
    done env is a frozen no-op with zero reward — the rollout layer owns
    resets."""
    new_state, reward, done = step_state(cfg, state, action)
    return new_state, observe(cfg, new_state), reward, done


def step_state(cfg: EnvConfig, state: EnvState, action: Dict[str, jnp.ndarray]):
    """step() without the observation encode (see step_autoreset)."""
    g = cfg.game
    cur = state.game.cur_player
    prev_score = score(state.game)

    uid = tpuops.take_vec(action["a"], cur)
    move = moves.decode_uid(g, uid)
    # Inverse color permutation on hint intake: inv[c] is the true color the
    # agent's displayed color c refers to — inv[c] = argwhere(perm == c),
    # computed as a one-hot contraction (no argsort + gather).
    perm_cur = tpuops.take_row(state.color_perm, cur)
    colors = jnp.arange(g.num_colors, dtype=jnp.int32)

    def _inv_color(c):
        return jnp.sum(jnp.where(perm_cur == c, colors, 0)).astype(jnp.int32)

    move = move._replace(
        color=jnp.where(move.move_type == 2, _inv_color(move.color), move.color)
    )

    if cfg.sad:
        greedy_uid = tpuops.take_vec(action["greedy_a"], cur)
        gmove = moves.decode_uid(g, greedy_uid)
        gmove = gmove._replace(
            color=jnp.where(gmove.move_type == 2, _inv_color(gmove.color), gmove.color)
        )
        sad_record = move_outcome(g, state.game, gmove)
        # Freeze the record while done (padding steps).
        sad_record = jax.tree_util.tree_map(
            lambda new, old: jnp.where(state.done, old, new), sad_record, state.sad_record
        )
    else:
        sad_record = state.sad_record

    new_game_state = apply_move(g, state.game, move)

    num_step = state.num_step + jnp.where(state.done, 0, 1)
    new_score = score(new_game_state)
    reward = jnp.where(state.done, 0.0, (new_score - prev_score).astype(jnp.float32))

    # Forced termination forfeits all points — even if the game also ended
    # naturally on this exact step (cpp/hanabi_env.cc:97-101 overwrites
    # unconditionally at numStep == maxLen).
    forced = jnp.asarray(cfg.max_len > 0) & (num_step >= cfg.max_len)
    reward = jnp.where(forced & ~state.done, (0 - prev_score).astype(jnp.float32), reward)
    done = state.done | new_game_state.terminal | forced

    last_score = jnp.where(
        state.done, state.last_score, jnp.where(done, new_score, state.last_score)
    )

    new_state = EnvState(
        game=new_game_state,
        num_step=num_step,
        done=done,
        player_eps=state.player_eps,
        color_perm=state.color_perm,
        sad_record=sad_record,
        key=state.key,
        last_score=last_score,
    )
    return new_state, reward, done


def step_autoreset(cfg: EnvConfig, state: EnvState, action: Dict[str, jnp.ndarray]):
    """step() with immediate auto-reset: if the step ends the episode, the
    returned state/obs are a freshly reset env (new deck, eps, perms) — the
    VectorEnv::reset splice semantics (rela/env.h:48-60) without idle frames.

    Returns (state, obs, reward, done, score) where `done` flags that THIS
    step ended an episode (the returned state is already the next episode)
    and `score` is the finished episode's final score (valid when done).

    The observation is encoded ONCE, from the post-selection state — encoding
    both the stepped and the fresh state and selecting afterwards would
    double the encoder work of the rollout hot loop for identical output
    (obs is a pure function of state)."""
    stepped, reward, done = step_state(cfg, state, action)
    k_reset, k_next = jax.random.split(state.key)
    fresh = reset_state(cfg, k_reset)._replace(key=k_next)

    # where(done, fresh, stepped) with correct broadcasting over leaves
    new_state = jax.tree_util.tree_map(
        lambda f, s: jnp.where(_bcast(done, f), f, s), fresh, stepped
    )
    return new_state, observe(cfg, new_state), reward, done, stepped.last_score


def _bcast(flag: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    return jnp.reshape(flag, flag.shape + (1,) * (like.ndim - flag.ndim))


class HanabiEnv:
    """Thin batched facade: vmapped reset/step over N independent games."""

    def __init__(self, cfg: EnvConfig):
        self.cfg = cfg

    @property
    def feature_size(self) -> int:
        return self.cfg.feature_size

    @property
    def num_actions(self) -> int:
        return self.cfg.game.num_actions

    def reset(self, keys: jax.Array):
        """keys: [N, 2] PRNG keys -> (EnvState batch, obs batch)."""
        return jax.vmap(lambda k: reset(self.cfg, k))(keys)

    def step(self, state: EnvState, action: Dict[str, jnp.ndarray]):
        return jax.vmap(lambda s, a: step(self.cfg, s, a))(state, action)
