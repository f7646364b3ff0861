"""Training configuration — the reference's full flag surface
(selfplay.py:26-86) plus the TPU-native execution knobs, with the shell
presets (tools/dev.sh, iql_2player.sh, vdn_2player.sh, sad_2player.sh,
op_2player.sh) expressed as config dicts.

Execution-model note: the reference is asynchronous (80 actor threads feed a
replay while the learner trains); here one SPMD program alternates a rollout
chunk (num_envs games to completion, <= max_len steps) with
`num_update_per_chunk` gradient updates. The replay ratio — train frames per
generated frame — is the quantity to match when comparing learning curves:
ratio = num_update_per_chunk * batchsize / (num_envs * players_per_item).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    save_dir: str = "exps/exp1"
    method: str = "vdn"  # "vdn" | "iql"
    shuffle_obs: bool = False
    shuffle_color: bool = False  # Other-Play
    pred_weight: float = 0.0  # aux own-hand loss weight (SAD-AUX)
    num_eps: int = 80

    load_model: str = ""

    seed: int = 10001
    gamma: float = 0.99
    eta: float = 0.9
    train_bomb: int = 0
    eval_bomb: int = 0
    sad: bool = False
    num_player: int = 2
    hand_size: int = 5

    lr: float = 6.25e-5
    # lr_final > 0 switches Adam to a linear decay lr -> lr_final over
    # lr_decay_updates gradient steps (0 = num_epoch * epoch_len), then holds
    # at lr_final. The reference trains at a fixed lr (selfplay.py:149); both
    # long flagship lineages here needed manual lr drops across resume
    # sessions (BENCHMARKS.md), which this automates inside one run.
    lr_final: float = 0.0
    lr_decay_updates: int = 0
    adam_eps: float = 1.5e-4
    grad_clip: float = 50.0
    num_lstm_layer: int = 2
    rnn_hid_dim: int = 512
    num_fc_layer: int = 1
    skip_connect: bool = False
    compute_dtype: str = "float32"  # "bfloat16" feeds the MXU at 2x

    batchsize: int = 128
    num_epoch: int = 5000
    epoch_len: int = 1000
    num_update_between_sync: int = 2500

    multi_step: int = 3

    burn_in_frames: int = 80000
    replay_buffer_size: int = 2 ** 20
    priority_exponent: float = 0.6  # alpha
    priority_weight: float = 0.4  # beta
    max_len: int = 80

    act_base_eps: float = 0.4
    act_eps_alpha: float = 7.0

    # --- TPU-native execution knobs (replace thread/device flags) ---
    num_envs: int = 1024  # parallel games per rollout chunk
    num_update_per_chunk: int = 16  # gradient steps between chunks
    # "continuous" (default, the production path — both flagship lineages,
    # every preset, and the round-3 A/B evidence use it): envs auto-reset
    # mid-chunk (reference VecEnv semantics), every step is a live frame and
    # episodes are re-assembled from the stream. "aligned": reset all envs
    # per chunk so episodes align to chunk starts — the simpler mode, kept
    # for tests/debugging and as the semantics reference.
    rollout_mode: str = "continuous"
    slots_per_env: int = 4  # continuous mode: completed-episode slots/env/chunk
    # Continuous mode: compute initial priorities with a target-net forward
    # over the assembled episodes (the reference's online-target
    # compute_priority, r2d2.py:344-348) instead of the cheap online-online
    # approximation from the rollout's own Q values.
    # Default True since the round-3 equal-budget A/B (exps/prio_ab_*,
    # BENCHMARKS.md): at equal wall-clock the exact path led 12.0 vs 10.6
    # eval score (iql_2p, seed 909, ~13 min each) despite ~10% fewer epochs
    # from the extra target forward.
    continuous_exact_priority: bool = True
    # Compute the exact online-target initial priorities from a target-net
    # forward fused INTO the rollout scan (act advances both nets; the
    # target hidden resets on done like the online one) instead of the
    # separate full-sequence re-forward over the assembled slots. Same
    # quantity — see r2d2_agent.act_with_target. Default True since the
    # round-4 on-chip A/B (exps/perf_ab_r4.log, BENCHMARKS.md): production
    # chunk 237.7 -> 203.8 ms (-14%); the re-forward it removes costs
    # ~67 ms, the in-scan target adds ~20 ms to the rollout. Only
    # meaningful with continuous_exact_priority.
    exact_priority_in_rollout: bool = True
    # Merge the learner's online+target sequence forwards into one scan over
    # stacked params (agent/r2d2_agent.py td_error); numbers unchanged
    # (equality-tested). Default False: the round-4 on-chip A/B measured it
    # SLOWER at production shapes (chunk 271.6 vs 237.7 ms — the stacked
    # backward's dead target-slice gradient costs more than the saved scan
    # latency; exps/perf_ab_r4.log). Kept as a tested knob for shape
    # classes where the learner scans are latency- rather than
    # compute-bound.
    stacked_td: bool = False
    # Draw all num_update_per_chunk batches (indices, IS weights, and the
    # bitpacked episode gather) from the chunk-start priority snapshot in
    # one parallel pass instead of re-sampling against live priorities
    # inside the Adam-serial update scan. This is the reference
    # prefetcher's semantics (prioritized_replay.h:216-239: with
    # prefetch=3 the next batches are drawn before the learner's
    # updatePriority feedback lands) taken to prefetch=num_update_per_chunk;
    # the learner's priority updates still scatter into the replay every
    # step, they are just invisible to the same chunk's later batches.
    # Bit-identical to the sequential path at num_update_per_chunk=1
    # (equality-tested). Default False pending the round-5 on-chip A/B.
    snapshot_sampling: bool = False
    # Scan unroll factors (1 = plain scan). rollout_unroll widens the
    # act+env rollout loop body; net_seq_unroll widens the learner's
    # sequence-LSTM loop. The per-step matmuls at these sizes run far below
    # MXU saturation (BENCHMARKS.md round-3 sweep), so cross-step software
    # pipelining is the remaining single-chip throughput lever.
    rollout_unroll: int = 1
    net_seq_unroll: int = 1
    num_eval_game: int = 1000
    eval_max_steps: int = 128  # > longest possible game; eval has no forced cap
    eval_freq_epochs: int = 1
    # Capture a jax.profiler device/host trace (Perfetto + XPlane, viewable in
    # TensorBoard / ui.perfetto.dev) of this many steady-state train chunks
    # into <save_dir>/profile. 0 = off. The reference's only profiling is a
    # wall-clock Stopwatch (SURVEY.md §5 "no chrome-trace/timeline tooling").
    profile_chunks: int = 0
    # Multi-host (DCN) scale-out: call jax.distributed.initialize() before
    # device discovery so the data mesh spans every host's chips
    # (parallel/mesh.py; the reference is strictly single-machine,
    # SURVEY.md §2.16).
    multihost: bool = False

    def __post_init__(self):
        assert self.method in ("vdn", "iql")
        assert self.rollout_mode in ("aligned", "continuous")

    @property
    def vdn(self) -> bool:
        return self.method == "vdn"

    def derived(self) -> "TrainConfig":
        """VDN divides batch/buffer/burn-in by num_player (selfplay.py:103-106)."""
        if not self.vdn:
            return self
        return dataclasses.replace(
            self,
            batchsize=int(round(self.batchsize / self.num_player)),
            replay_buffer_size=self.replay_buffer_size // self.num_player,
            burn_in_frames=self.burn_in_frames // self.num_player,
        )


def generate_explore_eps(base_eps: float, alpha: float, num_env: int) -> Tuple[float, ...]:
    """eps_i = base ** (1 + i/(n-1) * alpha), zero-clamped (utils.py:367-379)."""
    if num_env == 1:
        return (0.0 if base_eps < 1e-6 else base_eps,)
    out = []
    for i in range(num_env):
        eps = base_eps ** (1 + i / (num_env - 1) * alpha)
        out.append(0.0 if eps < 1e-6 else eps)
    return tuple(out)


# Shell-preset hyperparameters, matched line-by-line to the reference launch
# scripts (pyhanabi/tools/*.sh). Common to all: lr 6.25e-5, adam eps 1.5e-5,
# grad clip 5, gamma .999, eps menu base .1 alpha 7, prioritized alpha .9
# beta .6, buffer 2^17, batch 128.
_COMMON = dict(
    # Production rollout path: auto-resetting envs, zero idle frames (both
    # long training runs in BENCHMARKS.md used it). Redundant with the
    # TrainConfig default since round 4; kept explicit for preset readability.
    rollout_mode="continuous",
    act_base_eps=0.1,
    act_eps_alpha=7.0,
    lr=6.25e-5,
    adam_eps=1.5e-5,
    grad_clip=5.0,
    gamma=0.999,
    batchsize=128,
    replay_buffer_size=2 ** 17,
    burn_in_frames=10000,
    priority_exponent=0.9,
    priority_weight=0.6,
    epoch_len=1000,
    num_player=2,
    rnn_hid_dim=512,
    multi_step=3,
)

PRESETS: Dict[str, Dict] = {
    # tools/dev.sh — small smoke-test run (iql + sad + shuffle_color)
    "dev": dict(
        _COMMON,
        method="iql",
        sad=True,
        shuffle_color=True,
        burn_in_frames=5000,
        epoch_len=400,
        num_epoch=10,
        seed=1,
        num_envs=256,
        num_update_per_chunk=8,
        num_eval_game=200,
    ),
    # tools/iql_2player.sh
    "iql_2p": dict(_COMMON, method="iql", seed=9),
    # tools/vdn_2player.sh
    "vdn_2p": dict(_COMMON, method="vdn", seed=9),
    # tools/sad_2player.sh — the headline SAD config
    "sad_2p": dict(_COMMON, method="vdn", sad=True, seed=9),
    # tools/op_2player.sh — Other-Play VDN
    "op_2p": dict(_COMMON, method="vdn", shuffle_color=True, seed=9),
    # SAD + aux + Other-Play — the configuration behind the released
    # sad-aux-op models (README.md:39-40; flags sad/pred_weight/shuffle_color
    # from selfplay.py:30-42)
    "sad_aux_op_2p": dict(
        _COMMON, method="vdn", sad=True, shuffle_color=True, pred_weight=0.25, seed=9
    ),
}


def make_config(preset: Optional[str] = None, **overrides) -> TrainConfig:
    base = dict(PRESETS[preset]) if preset else {}
    base.update(overrides)
    return TrainConfig(**base)
