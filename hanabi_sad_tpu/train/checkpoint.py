"""Checkpointing.

The reference saves weights-only .pthw state dicts and cannot truly resume
(SURVEY.md §5: no optimizer/RNG/replay state). Here a full checkpoint carries
params (online+target), optimizer state, the global update counter, and the
PRNG keys — everything except the replay contents (whose distribution
regenerates within one burn-in; persisting 1+ GB of transient experience is
deliberately skipped, matching the reference's replay-free resume).

Format: a pickled dict of numpy arrays keyed by pytree path — backend- and
framework-neutral, loadable without jax.
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def tree_to_numpy(tree) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def params_payload(params, config_dict: Optional[Dict] = None) -> Dict:
    """Weights-only payload (the reference's .pthw equivalent). Unlike a
    .pthw — whose training flags must be re-parsed out of train.log at load
    time (reference utils.py:87-116) — the payload carries the config
    itself when provided."""
    out = {"kind": "params", "params": tree_to_numpy(params)}
    if config_dict is not None:
        out["config"] = dict(config_dict)
    return out


def train_state_payload(state, config_dict: Dict) -> Dict:
    """Full-resume payload. Replay contents excluded (see module docstring)."""
    return {
        "kind": "train_state",
        "config": config_dict,
        "params": tree_to_numpy(state.params),
        "opt_state": tree_to_numpy(state.opt_state),
        "num_update": int(state.num_update),
        "env_key": np.asarray(state.env_key),
        "sample_key": np.asarray(state.sample_key),
    }


def save(path: str, payload: Dict) -> None:
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load(path: str) -> Dict:
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_train_state(payload: Dict, state):
    """Rebuild a TrainState from a payload onto a freshly initialized state
    (the fresh state supplies the replay buffer and pytree structure)."""
    assert payload["kind"] == "train_state"
    import jax.numpy as jnp

    def like(template, saved):
        return jax.tree_util.tree_map(
            lambda t, s: jnp.asarray(s, dtype=t.dtype), template, saved
        )

    def merge_opt(t, s):
        """Tolerant opt_state restore: recurse where the saved structure
        matches the fresh template's, keep the template subtree where it
        does not. Needed for pre-round-4 constant-lr payloads whose Adam lr
        was a stateless float (no ScaleByScheduleState leaf) restoring into
        the always-schedule-backed optimizer (learner.make_optimizer)."""
        if isinstance(t, tuple) and isinstance(s, tuple):
            if type(t) is type(s) and len(t) == len(s):
                merged = [merge_opt(a, b) for a, b in zip(t, s)]
                return type(t)(*merged) if hasattr(t, "_fields") else tuple(merged)
            return t
        if isinstance(t, list) and isinstance(s, list) and len(t) == len(s):
            return [merge_opt(a, b) for a, b in zip(t, s)]
        if isinstance(t, dict) and isinstance(s, dict) and set(t) == set(s):
            return {k: merge_opt(t[k], s[k]) for k in t}
        try:
            return jnp.asarray(s, dtype=t.dtype)
        except (TypeError, ValueError):
            return t

    num_update = int(payload["num_update"])
    opt_state = merge_opt(state.opt_state, payload["opt_state"])

    def fix_schedule_count(x):
        # The schedule step count equals the global update counter by
        # construction (both increment once per gradient step), so setting
        # it from the payload is a no-op on matched restores and repairs
        # template-fallback leaves (which would otherwise restart the lr
        # schedule from step 0).
        if isinstance(x, optax.ScaleByScheduleState):
            return x._replace(count=jnp.asarray(num_update, x.count.dtype))
        return x

    import optax

    opt_state = jax.tree_util.tree_map(
        fix_schedule_count,
        opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByScheduleState),
    )

    return state._replace(
        params=like(state.params, payload["params"]),
        opt_state=opt_state,
        num_update=jnp.asarray(num_update, jnp.int32),
        env_key=jnp.asarray(payload["env_key"], state.env_key.dtype),
        sample_key=jnp.asarray(payload["sample_key"], state.sample_key.dtype),
    )


def load_params_into(payload: Dict, params_template):
    """Load a weights payload onto an AgentParams(online, target) template.

    Accepts either a full AgentParams pair or a bare online-net pytree (what
    TopkSaver payloads carry — the reference's .pthw equivalent saves only
    the online net, selfplay.py:271-273); a bare net initializes both online
    and target, matching load_weight + sync_target_with_online
    (utils.py:278-299, selfplay.py:141)."""
    import jax.numpy as jnp

    saved = payload["params"]
    cast = lambda t, s: jax.tree_util.tree_map(
        lambda a, b: jnp.asarray(b, dtype=a.dtype), t, s
    )
    if hasattr(saved, "online") or (isinstance(saved, dict) and "online" in saved):
        return cast(params_template, saved)
    online = cast(params_template.online, saved)
    target = jax.tree_util.tree_map(lambda x: x + 0, online)
    return type(params_template)(online=online, target=target)
