"""Checkpointing (orbax-backed).

Covers the reference's two checkpoint styles (SURVEY.md §5):
  - best-val model checkpointing for probes (PL ModelCheckpoint monitor=val_loss
    mode=min, reference train.py:160-165; test restores best, train.py:170-174)
  - step-stamped train state (params + opt state + env-step counter) for RL, matching
    the `…__stage_00__steps_N.pt` convention (baselines_robothor_objectnav.md:58).
"""

from __future__ import annotations

import math
import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

__all__ = ["save_pytree", "restore_pytree", "restore_params", "BestCheckpointer",
           "StepCheckpointer"]


def save_pytree(path: str, tree: Any) -> None:
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.close()


def restore_pytree(path: str, target: Optional[Any] = None) -> Any:
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    try:
        if target is not None:
            return ckptr.restore(path, args=ocp.args.PyTreeRestore(target))
        return ckptr.restore(path)
    finally:
        ckptr.close()


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:  # pragma: no cover - future key kinds
            parts.append(str(p))
    return "/".join(parts)


def restore_params(path: str, params_template: Any) -> Any:
    """Restore ONLY policy/model params from a checkpoint of either layout:
    a bare params tree, or a full train state ({"params", "opt_state", ...} —
    the step-stamped RL checkpoints). This is what makes fake-trained
    checkpoints loadable by thor/habitat-backend learners (`--ckpt`): the
    action spaces match (envs/gridworld.py ACTIONS == envs/thor.py
    OBJECTNAV_ACTIONS), so only the params subtree transfers.

    Structure checks are key-path-aware: two architectures with
    coincidentally equal flat shape lists cannot silently cross-load — the
    first divergent key path is named in the error."""
    raw = restore_pytree(path)
    if isinstance(raw, dict) and "params" in raw:
        raw = raw["params"]
    flat_t, treedef = jax.tree_util.tree_flatten_with_path(params_template)
    flat_r = jax.tree_util.tree_flatten_with_path(raw)[0]
    if len(flat_t) != len(flat_r):
        raise ValueError(
            f"checkpoint param tree has {len(flat_r)} leaves, expected "
            f"{len(flat_t)} — incompatible policy architecture")
    import jax.numpy as jnp

    out = []
    for (pt, t), (pr, v) in zip(flat_t, flat_r):
        st, sr = _path_str(pt), _path_str(pr)
        if st != sr:
            raise ValueError(
                f"checkpoint param tree diverges at '{sr}' (expected '{st}') "
                "— incompatible policy architecture")
        v = jnp.asarray(v)
        if v.shape != t.shape:
            raise ValueError(
                f"checkpoint leaf '{st}' shape {v.shape} != expected "
                f"{t.shape} — incompatible policy architecture")
        out.append(v.astype(t.dtype))
    return jax.tree.unflatten(treedef, out)


class BestCheckpointer:
    """Keep the params minimizing a monitored metric; optionally persist to disk."""

    def __init__(self, directory: Optional[str] = None, mode: str = "min"):
        self.directory = directory
        self.sign = 1.0 if mode == "min" else -1.0
        self.best_value = math.inf
        self.best_params = None
        self.best_tag = None

    def update(self, value: float, params: Any, tag: str = "") -> bool:
        if self.sign * value < self.best_value:
            self.best_value = self.sign * value
            # Snapshot to host: the live param buffers may be donated into the next
            # jitted train step, which would invalidate a by-reference copy.
            import numpy as np

            self.best_params = jax.tree.map(lambda a: np.asarray(a), params)
            self.best_tag = tag
            if self.directory is not None:
                save_pytree(os.path.join(self.directory, "best"), params)
            return True
        return False


class StepCheckpointer:
    """Step-stamped train-state checkpoints with latest-restore."""

    def __init__(self, directory: str, prefix: str = "ckpt"):
        self.directory = os.path.abspath(directory)
        self.prefix = prefix
        os.makedirs(self.directory, exist_ok=True)

    def _path(self, step: int) -> str:
        return os.path.join(self.directory, f"{self.prefix}__steps_{step:012d}")

    def save(self, step: int, state: Any) -> str:
        path = self._path(step)
        save_pytree(path, state)
        return path

    def latest_step(self) -> Optional[int]:
        pat = re.compile(rf"{re.escape(self.prefix)}__steps_(\d+)$")
        steps = [
            int(m.group(1))
            for name in os.listdir(self.directory)
            if (m := pat.match(name))
        ]
        return max(steps) if steps else None

    def restore_latest(self, target: Optional[Any] = None):
        step = self.latest_step()
        if step is None:
            return None, None
        path = self._path(step)
        try:
            state = restore_pytree(path, target)
        except (ValueError, KeyError, TypeError) as e:
            # orbax raises its own (opaque) structure errors when the stored
            # tree doesn't match the template — translate to the actionable
            # message. I/O failures (truncated save, permissions, a missing
            # array file on one host) propagate untranslated: those are not
            # config mismatches and the fix is not "use a fresh output dir".
            raise ValueError(
                f"checkpoint {path} does not match this experiment's "
                "train-state tree: the output dir holds a checkpoint from a "
                "different experiment config — use a fresh output dir (or "
                f"pass the old checkpoint explicitly via --ckpt). [{e}]"
            ) from e
        if target is not None:
            # Resume-on-restart contract: the checkpoint must be THIS
            # experiment's train state. A reused output dir holding another
            # config's checkpoints otherwise restores mismatched arrays that
            # only blow up later, deep inside a jitted rollout trace, as an
            # inscrutable flax shape error.
            _check_matches_template(target, state, path)
        return step, state


def _check_matches_template(template: Any, restored: Any, path: str) -> None:
    flat_t = jax.tree_util.tree_flatten_with_path(template)[0]
    flat_r = jax.tree_util.tree_flatten_with_path(restored)[0]
    if len(flat_t) != len(flat_r):
        raise ValueError(
            f"checkpoint {path} has {len(flat_r)} leaves, expected "
            f"{len(flat_t)}: the output dir holds a checkpoint from a "
            "different experiment config — use a fresh output dir (or pass "
            "the old checkpoint explicitly via --ckpt)")
    import numpy as np

    for (pt, t), (pr, v) in zip(flat_t, flat_r):
        st, sr = _path_str(pt), _path_str(pr)
        if st != sr:
            raise ValueError(
                f"checkpoint {path} diverges at leaf '{sr}' (expected '{st}') "
                "— the output dir holds a checkpoint from a different "
                "experiment config; use a fresh output dir")
        if np.shape(v) != np.shape(t):
            raise ValueError(
                f"checkpoint {path} leaf '{st}' has shape {np.shape(v)}, "
                f"expected {np.shape(t)} — the output dir holds a checkpoint "
                "from a different experiment config (e.g. another encoder); "
                "use a fresh output dir")
