"""Host-env rollout collection: CPU simulators feeding the TPU policy.

The external-simulator counterpart of training/rollout.py (SURVEY.md §3.5's hot loop
1): a VectorEnv pool steps AI2-THOR/Habitat-style HostEnvs while the device runs one
jitted act step — fused frozen-CLIP encode of the uint8 frame batch + policy step.
Transfers are one uint8 batch per step (frames assembled via the shared-memory ring
when built); actions are dispatched asynchronously so simulators step while the host
assembles the rollout. Yields the same Rollout pytree as the on-device path, so the
PPO/DAgger learners are agnostic to where rollouts came from.

DD-PPO straggler cutoff lives in VectorEnv (cutoff_fraction); masked (invalid) steps
are recorded as done=False reward=0 with repeated obs AND flagged in Rollout.valid —
GAE passes advantage accumulation through them and the PPO loss masks them to zero
gradient, matching DD-PPO's truncate-the-laggard semantics (fabricated steps are not
data).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from embodied_clip_tpu.training.ppo import Rollout
from embodied_clip_tpu.utils.profiling import StageTimer

__all__ = ["HostRolloutCollector"]


class HostRolloutCollector:
    def __init__(self, venv, policy, encode_fn: Optional[Callable] = None,
                 goal_map_fn: Optional[Callable] = None):
        self.venv = venv
        self.policy = policy
        self.encode_fn = encode_fn
        self.goal_map_fn = goal_map_fn
        self._act_step = jax.jit(self._act_step_impl)
        self._obs = None
        self._h = None
        self._prev_action = None
        self._is_start = None
        # Per-stage wall-time accounting (SURVEY.md §5 tracing row): "act" =
        # device act step incl. the frozen encode, "env_step" = waiting on the
        # simulator pool. The learner adds "update" and publishes fractions +
        # env-steps/s as first-class trainer metrics.
        self.timer = StageTimer()

    def _policy_obs(self, obs_np: Dict[str, np.ndarray], prev_action) -> Dict:
        o = {k: jnp.asarray(v) for k, v in obs_np.items()}
        if self.encode_fn is not None:
            o["visual"] = self.encode_fn(o["visual"])
        # 1-phase rearrangement: current + goal views, channel-concatenated after
        # the (shared) frozen encoder — the upstream two-THOR-instance observation.
        if "goal_visual" in o:
            gv = o.pop("goal_visual")
            if self.encode_fn is not None:
                gv = self.encode_fn(gv)
            o["visual"] = jnp.concatenate([o["visual"], gv], axis=-1)
        if self.goal_map_fn is not None:
            o["goal"] = self.goal_map_fn(o["goal"])
        o["prev_action"] = prev_action
        return o

    def _act_step_impl(self, params, obs, h, is_start, key):
        logits, value, h = self.policy.apply({"params": params}, obs, h, is_start)
        key, k = jax.random.split(key)
        action = jax.random.categorical(k, logits).astype(jnp.int32)
        logp = jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                                   action[:, None], 1)[:, 0]
        return action, logp, value, h, key

    def reset(self, key) -> None:
        obs = self.venv.reset()
        n = self.venv.n
        self._obs = obs
        self._h = jnp.zeros((n, self.policy.hidden), jnp.float32)
        self._prev_action = jnp.full((n,), self.venv_num_actions, jnp.int32)
        self._is_start = jnp.ones((n,), bool)
        self._key = key

    @property
    def venv_num_actions(self) -> int:
        return getattr(self.venv, "num_actions", None) or self.policy.num_actions

    def collect(self, params, num_steps: int) -> Tuple[Rollout, jnp.ndarray, Dict[str, float]]:
        """Collect (T, B) arrays by alternating device act-steps and env steps."""
        assert self._obs is not None, "call reset() first"
        obs_seq, starts, actions, logps, values, rewards, dones, valids = (
            [] for _ in range(8)
        )
        ep_metrics = {"success": [], "spl": [], "episode_len": []}
        h0 = self._h
        for _ in range(num_steps):
            with self.timer.stage("act"):
                obs_dev = self._policy_obs(self._obs, self._prev_action)
                action, logp, value, self._h, self._key = self._act_step(
                    params, obs_dev, self._h, self._is_start, self._key
                )
                action_np = np.asarray(action)  # blocks on the device act step
            # Envs step while we record the transition host-side.
            self.venv.step_async(action_np)
            obs_seq.append(obs_dev)
            starts.append(self._is_start)
            actions.append(action)
            logps.append(logp)
            values.append(value)
            with self.timer.stage("env_step"):
                next_obs, reward, done, infos, valid = self.venv.step_wait()
            rewards.append(jnp.asarray(reward))
            dones.append(jnp.asarray(done))
            valids.append(jnp.asarray(valid))
            for inf in infos:
                if "success" in inf:
                    for k in ep_metrics:
                        ep_metrics[k].append(inf[k])
            self._obs = next_obs
            self._is_start = jnp.asarray(done)
            self._prev_action = jnp.where(
                jnp.asarray(done), jnp.int32(self.venv_num_actions), action
            )

        obs_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *obs_seq)
        rollout = Rollout(
            obs=obs_stacked,
            is_start=jnp.stack(starts),
            actions=jnp.stack(actions),
            log_probs=jnp.stack(logps),
            values=jnp.stack(values),
            rewards=jnp.stack(rewards),
            dones=jnp.stack(dones),
            h0=h0,
            valid=jnp.stack(valids),
        )
        # Bootstrap value for the state after the final step.
        obs_dev = self._policy_obs(self._obs, self._prev_action)
        _, _, last_value, _, _ = self._act_step(
            params, obs_dev, self._h, self._is_start, self._key
        )
        metrics = {
            k: float(np.mean(v)) if v else 0.0 for k, v in ep_metrics.items()
        }
        metrics["episodes"] = float(len(ep_metrics["success"]))
        return rollout, last_value, metrics

    def collect_dagger(self, params, num_steps: int, beta: float, rng):
        """DAgger collection: act with a β-mixture of expert and learner actions,
        labeling every step with the expert's action (queried from the live env
        workers before stepping). Returns (obs_seq, h0, starts, expert_seq, metrics).

        Requires cutoff_fraction == 1.0 on the pool (expert queries are synchronous
        per-worker round-trips; imitation has no straggler-cutoff semantics)."""
        assert self._obs is not None, "call reset() first"
        assert getattr(self.venv, "cutoff_fraction", 1.0) >= 1.0, \
            "DAgger collection needs a lockstep pool (cutoff_fraction=1.0)"
        obs_seq, starts, experts = [], [], []
        ep_metrics = {"success": [], "spl": [], "episode_len": []}
        h0 = self._h
        for _ in range(num_steps):
            expert = self.venv.expert_actions()
            obs_dev = self._policy_obs(self._obs, self._prev_action)
            action, _, _, self._h, self._key = self._act_step(
                params, obs_dev, self._h, self._is_start, self._key
            )
            take_expert = rng.rand(self.venv.n) < beta
            action_np = np.where(take_expert, expert, np.asarray(action)).astype(np.int32)
            self.venv.step_async(action_np)
            obs_seq.append(obs_dev)
            starts.append(self._is_start)
            experts.append(jnp.asarray(expert))
            next_obs, _reward, done, infos, _valid = self.venv.step_wait()
            for inf in infos:
                if "success" in inf:
                    for k in ep_metrics:
                        ep_metrics[k].append(inf[k])
            self._obs = next_obs
            self._is_start = jnp.asarray(done)
            self._prev_action = jnp.where(
                jnp.asarray(done), jnp.int32(self.venv_num_actions),
                jnp.asarray(action_np),
            )
        obs_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *obs_seq)
        metrics = {
            k: float(np.mean(v)) if v else 0.0 for k, v in ep_metrics.items()
        }
        metrics["episodes"] = float(len(ep_metrics["success"]))
        return obs_stacked, h0, jnp.stack(starts), jnp.stack(experts), metrics
