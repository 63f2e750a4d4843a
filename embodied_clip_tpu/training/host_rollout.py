"""Host-env rollout collection: CPU simulators feeding the TPU policy.

The external-simulator counterpart of training/rollout.py (SURVEY.md §3.5's hot loop
1): a VectorEnv pool steps AI2-THOR/Habitat-style HostEnvs while the device runs one
jitted act step — fused frozen-CLIP encode of the uint8 frame batch + policy step.
Transfers are one uint8 batch per step (frames assembled via the shared-memory ring
when built); actions are dispatched asynchronously so simulators step while the host
assembles the rollout. Yields the same Rollout pytree as the on-device path, so the
PPO/DAgger learners are agnostic to where rollouts came from.

Double-buffering (the BASELINE.md north-star pipeline shape): pass a LIST of
VectorEnv pools and the collector software-pipelines them — while group g's
simulators compute step t+1, the device runs the act step (encode + policy) for
group g+1, so device and simulators are both busy in steady state. Each group is a
disjoint set of environments, so the concatenated (T, B) rollout is exactly what a
single pool of the same total size would produce (per-column trajectories are
self-consistent; GAE and the GRU carry run per column). With one pool the schedule
degenerates to the sequential act→step loop.

DD-PPO straggler cutoff lives in VectorEnv (cutoff_fraction); masked (invalid) steps
are recorded as done=False reward=0 with repeated obs AND flagged in Rollout.valid —
GAE passes advantage accumulation through them and the PPO loss masks them to zero
gradient, matching DD-PPO's truncate-the-laggard semantics (fabricated steps are not
data).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from embodied_clip_tpu.training.ppo import Rollout
from embodied_clip_tpu.utils.profiling import StageTimer

__all__ = ["HostRolloutCollector"]


class HostRolloutCollector:
    def __init__(self, venv, policy, encode_fn: Optional[Callable] = None,
                 goal_map_fn: Optional[Callable] = None,
                 env_id_offset: int = 0):
        """env_id_offset: this process's first GLOBAL env index (multi-process
        DD-PPO gives process p offset p·B_local). Action sampling folds the
        global env id into the per-step key, so trajectories are a function of
        (seed, global env id) — independent of how envs are split across
        processes or pipeline groups: N processes × B/N envs collect exactly
        what one process × B envs would."""
        self.venvs = list(venv) if isinstance(venv, (list, tuple)) else [venv]
        self.venv = self.venvs[0]
        self.policy = policy
        self.encode_fn = encode_fn
        self.goal_map_fn = goal_map_fn
        # Per-group global env-id ranges (group order = batch order).
        starts = np.cumsum([0] + [v.n for v in self.venvs])
        self._env_ids = [
            jnp.arange(env_id_offset + a, env_id_offset + b)
            for a, b in zip(starts[:-1], starts[1:])
        ]
        self._act_step = jax.jit(self._act_step_impl)
        self._g: Optional[List[Dict]] = None  # per-group mutable state
        # Per-stage wall-time accounting (SURVEY.md §5 tracing row): "act" =
        # device act step incl. the frozen encode, "env_step" = waiting on the
        # simulator pool. The learner adds "update" and publishes fractions +
        # env-steps/s as first-class trainer metrics. With pipelined groups the
        # stage sums overlap in wall time; the learner's env-steps/s uses the
        # collector's own wall clock, so the pipelining gain is visible there.
        self.timer = StageTimer()

    # ------------------------------------------------------------------ state views
    # Concatenated-across-groups views of the live state (batch order = group
    # order, matching the Rollout columns collect() returns).

    @property
    def num_envs(self) -> int:
        return sum(v.n for v in self.venvs)

    @property
    def _obs(self) -> Dict[str, np.ndarray]:
        gs = self._g
        return {k: np.concatenate([g["obs"][k] for g in gs]) for k in gs[0]["obs"]}

    @property
    def _prev_action(self):
        return jnp.concatenate([g["prev_action"] for g in self._g])

    @property
    def _h(self):
        return jnp.concatenate([g["h"] for g in self._g])

    @property
    def _is_start(self):
        return jnp.concatenate([g["is_start"] for g in self._g])

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

    def _act_step_impl(self, params, obs, h, is_start, key, env_ids):
        logits, value, h = self.policy.apply({"params": params}, obs, h, is_start)
        # Per-env keys from (per-step base key, GLOBAL env id): the sampled
        # action for env i at step t is a function of (seed, t, i) only —
        # independent of which process, pipeline group, or batch slot holds
        # the env (the base key is fold_in(seed, t), NOT a split chain whose
        # length would depend on the group count).
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(env_ids)
        action = jax.vmap(jax.random.categorical)(keys, logits).astype(jnp.int32)
        logp = jnp.take_along_axis(jax.nn.log_softmax(logits, -1),
                                   action[:, None], 1)[:, 0]
        return action, logp, value, h

    def _step_key(self, st: Dict):
        """Base key for this group's next act step; advances the group's step
        counter. Groups at the same timestep t use the same base key."""
        k = jax.random.fold_in(self._key, st["t"])
        st["t"] += 1
        return k

    def reset(self, key) -> None:
        self._g = []
        for venv in self.venvs:
            n = venv.n
            self._g.append({
                "obs": venv.reset(),
                "h": jnp.zeros((n, self.policy.hidden), jnp.float32),
                "prev_action": jnp.full((n,), self.venv_num_actions, jnp.int32),
                "is_start": jnp.ones((n,), bool),
                "t": 0,
            })
        self._key = key

    @property
    def venv_num_actions(self) -> int:
        return getattr(self.venv, "num_actions", None) or self.policy.num_actions

    # ---------------------------------------------------------------- collection

    def _act_send(self, params, g: int, rec) -> None:
        """Device act step for group g, then dispatch its actions to the pool.
        The blocking fetch of the sampled actions is where the other groups'
        in-flight simulator steps overlap with device compute."""
        st = self._g[g]
        with self.timer.stage("act"):
            obs_dev = self._policy_obs(st["obs"], st["prev_action"])
            action, logp, value, st["h"] = self._act_step(
                params, obs_dev, st["h"], st["is_start"], self._step_key(st),
                self._env_ids[g]
            )
            action_np = np.asarray(action)  # blocks on the device act step
        self.venvs[g].step_async(action_np)
        # Record the act-time quantities while the simulators step.
        r = rec[g]
        r["obs"].append(obs_dev)
        r["starts"].append(st["is_start"])
        r["actions"].append(action)
        r["logps"].append(logp)
        r["values"].append(value)
        st["sent_action"] = action

    def _wait_record(self, g: int, rec, ep_metrics) -> None:
        st = self._g[g]
        with self.timer.stage("env_step"):
            next_obs, reward, done, infos, valid = self.venvs[g].step_wait()
        r = rec[g]
        r["rewards"].append(jnp.asarray(reward))
        r["dones"].append(jnp.asarray(done))
        r["valids"].append(jnp.asarray(valid))
        for inf in infos:
            if "success" in inf:
                for k in ep_metrics:
                    ep_metrics[k].append(inf[k])
        st["obs"] = next_obs
        done_j = jnp.asarray(done)
        st["is_start"] = done_j
        st["prev_action"] = jnp.where(
            done_j, jnp.int32(self.venv_num_actions), st["sent_action"]
        )

    def collect(self, params, num_steps: int) -> Tuple[Rollout, jnp.ndarray, Dict[str, float]]:
        """Collect (T, B) arrays by pipelining device act-steps against env steps
        across groups (B = total envs across all groups, in group order)."""
        assert self._g is not None, "call reset() first"
        G = len(self.venvs)
        rec = [
            {k: [] for k in ("obs", "starts", "actions", "logps", "values",
                             "rewards", "dones", "valids")}
            for _ in range(G)
        ]
        ep_metrics = {"success": [], "spl": [], "episode_len": []}
        h0 = jnp.concatenate([g["h"] for g in self._g])

        self._act_send(params, 0, rec)
        for t in range(num_steps):
            for g in range(G):
                nxt = (g + 1) % G
                if nxt != g and not (t == num_steps - 1 and nxt == 0):
                    self._act_send(params, nxt, rec)  # overlaps group g's env step
                self._wait_record(g, rec, ep_metrics)
                if nxt == g and t < num_steps - 1:  # G == 1: sequential schedule
                    self._act_send(params, g, rec)

        def stack_group(r):
            return dict(
                obs=jax.tree.map(lambda *xs: jnp.stack(xs), *r["obs"]),
                **{k: jnp.stack(r[k]) for k in
                   ("starts", "actions", "logps", "values", "rewards", "dones",
                    "valids")},
            )

        parts = [stack_group(r) for r in rec]
        cat = lambda key: jnp.concatenate([p[key] for p in parts], axis=1)
        rollout = Rollout(
            obs=jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=1),
                             *[p["obs"] for p in parts]),
            is_start=cat("starts"),
            actions=cat("actions"),
            log_probs=cat("logps"),
            values=cat("values"),
            rewards=cat("rewards"),
            dones=cat("dones"),
            h0=h0,
            valid=cat("valids"),
        )
        # Bootstrap value for the state after the final step, per group.
        last_values = []
        for g in range(G):
            st = self._g[g]
            obs_dev = self._policy_obs(st["obs"], st["prev_action"])
            # bootstrap value only — the sampled action is discarded, so the
            # base key here (fold_in at the group's current t, NOT advanced)
            # never affects trajectories
            _, _, v, _ = self._act_step(
                params, obs_dev, st["h"], st["is_start"],
                jax.random.fold_in(self._key, st["t"]), self._env_ids[g]
            )
            last_values.append(v)
        metrics = {
            k: float(np.mean(v)) if v else 0.0 for k, v in ep_metrics.items()
        }
        metrics["episodes"] = float(len(ep_metrics["success"]))
        return rollout, jnp.concatenate(last_values), metrics

    def collect_dagger(self, params, num_steps: int, beta: float, rng):
        """DAgger collection: act with a β-mixture of expert and learner actions,
        labeling every step with the expert's action (queried from the live env
        workers before stepping). Returns (obs_seq, h0, starts, expert_seq,
        weights, metrics) — weights (T, B) masks (obs, expert) pairs whose obs
        is stale: the previous step_wait fabricated this env's transition
        (straggler timeout / worker respawn repeats the old obs while the
        worker's real state advanced), or the expert query itself respawned or
        drained past an episode boundary (the expert answers for the ADVANCED
        state). Training on such pairs imitates off-by-one / cross-episode
        labels.

        Requires cutoff_fraction == 1.0 on the pool (expert queries are synchronous
        per-worker round-trips; imitation has no straggler-cutoff semantics) and a
        single pool (no pipelining: the expert query serializes act and step)."""
        assert self._g is not None, "call reset() first"
        assert len(self.venvs) == 1, "DAgger collection does not pipeline groups"
        assert getattr(self.venv, "cutoff_fraction", 1.0) >= 1.0, \
            "DAgger collection needs a lockstep pool (cutoff_fraction=1.0)"
        st = self._g[0]
        obs_seq, starts, experts, weights = [], [], [], []
        ep_metrics = {"success": [], "spl": [], "episode_len": []}
        h0 = st["h"]
        valid_prev = np.ones(self.venv.n, bool)
        for _ in range(num_steps):
            # Stage accounting mirrors collect(): "act" = device act step
            # (incl. the frozen encode), "env_step" = simulator-side work (the
            # synchronous expert query + the env step) — so the learner's
            # env_steps_per_s and stage fractions cover the whole iteration.
            with self.timer.stage("env_step"):
                expert = self.venv.expert_actions()
            # Taint mask for this (obs, expert) pair — see the docstring.
            w = valid_prev.copy()
            pend = getattr(self.venv, "_respawned_pending", ())
            if pend:
                w[list(pend)] = False
            with self.timer.stage("act"):
                obs_dev = self._policy_obs(st["obs"], st["prev_action"])
                action, _, _, st["h"] = self._act_step(
                    params, obs_dev, st["h"], st["is_start"],
                    self._step_key(st), self._env_ids[0]
                )
                action_host = np.asarray(action)  # blocks on the act step
            take_expert = rng.rand(self.venv.n) < beta
            action_np = np.where(take_expert, expert, action_host).astype(np.int32)
            self.venv.step_async(action_np)
            obs_seq.append(obs_dev)
            starts.append(st["is_start"])
            experts.append(jnp.asarray(expert))
            weights.append(jnp.asarray(w, jnp.float32))
            with self.timer.stage("env_step"):
                next_obs, _reward, done, infos, valid = self.venv.step_wait()
            valid_prev = np.asarray(valid, bool)
            for inf in infos:
                if "success" in inf:
                    for k in ep_metrics:
                        ep_metrics[k].append(inf[k])
            st["obs"] = next_obs
            st["is_start"] = jnp.asarray(done)
            st["prev_action"] = jnp.where(
                jnp.asarray(done), jnp.int32(self.venv_num_actions),
                jnp.asarray(action_np),
            )
        obs_stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *obs_seq)
        metrics = {
            k: float(np.mean(v)) if v else 0.0 for k, v in ep_metrics.items()
        }
        metrics["episodes"] = float(len(ep_metrics["success"]))
        return (obs_stacked, h0, jnp.stack(starts), jnp.stack(experts),
                jnp.stack(weights), metrics)
