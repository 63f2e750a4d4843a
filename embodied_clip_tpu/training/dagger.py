"""DAgger imitation learning.

The reference's iTHOR Rearrangement suite trains 1-phase agents with DAgger
(baselines_ithor_rearrangement.md:7-12: OnePhase*Dagger configs, 40 env processes).
Recipe: roll out a β-mixture of expert and learner actions, label every visited state
with the expert's action, minimize cross-entropy; β anneals from 1 → 0 so the state
distribution shifts from the expert's to the learner's.

TPU shape: like DD-PPO, one jitted iteration = T on-device env steps (expert queried
from env state inside the scan) + K supervised epochs over the unrolled GRU; env batch
shards over the mesh 'dp' axis.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from embodied_clip_tpu.models.policy import ActorCritic, unroll_policy
from embodied_clip_tpu.training.rollout import ActState, init_act_state

__all__ = ["DAggerConfig", "DAggerLearner", "HostDAggerLearner"]


@dataclasses.dataclass(frozen=True)
class DAggerConfig:
    rollout_len: int = 64
    env_batch: int = 32
    epochs: int = 1
    lr: float = 3e-4
    max_grad_norm: float = 0.5
    beta_decay_iters: int = 100   # β: 1 → 0 linearly over this many iterations
    # Dataset aggregation — the "D" in DAgger: keep up to this many past rollouts
    # (host memory, expert-labeled) and take each epoch's gradient step on a rollout
    # sampled uniformly from the aggregate, so training covers the state
    # distributions of ALL past policies, not just the freshest. 0 = off
    # (pure on-policy expert distillation).
    aggregate_size: int = 0


class DAggerLearner:
    def __init__(self, env, policy: ActorCritic, cfg: DAggerConfig,
                 encode_fn: Optional[Callable] = None, mesh=None):
        self.env = env
        self.policy = policy
        self.cfg = cfg
        self.encode_fn = encode_fn
        self.mesh = mesh
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.lr)
        )
        self._iteration = jax.jit(self._iteration_impl, donate_argnums=(0, 1, 2))
        # Aggregation path: separately-jitted collect + supervised step so replayed
        # rollouts (host-stored numpy) reuse one compiled update.
        self._buffer: list = []
        self._buf_rng = np.random.RandomState(0)
        self._collect_jit = jax.jit(self._collect)
        self._sup_step = jax.jit(self._sup_step_impl, donate_argnums=(0, 1))

    def init(self, key) -> Tuple[dict, optax.OptState, ActState]:
        k_param, k_act = jax.random.split(key)
        batch = self.cfg.env_batch
        _, obs0 = self.env.reset(k_act, batch)
        obs0 = dict(obs0)
        if self.encode_fn is not None:
            obs0["visual"] = self.encode_fn(obs0["visual"])
        obs0["prev_action"] = jnp.zeros((batch,), jnp.int32)
        params = self.policy.init(
            k_param, obs0, self.policy.initial_state(batch), jnp.zeros((batch,), bool)
        )["params"]
        opt_state = self.tx.init(params)
        act = init_act_state(
            self.env, self.policy.apply, params, k_act, batch, self.policy.hidden
        )
        if self.mesh is not None:
            from embodied_clip_tpu.parallel.mesh import replicate, shard_batch

            params = replicate(params, self.mesh)
            opt_state = replicate(opt_state, self.mesh)
            act = shard_batch(act, self.mesh, batch=batch)
        return params, opt_state, act

    def _collect(self, params, act: ActState, beta):
        def policy_obs(obs, prev_a):
            o = dict(obs)
            if self.encode_fn is not None:
                o["visual"] = self.encode_fn(o["visual"])
            o["prev_action"] = prev_a
            return o

        def step(carry: ActState, _):
            obs_in = policy_obs(carry.obs, carry.prev_action)
            logits, _, h = self.policy.apply(
                {"params": params}, obs_in, carry.h, carry.is_start
            )
            expert = self.env.expert_action(carry.env_state)
            key, k_act_, k_mix = jax.random.split(carry.key, 3)
            learner_a = jax.random.categorical(k_act_, logits).astype(jnp.int32)
            take_expert = jax.random.uniform(k_mix, expert.shape) < beta
            action = jnp.where(take_expert, expert, learner_a)
            env_state, obs, _, done, info = self.env.step(carry.env_state, action)
            prev_a = jnp.where(done, jnp.int32(self.env.num_actions), action)
            out = (obs_in, carry.is_start, expert, done, info)
            return ActState(env_state, obs, h, prev_a, done, key), out

        new_act, (obs_seq, starts, expert_seq, dones, infos) = jax.lax.scan(
            step, act, None, length=self.cfg.rollout_len
        )
        return new_act, obs_seq, starts, expert_seq, infos

    def _iteration_impl(self, params, opt_state, act: ActState, beta):
        h0 = act.h  # hidden entering step 0 of this rollout
        act, obs_seq, starts, expert_seq, infos = self._collect(params, act, beta)

        def loss_fn(p):
            logits, _, _ = unroll_policy(self.policy.apply, p, obs_seq, h0, starts)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, expert_seq[..., None], axis=-1)[..., 0]
            acc = (jnp.argmax(logits, -1) == expert_seq).astype(jnp.float32)
            return ce.mean(), acc.mean()

        loss = acc = None
        for _ in range(self.cfg.epochs):
            (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

        n_done = jnp.maximum(infos["done"].sum(), 1.0)
        metrics = {
            "loss": loss,
            "expert_match": acc,
            "success": (infos["success"] * infos["done"]).sum() / n_done,
            "spl": (infos["spl"] * infos["done"]).sum() / n_done,
            "episodes": infos["done"].sum(),
            "beta": beta,
        }
        return params, opt_state, act, metrics

    def _sup_step_impl(self, params, opt_state, obs_seq, h0, starts, expert_seq,
                       weights=None):
        """One supervised (cross-entropy vs expert) update on a stored rollout.
        weights (T, B) masks tainted (obs, expert) pairs out of the loss (the
        host collector's straggler/respawn fabrications — collect_dagger)."""

        def loss_fn(p):
            logits, _, _ = unroll_policy(self.policy.apply, p, obs_seq, h0, starts)
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, expert_seq[..., None], axis=-1)[..., 0]
            acc = (jnp.argmax(logits, -1) == expert_seq).astype(jnp.float32)
            if weights is None:
                return ce.mean(), acc.mean()
            w = weights.astype(jnp.float32)
            denom = jnp.maximum(w.sum(), 1.0)
            return (ce * w).sum() / denom, (acc * w).sum() / denom

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    def train_iteration(self, params, opt_state, act: ActState, iteration: int):
        """One DAgger iteration; β anneals linearly with `iteration`.

        With aggregate_size > 0, the fresh expert-labeled rollout joins a host-side
        aggregate buffer and every epoch's update trains on a rollout sampled
        uniformly from it (the DAgger dataset-aggregation recipe the reference's
        1-phase Rearrangement suite uses, baselines_ithor_rearrangement.md:7-12)."""
        beta = jnp.clip(1.0 - iteration / self.cfg.beta_decay_iters, 0.0, 1.0)
        if self.cfg.aggregate_size <= 0:
            return self._iteration(params, opt_state, act, beta)

        h0 = act.h
        act, obs_seq, starts, expert_seq, infos = self._collect_jit(params, act, beta)
        self._buffer.append(jax.device_get((obs_seq, h0, starts, expert_seq)))
        if len(self._buffer) > self.cfg.aggregate_size:
            self._buffer.pop(0)

        loss = acc = jnp.float32(0)
        for _ in range(self.cfg.epochs):
            sample = self._buffer[self._buf_rng.randint(len(self._buffer))]
            params, opt_state, loss, acc = self._sup_step(params, opt_state, *sample)

        n_done = jnp.maximum(infos["done"].sum(), 1.0)
        metrics = {
            "loss": loss,
            "expert_match": acc,
            "success": (infos["success"] * infos["done"]).sum() / n_done,
            "spl": (infos["spl"] * infos["done"]).sum() / n_done,
            "episodes": infos["done"].sum(),
            "beta": beta,
            "aggregate_rollouts": jnp.float32(len(self._buffer)),
        }
        return params, opt_state, act, metrics


class HostDAggerLearner:
    """DAgger over a VectorEnv worker pool (the reference's deployment shape for
    1-phase Rearrangement: 40 simulator processes feeding an accelerator learner,
    baselines_ithor_rearrangement.md:9). Expert labels come from each worker's
    env.expert_action(); the supervised update is jitted on device and the (T, B)
    batch shards over the mesh 'dp' axis when one is given."""

    def __init__(self, venv, policy: ActorCritic, cfg: DAggerConfig,
                 encode_fn: Optional[Callable] = None,
                 goal_map_fn: Optional[Callable] = None, mesh=None):
        import numpy as _np

        from embodied_clip_tpu.training.host_rollout import HostRolloutCollector

        # Single-process only (the experiment layer guards this too,
        # rl_experiments.py): the act step and float(loss) below assume
        # addressable arrays; a multi-host mesh would need local_view /
        # host_scalar like HostPPOLearner.
        import jax as _jax

        assert _jax.process_count() == 1, \
            "HostDAggerLearner is single-process (expert queries don't shard)"
        self.venv = venv
        self.policy = policy
        self.cfg = cfg
        self.mesh = mesh
        self.collector = HostRolloutCollector(venv, policy, encode_fn, goal_map_fn)
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm), optax.adam(cfg.lr)
        )
        self._rng = _np.random.RandomState(0)
        self._buffer: list = []
        self._sup_step = jax.jit(self._sup_step_impl, donate_argnums=(0, 1))

    _sup_step_impl = DAggerLearner._sup_step_impl

    def init(self, key):
        self.collector.reset(key)
        obs0 = self.collector._policy_obs(
            self.collector._obs, self.collector._prev_action
        )
        n = self.venv.n
        params = self.policy.init(
            key, obs0, self.policy.initial_state(n), jnp.zeros((n,), bool)
        )["params"]
        opt_state = self.tx.init(params)
        if self.mesh is not None:
            from embodied_clip_tpu.parallel.mesh import replicate

            params = replicate(params, self.mesh)
            opt_state = replicate(opt_state, self.mesh)
        return params, opt_state

    def _shard(self, sample):
        if self.mesh is None:
            return sample
        from embodied_clip_tpu.parallel.mesh import shard_batch, shard_time_major

        obs_seq, h0, starts, expert_seq, weights = sample
        n = self.venv.n
        return (shard_time_major(obs_seq, self.mesh, batch=n),
                shard_batch(h0, self.mesh, batch=n),
                shard_time_major(starts, self.mesh, batch=n),
                shard_time_major(expert_seq, self.mesh, batch=n),
                shard_time_major(weights, self.mesh, batch=n))

    def train_iteration(self, params, opt_state, iteration: int):
        import time

        t_start = time.perf_counter()
        beta = float(np.clip(1.0 - iteration / self.cfg.beta_decay_iters, 0.0, 1.0))
        obs_seq, h0, starts, expert_seq, env_metrics = self.collector.collect_dagger(
            params, self.cfg.rollout_len, beta, self._rng
        )
        fresh = (obs_seq, h0, starts, expert_seq)
        if self.cfg.aggregate_size > 0:
            self._buffer.append(jax.device_get(fresh))
            if len(self._buffer) > self.cfg.aggregate_size:
                self._buffer.pop(0)

        loss = acc = jnp.float32(0)
        with self.collector.timer.stage("update"):
            for _ in range(max(self.cfg.epochs, 1)):
                sample = fresh if not self._buffer else \
                    self._buffer[self._rng.randint(len(self._buffer))]
                params, opt_state, loss, acc = self._sup_step(
                    params, opt_state, *self._shard(sample)
                )
            loss, acc = float(loss), float(acc)  # block inside the timed stage
        metrics = dict(env_metrics)
        metrics.update(loss=loss, expert_match=acc, beta=beta)
        steps = float(self.cfg.rollout_len * self.venv.n)
        metrics["env_steps"] = steps
        # True elapsed wall time (not the stage-sum): collection, expert
        # queries, and the update all count toward env-steps/s.
        metrics.update(self.collector.timer.summary())
        wall = time.perf_counter() - t_start
        metrics["env_steps_per_s"] = steps / max(wall, 1e-9)
        self.collector.timer.reset()
        return params, opt_state, metrics
