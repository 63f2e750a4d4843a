"""DD-PPO learner for host-env backends (THOR / Habitat / any VectorEnv).

Composition: HostRolloutCollector gathers (T, B) rollouts from the CPU worker pool
(frozen-CLIP encode runs inside the jitted act step), then a single jitted update —
GAE + K PPO epochs — runs on device. This is the reference's deployment shape
(simulators on CPU hosts, learner on accelerator; SURVEY.md §3.5) with the NCCL
allreduce replaced by mesh sharding: shard the rollout batch over 'dp' and XLA emits
the gradient psum.

Straggler tolerance comes from VectorEnv's cutoff_fraction (DD-PPO's signature knob).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import optax

from embodied_clip_tpu.training.ddppo import DDPPOConfig, iter_minibatches
from embodied_clip_tpu.training.host_rollout import HostRolloutCollector
from embodied_clip_tpu.training.ppo import Rollout, compute_gae, ppo_loss

__all__ = ["HostPPOLearner"]


def _mesh_mod():
    from embodied_clip_tpu.parallel import mesh as mesh_mod

    return mesh_mod


class HostPPOLearner:
    def __init__(self, venv, policy, cfg: DDPPOConfig,
                 encode_fn: Optional[Callable] = None,
                 goal_map_fn: Optional[Callable] = None, mesh=None,
                 env_id_offset: int = 0):
        """`venv` may be a single VectorEnv or a list of pools; with several, the
        collector double-buffers — device act steps for one group overlap the
        other groups' simulator steps (BASELINE.md pipeline north star).

        Multi-process DD-PPO (the reference's N-learner-processes deployment,
        baselines_habitat.md:63-69): pass the GLOBAL mesh (spanning all
        processes' devices) plus this process's env_id_offset. Each process
        collects rollouts from its own pool; host-local rollouts are converted
        to one global dp-sharded batch and the single jitted update runs SPMD
        across all processes — XLA's gradient psum rides ICI/DCN."""
        self.policy = policy
        self.cfg = cfg
        self.mesh = mesh
        self.multiprocess = mesh is not None and _mesh_mod().is_multiprocess(mesh)
        self.collector = HostRolloutCollector(venv, policy, encode_fn, goal_map_fn,
                                              env_id_offset=env_id_offset)
        self.venv = self.collector.venv
        self.num_envs = self.collector.num_envs
        if cfg.ppo.lr_decay_updates > 0:
            lr = optax.linear_schedule(cfg.ppo.lr, 0.0, cfg.ppo.lr_decay_updates)
        else:
            lr = cfg.ppo.lr
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.ppo.max_grad_norm),
            optax.adam(lr),
        )
        self._update = jax.jit(self._update_impl, donate_argnums=(0, 1))

    def init(self, key) -> Tuple[dict, optax.OptState]:
        import jax.numpy as jnp

        self.collector.reset(key)
        obs0 = self.collector._policy_obs(
            self.collector._obs, self.collector._prev_action
        )
        n = self.num_envs
        params = self.policy.init(
            key, obs0, self.policy.initial_state(n), jnp.zeros((n,), bool)
        )["params"]
        opt_state = self.tx.init(params)
        if self.mesh is not None:
            from embodied_clip_tpu.parallel.mesh import replicate

            params = replicate(params, self.mesh)
            opt_state = replicate(opt_state, self.mesh)
        return params, opt_state

    def _update_impl(self, params, opt_state, rollout: Rollout, last_value):
        cfg = self.cfg.ppo
        advantages, returns = compute_gae(
            rollout.rewards, rollout.values, rollout.dones, last_value,
            cfg.gamma, cfg.gae_lambda, valid=rollout.valid,
        )
        metrics = None
        for _ in range(cfg.epochs):
            for mb, adv, ret in iter_minibatches(
                    self.cfg.num_minibatches, rollout, advantages, returns):
                (loss, metrics), grads = jax.value_and_grad(ppo_loss, has_aux=True)(
                    params, self.policy.apply, mb, adv, ret, cfg
                )
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    def train_iteration(self, params, opt_state) -> Tuple[dict, optax.OptState, Dict]:
        import time

        timer = self.collector.timer
        t_start = time.perf_counter()
        # The act step is process-local (this process's envs on this process's
        # device); with a multi-process mesh the globally-replicated params are
        # consumed through their local shard — zero-copy.
        act_params = (_mesh_mod().local_view(params) if self.multiprocess
                      else params)
        rollout, last_value, env_metrics = self.collector.collect(
            act_params, self.cfg.rollout_len
        )
        if self.mesh is not None:
            from embodied_clip_tpu.parallel.mesh import shard_time_major

            rollout = shard_time_major(rollout, self.mesh, batch=self.num_envs)
            last_value = shard_time_major(last_value, self.mesh, batch=self.num_envs)
        with timer.stage("update"):
            params, opt_state, loss_metrics = self._update(
                params, opt_state, rollout, last_value
            )
            hs = _mesh_mod().host_scalar
            loss_metrics = {k: hs(v) for k, v in loss_metrics.items()}  # block
        metrics = dict(env_metrics)
        metrics.update(loss_metrics)
        # env_steps counts GLOBAL progress (all processes' envs advance together).
        world = jax.process_count() if self.multiprocess else 1
        steps = float(self.cfg.rollout_len * self.num_envs * world)
        metrics["env_steps"] = steps
        # Per-stage timing as first-class trainer metrics (SURVEY.md §5):
        # act/env_step/update seconds + fractions, and end-to-end env-steps/s.
        # True elapsed wall time, not the stage-sum: with pipelined env groups
        # the act and env_step stages overlap in wall time.
        summ = timer.summary()
        metrics.update(summ)
        wall = time.perf_counter() - t_start
        metrics["env_steps_per_s"] = steps / max(wall, 1e-9)
        timer.reset()
        return params, opt_state, metrics
