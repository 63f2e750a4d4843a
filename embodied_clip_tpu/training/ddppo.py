"""DD-PPO learner: rollout + GAE + PPO epochs as ONE jitted SPMD step.

The reference's DD-PPO (habitat-lab/allenact forks; torch.distributed.launch with
NCCL allreduce per update, baselines_habitat.md:63-69) maps to TPU as: env batch and
rollout sharded over the mesh 'dp' axis, params/optimizer replicated, gradient psum
inserted by XLA over ICI. One `train_iteration` call = T env steps + K PPO epochs on
device; the host only orchestrates and logs.

Straggler semantics: with on-device jittable envs the SPMD step is lockstep — DD-PPO's
preemption/straggler cutoff exists for slow CPU simulators and lives in the host-env
path (training/host_rollout.py, `straggler_cutoff`), mirroring the algorithm's
signature knob.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from embodied_clip_tpu.models.policy import ActorCritic
from embodied_clip_tpu.training.ppo import PPOConfig, Rollout, compute_gae, ppo_loss
from embodied_clip_tpu.training.rollout import ActState, collect_rollout, init_act_state

__all__ = ["DDPPOConfig", "DDPPOLearner"]


@dataclasses.dataclass(frozen=True)
class DDPPOConfig:
    rollout_len: int = 64
    env_batch: int = 32              # global env count (sharded over dp)
    num_minibatches: int = 1         # contiguous env-slices; 1 == full batch
    ppo: PPOConfig = dataclasses.field(default_factory=PPOConfig)


def iter_minibatches(m: int, rollout: Rollout, advantages, returns):
    """Split a (T, B) rollout into m contiguous env-slice minibatches (habitat
    DD-PPO's recurrent generator shape: whole sequences, sliced over envs).

    When B % m != 0 the remainder spreads over the first minibatches (sizes
    differ by at most 1) so every env contributes a gradient — silently
    dropping the tail would starve arbitrary worker counts on the host path.
    At most 2 distinct minibatch shapes reach the jitted loss."""
    if m <= 1:
        yield rollout, advantages, returns
        return
    b = rollout.actions.shape[1]
    size, rem = divmod(b, m)
    start = 0
    for i in range(m):
        s = size + (1 if i < rem else 0)
        if s == 0:
            continue
        sl = slice(start, start + s)
        start += s
        mb = Rollout(
            obs=jax.tree.map(lambda x: x[:, sl], rollout.obs),
            is_start=rollout.is_start[:, sl],
            actions=rollout.actions[:, sl],
            log_probs=rollout.log_probs[:, sl],
            values=rollout.values[:, sl],
            rewards=rollout.rewards[:, sl],
            dones=rollout.dones[:, sl],
            h0=rollout.h0[sl],
            valid=None if rollout.valid is None else rollout.valid[:, sl],
        )
        yield mb, advantages[:, sl], returns[:, sl]


class DDPPOLearner:
    """Owns the jitted train step; state (params/opt/env) lives in caller-visible
    pytrees so checkpoint/resume is trivial."""

    def __init__(self, env, policy: ActorCritic, cfg: DDPPOConfig,
                 encode_fn: Optional[Callable] = None, mesh=None):
        self.env = env
        self.policy = policy
        self.cfg = cfg
        self.encode_fn = encode_fn
        self.mesh = mesh
        if cfg.ppo.lr_decay_updates > 0:
            lr = optax.linear_schedule(cfg.ppo.lr, 0.0, cfg.ppo.lr_decay_updates)
        else:
            lr = cfg.ppo.lr
        self.tx = optax.chain(
            optax.clip_by_global_norm(cfg.ppo.max_grad_norm),
            optax.adam(lr),
        )
        self._train_iteration = jax.jit(self._train_iteration_impl, donate_argnums=(0, 1, 2))

    # ------------------------------------------------------------------------ init

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

    # ------------------------------------------------------------------ train step

    def _minibatches(self, rollout: Rollout, advantages, returns):
        return iter_minibatches(self.cfg.num_minibatches, rollout, advantages,
                                returns)

    def _train_iteration_impl(self, params, opt_state, act: ActState):
        cfg = self.cfg
        rollout, last_value, act, env_metrics = collect_rollout(
            self.env, self.policy.apply, params, act, cfg.rollout_len, self.encode_fn
        )
        advantages, returns = compute_gae(
            rollout.rewards, rollout.values, rollout.dones, last_value,
            cfg.ppo.gamma, cfg.ppo.gae_lambda, valid=rollout.valid,
        )

        loss_metrics = None
        for _ in range(cfg.ppo.epochs):
            for mb, adv, ret in self._minibatches(rollout, advantages, returns):
                (loss, loss_metrics), grads = jax.value_and_grad(
                    ppo_loss, has_aux=True
                )(params, self.policy.apply, mb, adv, ret, cfg.ppo)
                updates, opt_state = self.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)

        metrics = {**env_metrics, **{k: v for k, v in loss_metrics.items()}}
        metrics["env_steps"] = jnp.asarray(
            cfg.rollout_len * cfg.env_batch, jnp.float32
        )
        return params, opt_state, act, metrics

    def train_iteration(self, params, opt_state, act: ActState):
        """One DD-PPO iteration (T sharded env steps + K PPO epochs), fully on device."""
        return self._train_iteration(params, opt_state, act)
