"""PPO: generalized advantage estimation + clipped surrogate/value losses.

The reference trains its navigation policies with DD-PPO (decentralized distributed
PPO; configs named ddppo_* in baselines_habitat.md:63-75 and
baselines_robothor_objectnav.md:48-51). This module is the algorithmic core shared by
the single-chip and DD-PPO learners: pure functions over (T, B, ...) rollout arrays.

Conventions:
  done[t]      episode ended after step t (stops GAE bootstrap across the boundary)
  is_start[t]  episode begins at step t (recurrent hidden state reset in the unroll)
Losses recompute logits/values by re-unrolling the GRU over the stored sequence with
current params (the recurrent-PPO recipe), sharing unroll_policy with rollout
collection.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from embodied_clip_tpu.models.policy import unroll_policy

__all__ = ["PPOConfig", "Rollout", "compute_gae", "ppo_loss"]


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    gamma: float = 0.99
    gae_lambda: float = 0.95
    clip_eps: float = 0.2
    value_clip: float = 0.2          # clipped value loss (habitat-style); <=0 disables
    value_coef: float = 0.5
    entropy_coef: float = 0.01
    epochs: int = 4                   # PPO update repeats per rollout
    normalize_advantages: bool = True
    max_grad_norm: float = 0.5
    lr: float = 3e-4
    # Linear LR decay to 0 over this many optimizer updates (0 = constant LR) — the
    # standard DD-PPO schedule for multi-hundred-million-step runs.
    lr_decay_updates: int = 0


class Rollout(NamedTuple):
    """Time-major rollout storage: leaves shaped (T, B, ...)."""

    obs: Dict[str, jnp.ndarray]
    is_start: jnp.ndarray     # (T, B) bool
    actions: jnp.ndarray      # (T, B) int32
    log_probs: jnp.ndarray    # (T, B) behavior log-probs
    values: jnp.ndarray       # (T, B) behavior values
    rewards: jnp.ndarray      # (T, B)
    dones: jnp.ndarray        # (T, B) bool
    h0: jnp.ndarray           # (B, H) hidden state entering step 0
    # (T, B) bool, or None. False marks straggler-cutoff steps (the transition was
    # fabricated: repeated obs, reward 0, done False — envs/vector.py). DD-PPO drops
    # laggard contributions; these steps are excluded from GAE and the loss.
    valid: Optional[jnp.ndarray] = None


def compute_gae(rewards, values, dones, last_value, gamma: float, lam: float,
                valid=None):
    """GAE(γ,λ) over time-major arrays; returns (advantages, returns).

    valid (T, B) bool or None: False marks straggler-cutoff steps whose transition
    was fabricated. Those steps contribute no delta — the accumulated advantage
    passes through them unchanged (DD-PPO's truncate-the-laggard semantics: the
    fabricated step simply doesn't exist in the laggard's trajectory) — UNLESS
    the fabricated step also marks an episode boundary (done=True, the
    respawn/drained-done contract in envs/vector.py): the fresh episode's
    carry must not leak backwards across it."""
    not_done = 1.0 - dones.astype(jnp.float32)
    next_values = jnp.concatenate([values[1:], last_value[None]], axis=0)
    w = (jnp.ones_like(rewards) if valid is None else valid.astype(jnp.float32))

    def back(carry, inp):
        r, v, nv, nd, wt = inp
        delta = r + gamma * nv * nd - v
        adv = wt * (delta + gamma * lam * nd * carry) + (1.0 - wt) * nd * carry
        return adv, adv

    _, advs = jax.lax.scan(
        back, jnp.zeros_like(last_value),
        (rewards, values, next_values, not_done, w),
        reverse=True,
    )
    return advs, advs + values


def ppo_loss(params, apply_fn, rollout: Rollout, advantages, returns, cfg: PPOConfig):
    """Clipped-surrogate PPO loss over a full (possibly minibatched along B) rollout.
    Returns (loss, metrics dict)."""
    logits, values, _ = unroll_policy(
        apply_fn, params, rollout.obs, rollout.h0, rollout.is_start
    )
    logp_all = jax.nn.log_softmax(logits, axis=-1)
    logp = jnp.take_along_axis(logp_all, rollout.actions[..., None], axis=-1)[..., 0]
    entropy = -jnp.sum(jnp.exp(logp_all) * logp_all, axis=-1)

    # Straggler-cutoff mask: fabricated steps contribute zero loss (and zero grad).
    if rollout.valid is not None:
        w = rollout.valid.astype(jnp.float32)
        denom = jnp.maximum(w.sum(), 1.0)
        wmean = lambda x: (x * w).sum() / denom  # noqa: E731
    else:
        w = jnp.ones_like(logp)
        denom = jnp.asarray(logp.size, jnp.float32)
        wmean = jnp.mean

    if cfg.normalize_advantages:
        mean = (advantages * w).sum() / denom
        var = (((advantages - mean) ** 2) * w).sum() / denom
        advantages = (advantages - mean) / (jnp.sqrt(var) + 1e-5)

    ratio = jnp.exp(logp - rollout.log_probs)
    surr1 = ratio * advantages
    surr2 = jnp.clip(ratio, 1.0 - cfg.clip_eps, 1.0 + cfg.clip_eps) * advantages
    policy_loss = -wmean(jnp.minimum(surr1, surr2))

    if cfg.value_clip > 0:
        v_clipped = rollout.values + jnp.clip(
            values - rollout.values, -cfg.value_clip, cfg.value_clip
        )
        v_loss = jnp.maximum((values - returns) ** 2, (v_clipped - returns) ** 2)
    else:
        v_loss = (values - returns) ** 2
    value_loss = 0.5 * wmean(v_loss)

    entropy_bonus = wmean(entropy)
    loss = policy_loss + cfg.value_coef * value_loss - cfg.entropy_coef * entropy_bonus
    metrics = {
        "loss": loss,
        "policy_loss": policy_loss,
        "value_loss": value_loss,
        "entropy": entropy_bonus,
        "approx_kl": wmean(rollout.log_probs - logp),
        "clip_frac": wmean((jnp.abs(ratio - 1.0) > cfg.clip_eps).astype(jnp.float32)),
    }
    return loss, metrics
