"""On-device rollout collection for jittable envs.

The reference's rollout storage lives in torch on GPU fed by CPU env workers
(allenact/habitat vectorized samplers, SURVEY.md §3.5). For pure-JAX envs
(envs/gridworld.py) the entire T-step rollout is a single `lax.scan` on device:
policy step → env step → auto-reset, no host round-trips. External simulators
(THOR/Habitat) use envs/vector.py + training/host_rollout.py instead; both paths
produce the same `Rollout` pytree for the PPO learner.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from embodied_clip_tpu.training.ppo import Rollout

__all__ = ["collect_rollout", "ActState"]


from typing import NamedTuple


class ActState(NamedTuple):
    """Carry between rollouts: env state, last obs, policy hidden, prev action,
    whether next step begins an episode, PRNG key."""

    env_state: object
    obs: Dict[str, jnp.ndarray]
    h: jnp.ndarray
    prev_action: jnp.ndarray
    is_start: jnp.ndarray
    key: jnp.ndarray


def init_act_state(env, apply_fn, params, key, batch: int, hidden: int) -> ActState:
    kr, kk = jax.random.split(key)
    env_state, obs = env.reset(kr, batch)
    return ActState(
        env_state=env_state,
        obs=obs,
        h=jnp.zeros((batch, hidden), jnp.float32),
        prev_action=jnp.full((batch,), env.num_actions, jnp.int32),  # "no prev action"
        is_start=jnp.ones((batch,), bool),
        key=kk,
    )


def collect_rollout(env, apply_fn, params, act: ActState, num_steps: int,
                    encode_fn: Optional[Callable] = None,
                    ) -> Tuple[Rollout, jnp.ndarray, ActState, Dict[str, jnp.ndarray]]:
    """Collect a (T=num_steps, B) rollout with the current policy.

    encode_fn optionally maps raw observations → policy visual features (the frozen
    CLIP preprocessor when the env emits uint8 frames). Returns
    (rollout, last_value (B,), new act state, aggregated episode metrics).
    """

    def policy_obs(obs, prev_action):
        o = dict(obs)
        if encode_fn is not None:
            o["visual"] = encode_fn(o["visual"])
        o["prev_action"] = prev_action
        return o

    def step(carry: ActState, _):
        obs_in = policy_obs(carry.obs, carry.prev_action)
        logits, value, h = apply_fn({"params": params}, obs_in, carry.h, carry.is_start)
        key, k_act = jax.random.split(carry.key)
        action = jax.random.categorical(k_act, logits, axis=-1).astype(jnp.int32)
        logp = jnp.take_along_axis(
            jax.nn.log_softmax(logits, -1), action[:, None], axis=1
        )[:, 0]
        env_state, obs, reward, done, info = env.step(carry.env_state, action)
        prev_action = jnp.where(done, jnp.int32(env.num_actions), action)
        out = (obs_in, carry.is_start, action, logp, value, reward, done, info)
        new_carry = ActState(env_state, obs, h, prev_action, done, key)
        return new_carry, out

    new_act, (obs_seq, starts, actions, logps, values, rewards, dones, infos) = (
        jax.lax.scan(step, act, None, length=num_steps)
    )

    # Bootstrap value for the state after the last step.
    obs_in = policy_obs(new_act.obs, new_act.prev_action)
    _, last_value, _ = apply_fn({"params": params}, obs_in, new_act.h, new_act.is_start)

    rollout = Rollout(
        obs=obs_seq, is_start=starts, actions=actions, log_probs=logps,
        values=values, rewards=rewards, dones=dones, h0=act.h,
    )
    # Episode metrics aggregated over finished episodes in this window.
    n_done = jnp.maximum(infos["done"].sum(), 1.0)
    metrics = {
        "episodes": infos["done"].sum(),
        "success": (infos["success"] * infos["done"]).sum() / n_done,
        "spl": (infos["spl"] * infos["done"]).sum() / n_done,
        "episode_len": (infos["episode_len"] * infos["done"]).sum() / n_done,
        "reward_per_step": rewards.mean(),
    }
    return rollout, last_value, new_act, metrics
