"""1-phase rearrangement fake env: expert solves it; DAgger imitates it
(the iTHOR Rearrangement suite's hermetic analogue, baselines_ithor_rearrangement.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embodied_clip_tpu.envs.rearrange import DROP, PICKUP, GridRearrangeEnv
from embodied_clip_tpu.models.policy import ActorCritic
from embodied_clip_tpu.training.dagger import DAggerConfig, DAggerLearner


def test_rearrange_expert_solves():
    env = GridRearrangeEnv(size=6, max_steps=96)
    state, _ = env.reset(jax.random.PRNGKey(0), 16)

    @jax.jit
    def run(state):
        def step(st, _):
            a = env.expert_action(st)
            st, _, _, done, info = env.step(st, a)
            return st, (done, info["success"])
        return jax.lax.scan(step, state, None, length=96)

    _, (done, success) = run(state)
    done, success = np.asarray(done), np.asarray(success)
    assert done.any(axis=0).all()
    np.testing.assert_allclose(success[done.astype(bool)], 1.0)


def test_rearrange_pickup_drop_semantics():
    env = GridRearrangeEnv(size=6, success_dist=1)
    state, obs = env.reset(jax.random.PRNGKey(1), 4)
    # teleport agents onto the object, pick up
    state = state.replace(agent_pos=state.obj_pos)
    state, obs, r, done, info = jax.jit(env.step)(
        state, jnp.full((4,), PICKUP, jnp.int32))
    assert bool(state.holding.all())
    assert float(r.min()) > 1.0  # pickup reward
    # holding flag visible in the observation (channel 3)
    vis = np.asarray(obs["visual"])
    assert (vis[..., 3] == 1.0).all()
    # teleport to goal, drop → success + auto-reset
    state = state.replace(agent_pos=state.goal_pos)
    state, _, r, done, info = jax.jit(env.step)(
        state, jnp.full((4,), DROP, jnp.int32))
    assert bool(done.all())
    np.testing.assert_allclose(np.asarray(info["success"]), 1.0)
    assert not bool(state.holding.any())  # fresh episodes


@pytest.mark.slow
def test_rearrange_dagger_learns():
    env = GridRearrangeEnv(size=5, max_steps=48, flat_obs=True)
    policy = ActorCritic(num_actions=env.num_actions, goal_kind="none",
                         hidden=64, visual_is_map=False)
    learner = DAggerLearner(env, policy, DAggerConfig(
        rollout_len=48, env_batch=16, lr=3e-3, epochs=2, beta_decay_iters=30))
    params, opt, act = learner.init(jax.random.PRNGKey(0))
    m = {}
    for it in range(50):
        params, opt, act, m = learner.train_iteration(params, opt, act, it)
    assert float(m["beta"]) == 0.0
    assert float(m["success"]) > 0.3, float(m["success"])
