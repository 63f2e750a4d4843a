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


@pytest.mark.slow
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


# ---------------------------------------------------------------- 2-phase env


def test_two_phase_walkthrough_then_unshuffle():
    """Phase semantics: walkthrough shows object ON the goal (goal channel
    lit), interactions are inert; Drop ends the phase — the object teleports
    off the goal, the goal channel goes dark, and the phase flag flips."""
    from embodied_clip_tpu.envs.rearrange import GridTwoPhaseRearrangeEnv

    env = GridTwoPhaseRearrangeEnv(size=6, max_steps=96, walkthrough_budget=24)
    state, obs = env.reset(jax.random.PRNGKey(0), 8)
    assert (np.asarray(state.phase) == 0).all()
    assert (np.asarray(obs["goal"]) == 0).all()
    np.testing.assert_array_equal(np.asarray(state.obj_pos),
                                  np.asarray(state.goal_pos))
    assert np.asarray(obs["visual"])[..., 2].sum() > 0  # goal channel lit

    # Pickup is inert during the walkthrough
    state2, _, r, done, _ = jax.jit(env.step)(
        state.replace(agent_pos=state.obj_pos),
        jnp.full((8,), PICKUP, jnp.int32))
    assert not bool(state2.holding.any())
    assert not bool(done.any())
    np.testing.assert_allclose(np.asarray(r), 0.0)  # walkthrough unrewarded

    # Drop ends the walkthrough
    state3, obs3, _, done, _ = jax.jit(env.step)(
        state2, jnp.full((8,), DROP, jnp.int32))
    assert (np.asarray(state3.phase) == 1).all()
    assert (np.asarray(obs3["goal"]) == 1).all()
    assert not bool(done.any())
    # goal channel is dark in the unshuffle phase
    assert np.asarray(obs3["visual"])[..., 2].sum() == 0.0


def test_two_phase_budget_forces_switch():
    from embodied_clip_tpu.envs.rearrange import (
        MOVE_AHEAD, GridTwoPhaseRearrangeEnv,
    )

    env = GridTwoPhaseRearrangeEnv(size=6, walkthrough_budget=3)
    state, _ = env.reset(jax.random.PRNGKey(2), 4)
    for _ in range(3):
        state, obs, _, _, _ = jax.jit(env.step)(
            state, jnp.full((4,), MOVE_AHEAD, jnp.int32))
    assert (np.asarray(state.phase) == 1).all()


def test_two_phase_expert_solves():
    from embodied_clip_tpu.envs.rearrange import GridTwoPhaseRearrangeEnv

    env = GridTwoPhaseRearrangeEnv(size=6, max_steps=96)
    state, _ = env.reset(jax.random.PRNGKey(3), 16)

    @jax.jit
    def run(state):
        def step(st, _):
            a = env.expert_action(st)
            st, _, _, done, info = env.step(st, a)
            return st, (done, info["success"])
        return jax.lax.scan(step, state, None, length=97)

    _, (done, success) = run(state)
    done, success = np.asarray(done), np.asarray(success)
    assert done.any(axis=0).all()
    np.testing.assert_allclose(success[done.astype(bool)], 1.0)


def test_two_phase_expert_walkthrough_visits_goal():
    """The DAgger demo must GATHER the information the unshuffle labels rely
    on: the walkthrough expert navigates to the goal cell (goal channel lit at
    the view center) before ending the phase — never a step-1 no-op Done."""
    from embodied_clip_tpu.envs.rearrange import DROP, GridTwoPhaseRearrangeEnv

    env = GridTwoPhaseRearrangeEnv(size=8, max_steps=96)
    state, _ = env.reset(jax.random.PRNGKey(7), 32)

    @jax.jit
    def run(state):
        def step(st, _):
            a = env.expert_action(st)
            # distance to goal at the moment the expert ends the walkthrough
            end_d = jnp.where(
                (st.phase == 0) & (a == DROP),
                jnp.abs(st.goal_pos - st.agent_pos).sum(-1), -1)
            st, _, _, _, _ = env.step(st, a)
            return st, end_d
        return jax.lax.scan(step, state, None, length=64)

    _, end_d = run(state)
    end_d = np.asarray(end_d)
    # every env ended its walkthrough via the expert's Drop, adjacent to goal
    ended = end_d >= 0
    assert ended.any(axis=0).all()
    assert (end_d[ended] <= env.success_dist).all(), end_d[ended].max()
