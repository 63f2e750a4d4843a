"""RL core: gridworld env semantics, GAE correctness, and DD-PPO learning on the
hermetic fake env (SURVEY.md §4: a small solvable task as the PPO regression gate)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embodied_clip_tpu.envs.gridworld import (
    END, MOVE_AHEAD, ROTATE_LEFT, GridNavEnv,
)
from embodied_clip_tpu.models.policy import ActorCritic
from embodied_clip_tpu.training.ddppo import DDPPOConfig, DDPPOLearner
from embodied_clip_tpu.training.ppo import PPOConfig, compute_gae


def test_gridworld_reset_and_obs():
    env = GridNavEnv(size=6)
    state, obs = env.reset(jax.random.PRNGKey(0), 4)
    assert obs["visual"].shape == (4, 7, 7, env.obs_channels)
    assert obs["goal"].shape == (4,)
    # goal class equals the class of the target object
    tgt_cls = np.take_along_axis(
        np.asarray(state.object_cls), np.asarray(state.target_idx)[:, None], 1
    )[:, 0]
    np.testing.assert_array_equal(np.asarray(obs["goal"]), tgt_cls)


def test_gridworld_success_and_autoreset():
    env = GridNavEnv(size=6, success_dist=1)
    state, _ = env.reset(jax.random.PRNGKey(1), 8)
    # Teleport agents onto their targets, then End.
    tgt = jnp.take_along_axis(state.object_pos, state.target_idx[:, None, None], 1)[:, 0]
    state = state.replace(agent_pos=tgt)
    step = jax.jit(env.step)
    new_state, obs, reward, done, info = step(state, jnp.full((8,), END, jnp.int32))
    assert bool(done.all())
    np.testing.assert_allclose(np.asarray(info["success"]), 1.0)
    assert float(reward.min()) > 5.0
    # auto-reset: fresh episodes have t == 0
    np.testing.assert_array_equal(np.asarray(new_state.t), 0)
    assert np.asarray(info["spl"]).min() > 0.0


def test_gridworld_shaping_sign():
    env = GridNavEnv(size=8)
    state, _ = env.reset(jax.random.PRNGKey(2), 16)
    # Rotating never changes distance → reward is exactly the step penalty.
    _, _, reward, done, _ = jax.jit(env.step)(
        state, jnp.full((16,), ROTATE_LEFT, jnp.int32)
    )
    r = np.asarray(reward)[~np.asarray(done)]
    np.testing.assert_allclose(r, env.step_penalty, atol=1e-6)


def test_gae_matches_manual():
    # T=3, B=1; done at t=1 stops bootstrapping.
    rewards = jnp.array([[1.0], [1.0], [1.0]])
    values = jnp.array([[0.5], [0.6], [0.7]])
    dones = jnp.array([[False], [True], [False]])
    last_value = jnp.array([0.8])
    gamma, lam = 0.9, 0.8
    adv, ret = compute_gae(rewards, values, dones, last_value, gamma, lam)
    d2 = 1.0 + gamma * 0.8 - 0.7
    a2 = d2
    d1 = 1.0 + 0.0 - 0.6           # done: no bootstrap
    a1 = d1
    d0 = 1.0 + gamma * 0.6 - 0.5
    a0 = d0 + gamma * lam * a1
    np.testing.assert_allclose(np.asarray(adv)[:, 0], [a0, a1, a2], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ret), np.asarray(adv + values), rtol=1e-5)


@pytest.mark.slow
def test_ddppo_learns_gridworld():
    # flat_obs + Dense-front policy: XLA:CPU conv backward is orders-of-magnitude
    # slower than TPU's; the conv-compressor path is covered by the compile test below.
    env = GridNavEnv(size=5, max_steps=24, flat_obs=True)
    policy = ActorCritic(
        num_actions=env.num_actions, goal_kind="object_embed",
        num_goal_classes=env.num_classes, hidden=64, visual_is_map=False,
    )
    learner = DDPPOLearner(env, policy, DDPPOConfig(
        rollout_len=32, env_batch=16,
        ppo=PPOConfig(lr=3e-3, epochs=4, entropy_coef=0.01),
    ))
    params, opt_state, act = learner.init(jax.random.PRNGKey(0))
    first = None
    hist = []
    for it in range(80):
        params, opt_state, act, m = learner.train_iteration(params, opt_state, act)
        if it == 4:
            first = float(m["success"])
        hist.append(float(m["success"]))
    # Success oscillates once learned (recurrent PPO on a tiny task is chaotic —
    # any 1-ulp numerics change shifts the trajectory), so gate on the best
    # late-training window rather than the single final iteration.
    late = max(hist[40:])
    assert late > 0.45, (first, late, hist[::10])
    assert late > (first or 0.0)


def test_ddppo_conv_policy_step_runs():
    """The conv-compressor policy (the TPU configuration) compiles and trains a step."""
    env = GridNavEnv(size=5, max_steps=16)
    policy = ActorCritic(
        num_actions=env.num_actions, goal_kind="object_embed",
        num_goal_classes=env.num_classes, hidden=32,
    )
    learner = DDPPOLearner(env, policy, DDPPOConfig(
        rollout_len=4, env_batch=4, ppo=PPOConfig(epochs=1),
    ))
    params, opt_state, act = learner.init(jax.random.PRNGKey(0))
    params, opt_state, act, m = learner.train_iteration(params, opt_state, act)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_pointnav_fake_env_and_policy():
    env = GridNavEnv(size=6, max_steps=24, flat_obs=True, task="pointnav")
    _, obs = env.reset(jax.random.PRNGKey(0), 4)
    assert obs["goal"].shape == (4, 2)
    policy = ActorCritic(num_actions=env.num_actions, goal_kind="pointgoal",
                         goal_input_dim=2, hidden=64, visual_is_map=False)
    learner = DDPPOLearner(env, policy, DDPPOConfig(
        rollout_len=32, env_batch=16, ppo=PPOConfig(lr=3e-3, epochs=4)))
    params, opt, act = learner.init(jax.random.PRNGKey(0))
    m = {}
    for _ in range(50):
        params, opt, act, m = learner.train_iteration(params, opt, act)
    assert float(m["success"]) > 0.4, float(m["success"])


@pytest.mark.slow
def test_frame_obs_encoder_in_rollout():
    """Frames-mode env + in-graph encode_fn: the frozen-encoder-in-the-rollout path
    runs fully on device (a tiny stand-in encoder keeps the CPU test fast)."""
    env = GridNavEnv(size=5, max_steps=16, frame_obs=True, frame_cell_px=4)
    _, obs = env.reset(jax.random.PRNGKey(0), 2)
    assert obs["visual"].dtype == jnp.uint8
    assert obs["visual"].shape == (2, 28, 28, 3)

    def encode(frames_u8):
        x = frames_u8.astype(jnp.float32) / 255.0
        return x[:, ::4, ::4, :].reshape(x.shape[0], -1)

    policy = ActorCritic(num_actions=env.num_actions, goal_kind="object_embed",
                         num_goal_classes=env.num_classes, hidden=32,
                         visual_is_map=False)
    learner = DDPPOLearner(env, policy, DDPPOConfig(
        rollout_len=4, env_batch=2, ppo=PPOConfig(epochs=1)), encode_fn=encode)
    params, opt, act = learner.init(jax.random.PRNGKey(0))
    params, opt, act, m = learner.train_iteration(params, opt, act)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_training_determinism_same_seed():
    """Framework determinism (reference seed_everything contract): identical seeds
    produce bitwise-identical training trajectories on CPU."""
    def run():
        env = GridNavEnv(size=5, max_steps=16, flat_obs=True)
        policy = ActorCritic(num_actions=env.num_actions, goal_kind="object_embed",
                             num_goal_classes=env.num_classes, hidden=32,
                             visual_is_map=False)
        learner = DDPPOLearner(env, policy, DDPPOConfig(
            rollout_len=8, env_batch=8,
            ppo=PPOConfig(lr=1e-3, epochs=1, lr_decay_updates=100)))
        params, opt, act = learner.init(jax.random.PRNGKey(42))
        losses = []
        for _ in range(5):
            params, opt, act, m = learner.train_iteration(params, opt, act)
            losses.append(float(m["loss"]))
        return losses

    a, b = run(), run()
    np.testing.assert_array_equal(a, b)


def test_unroll_matches_per_step_policy():
    """unroll_policy (batched features/heads + GRU-only scan) must match the
    per-step __call__ path used during rollout collection — the recurrent-PPO
    correctness contract (importance ratios at epoch 0 depend on it)."""
    import numpy as np

    from embodied_clip_tpu.models.policy import unroll_policy

    T, B = 5, 4
    pol = ActorCritic(num_actions=4, goal_kind="object_embed", num_goal_classes=6,
                      hidden=32, visual_is_map=True)
    rng = np.random.RandomState(0)
    obs1 = {"visual": jnp.asarray(rng.randn(B, 7, 7, 16), jnp.float32),
            "goal": jnp.asarray(rng.randint(0, 6, (B,))),
            "prev_action": jnp.asarray(rng.randint(0, 5, (B,)))}
    params = pol.init(jax.random.PRNGKey(0), obs1, pol.initial_state(B))["params"]

    obs_seq = {"visual": jnp.asarray(rng.randn(T, B, 7, 7, 16), jnp.float32),
               "goal": jnp.asarray(rng.randint(0, 6, (T, B))),
               "prev_action": jnp.asarray(rng.randint(0, 5, (T, B)))}
    done = jnp.asarray(rng.rand(T, B) < 0.3)
    h0 = pol.initial_state(B)

    logits, values, hT = unroll_policy(pol.apply, params, obs_seq, h0, done)

    h = h0
    ref_logits, ref_values = [], []
    for t in range(T):
        o = {k: v[t] for k, v in obs_seq.items()}
        lg, vv, h = pol.apply({"params": params}, o, h, done[t])
        ref_logits.append(lg)
        ref_values.append(vv)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(jnp.stack(ref_logits)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(values), np.asarray(jnp.stack(ref_values)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(hT), np.asarray(h), rtol=1e-5, atol=1e-5)
