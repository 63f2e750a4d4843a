"""Multi-device SPMD correctness on the virtual 8-device CPU mesh.

The reference's only multi-device training mode is 8-process DD-PPO with NCCL
allreduce (reference readme_files/baselines_habitat.md:63-69). The TPU-native
equivalent is one jitted SPMD step over a ('dp','mp') mesh — these tests pin that
the sharded trajectory matches the single-device one, that XLA's inserted gradient
psum reproduces the full-batch gradient, and that straggler-masked steps contribute
exactly zero gradient (DD-PPO's truncate-the-laggard semantics).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from embodied_clip_tpu.envs.gridworld import GridNavEnv
from embodied_clip_tpu.models.policy import ActorCritic
from embodied_clip_tpu.parallel.mesh import make_mesh, replicate, shard_time_major
from embodied_clip_tpu.training.ddppo import DDPPOConfig, DDPPOLearner
from embodied_clip_tpu.training.ppo import (
    PPOConfig, Rollout, compute_gae, ppo_loss,
)


def _make_learner(mesh, env_batch=16):
    env = GridNavEnv(size=5, max_steps=16)
    policy = ActorCritic(
        num_actions=env.num_actions, goal_kind="object_embed",
        num_goal_classes=env.num_classes, hidden=32,
    )
    return DDPPOLearner(
        env, policy,
        DDPPOConfig(rollout_len=8, env_batch=env_batch, ppo=PPOConfig(epochs=2)),
        mesh=mesh,
    )


def _run(mesh, iters=3):
    learner = _make_learner(mesh)
    params, opt_state, act = learner.init(jax.random.PRNGKey(0))
    losses = []
    for _ in range(iters):
        params, opt_state, act, m = learner.train_iteration(params, opt_state, act)
        losses.append(float(m["loss"]))
    return losses, jax.tree.map(np.asarray, params)


def test_ddppo_mesh_matches_single_device():
    assert jax.device_count() >= 8, "conftest must provide the 8-device CPU mesh"
    losses_1, params_1 = _run(mesh=None)
    losses_8, params_8 = _run(mesh=make_mesh(dp=8))
    np.testing.assert_allclose(losses_1, losses_8, rtol=1e-3, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5),
        params_1, params_8,
    )


def test_ddppo_mesh_params_stay_replicated():
    learner = _make_learner(make_mesh(dp=8))
    params, opt_state, act = learner.train_iteration(
        *learner.init(jax.random.PRNGKey(1))
    )[:3]
    for leaf in jax.tree.leaves(params):
        assert leaf.sharding.is_fully_replicated


# ---------------------------------------------------------------- loss-level SPMD


def _toy_policy_and_rollout(T=6, B=8, with_valid=False):
    policy = ActorCritic(
        num_actions=4, goal_kind="object_embed", num_goal_classes=5, hidden=16,
    )
    ks = jax.random.split(jax.random.PRNGKey(42), 10)
    obs = {
        "visual": jax.random.normal(ks[0], (T, B, 3, 3, 8)),
        "goal": jax.random.randint(ks[1], (T, B), 0, 5),
        "prev_action": jax.random.randint(ks[2], (T, B), 0, 5),
    }
    h0 = jnp.zeros((B, 16))
    params = policy.init(
        ks[3], jax.tree.map(lambda x: x[0], obs), h0, jnp.zeros((B,), bool)
    )["params"]
    valid = None
    if with_valid:
        valid = jax.random.bernoulli(ks[9], 0.7, (T, B))
    rollout = Rollout(
        obs=obs,
        is_start=jnp.zeros((T, B), bool).at[0].set(True),
        actions=jax.random.randint(ks[4], (T, B), 0, 4),
        log_probs=0.1 * jax.random.normal(ks[5], (T, B)),
        values=jax.random.normal(ks[6], (T, B)),
        rewards=jax.random.normal(ks[7], (T, B)),
        dones=jnp.zeros((T, B), bool),
        h0=h0,
        valid=valid,
    )
    last_value = jax.random.normal(ks[8], (B,))
    return policy, params, rollout, last_value


def test_gradient_psum_matches_full_batch():
    policy, params, rollout, last_value = _toy_policy_and_rollout()
    cfg = PPOConfig()
    adv, ret = compute_gae(
        rollout.rewards, rollout.values, rollout.dones, last_value,
        cfg.gamma, cfg.gae_lambda,
    )
    grad_fn = jax.grad(ppo_loss, has_aux=True)
    grads_full, _ = grad_fn(params, policy.apply, rollout, adv, ret, cfg)

    mesh = make_mesh(dp=8)
    B = rollout.actions.shape[1]
    params_r = replicate(params, mesh)
    rollout_s = shard_time_major(rollout, mesh, batch=B)
    adv_s = shard_time_major(adv, mesh, batch=B)
    ret_s = shard_time_major(ret, mesh, batch=B)
    grads_spmd, _ = jax.jit(
        lambda p, r, a, t: grad_fn(p, policy.apply, r, a, t, cfg)
    )(params_r, rollout_s, adv_s, ret_s)

    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        grads_full, grads_spmd,
    )
    for leaf in jax.tree.leaves(grads_spmd):
        assert leaf.sharding.is_fully_replicated


def test_straggler_masked_steps_contribute_zero_gradient():
    """Perturbing the fabricated fields (reward / action / behavior log-prob) of
    valid=False steps must leave loss and gradients bitwise unchanged — the cutoff
    DROPS laggard contributions, it does not fabricate data (VectorEnv repeats the
    obs with reward 0 done False; the mask is what makes that sound)."""
    policy, params, rollout, last_value = _toy_policy_and_rollout(with_valid=True)
    cfg = PPOConfig()
    assert not bool(rollout.valid.all()), "test needs some invalid steps"

    def loss_and_grads(ro):
        adv, ret = compute_gae(
            ro.rewards, ro.values, ro.dones, last_value,
            cfg.gamma, cfg.gae_lambda, valid=ro.valid,
        )
        (loss, _), grads = jax.value_and_grad(ppo_loss, has_aux=True)(
            params, policy.apply, ro, adv, ret, cfg
        )
        return loss, grads

    loss_a, grads_a = loss_and_grads(rollout)
    inv = ~rollout.valid
    perturbed = rollout._replace(
        rewards=jnp.where(inv, rollout.rewards + 100.0, rollout.rewards),
        actions=jnp.where(inv, (rollout.actions + 1) % 4, rollout.actions),
        log_probs=jnp.where(inv, rollout.log_probs - 5.0, rollout.log_probs),
    )
    loss_b, grads_b = loss_and_grads(perturbed)

    assert float(loss_a) == pytest.approx(float(loss_b), abs=0.0)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        grads_a, grads_b,
    )


def test_gae_valid_passthrough():
    """An invalid step's advantage is the pass-through of the next real step's
    accumulated advantage; with no invalid steps the mask is a no-op."""
    T, B = 5, 3
    key = jax.random.PRNGKey(7)
    rewards = jax.random.normal(key, (T, B))
    values = jax.random.normal(jax.random.PRNGKey(8), (T, B))
    dones = jnp.zeros((T, B), bool)
    last_value = jnp.zeros((B,))
    adv_none, _ = compute_gae(rewards, values, dones, last_value, 0.99, 0.95)
    adv_all, _ = compute_gae(
        rewards, values, dones, last_value, 0.99, 0.95,
        valid=jnp.ones((T, B), bool),
    )
    np.testing.assert_array_equal(np.asarray(adv_none), np.asarray(adv_all))

    valid = jnp.ones((T, B), bool).at[2, 0].set(False)
    adv_m, _ = compute_gae(rewards, values, dones, last_value, 0.99, 0.95, valid=valid)
    # Invalid step passes the accumulated advantage through unchanged.
    np.testing.assert_allclose(
        np.asarray(adv_m[2, 0]), np.asarray(adv_m[3, 0]), rtol=1e-6
    )
    # Other envs are untouched.
    np.testing.assert_array_equal(np.asarray(adv_m[:, 1:]), np.asarray(adv_none[:, 1:]))


# ------------------------------------------------------------------ host-PPO mesh


def test_hostppo_mesh_matches_single_device():
    from embodied_clip_tpu.envs.host_gridworld import HostGridNav
    from embodied_clip_tpu.envs.vector import VectorEnv
    from embodied_clip_tpu.training.host_ppo import HostPPOLearner

    def run(mesh):
        venv = VectorEnv(
            [lambda i=i: HostGridNav(size=5, seed=i) for i in range(8)],
        )
        try:
            policy = ActorCritic(
                num_actions=4, goal_kind="object_embed",
                num_goal_classes=12, hidden=32,
                visual_is_map=False, scratch_cnn=False,
            )

            def encode(frames_u8):
                x = frames_u8.astype(jnp.float32) / 255.0
                return x[:, ::8, ::8, :].reshape(x.shape[0], -1)

            learner = HostPPOLearner(
                venv, policy,
                DDPPOConfig(rollout_len=8, env_batch=8, ppo=PPOConfig(epochs=2)),
                encode_fn=encode, mesh=mesh,
            )
            params, opt_state = learner.init(jax.random.PRNGKey(0))
            losses = []
            for _ in range(2):
                params, opt_state, m = learner.train_iteration(params, opt_state)
                losses.append(m["loss"])
            return losses, jax.tree.map(np.asarray, params)
        finally:
            venv.close()

    losses_1, params_1 = run(None)
    losses_8, params_8 = run(make_mesh(dp=8))
    np.testing.assert_allclose(losses_1, losses_8, rtol=1e-3, atol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-5),
        params_1, params_8,
    )
