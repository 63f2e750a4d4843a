"""Host-pool DAgger: expert labels queried from VectorEnv workers, β-mixture
acting, supervised update — the reference's 40-process Rearrangement deployment
shape (baselines_ithor_rearrangement.md:9), exercised on the scripted THOR fixture."""

import numpy as np
import pytest

import jax

from embodied_clip_tpu.envs.thor_rearrange import REARRANGE_ACTIONS, THORRearrangeEnv
from embodied_clip_tpu.envs.vector import VectorEnv
from embodied_clip_tpu.models.policy import ActorCritic
from embodied_clip_tpu.training.dagger import DAggerConfig, HostDAggerLearner
from fake_thor import FakeController


def _env_fn(seed):
    return lambda: THORRearrangeEnv(
        scenes=["FakeScene_1"], controller_factory=FakeController,
        width=64, height=64, num_misplaced=1, num_toggled_open=0,
        max_steps=40, visibility_distance=1.5, seed=seed)


def test_vector_env_expert_actions():
    venv = VectorEnv([_env_fn(i) for i in range(3)], frame_shape=(64, 64, 3))
    try:
        venv.reset()
        experts = venv.expert_actions()
        assert experts.shape == (3,) and experts.dtype == np.int32
        assert all(0 <= a < len(REARRANGE_ACTIONS) for a in experts)
        # queries don't disturb the step cycle
        obs, r, d, infos, valid = venv.step(experts)
        assert obs["visual"].shape == (3, 64, 64, 3)
        assert obs["goal_visual"].shape == (3, 64, 64, 3)
        assert valid.all()
    finally:
        venv.close()


def test_expert_actions_survive_worker_death():
    """expert_actions() rides the same respawn machinery as stepping: a dead
    worker must not crash the DAgger loop with BrokenPipeError or desync the
    pipe protocol — it is respawned and the fresh episode's expert returned."""
    venv = VectorEnv([_env_fn(20 + i) for i in range(3)],
                     frame_shape=(64, 64, 3))
    try:
        venv.reset()
        venv.step(venv.expert_actions())
        venv.procs[1].kill()
        venv.procs[1].join(timeout=5)
        experts = venv.expert_actions()  # must not raise
        assert venv.respawn_count == 1 and venv.procs[1].is_alive()
        assert all(0 <= a < len(REARRANGE_ACTIONS) for a in experts)
        # protocol still aligned: a full step round-trip works afterwards
        obs, _, _, _, _ = venv.step(experts)
        assert obs["visual"].shape == (3, 64, 64, 3)
        experts2 = venv.expert_actions()
        assert experts2.shape == (3,)
    finally:
        venv.close()


@pytest.mark.slow
def test_host_dagger_trains_on_rearrange_pool():
    venv = VectorEnv([_env_fn(10 + i) for i in range(4)], frame_shape=(64, 64, 3))
    try:
        policy = ActorCritic(num_actions=len(REARRANGE_ACTIONS), goal_kind="none",
                             hidden=32, scratch_cnn=True)
        learner = HostDAggerLearner(venv, policy, DAggerConfig(
            rollout_len=8, env_batch=4, lr=1e-3, epochs=1,
            beta_decay_iters=4, aggregate_size=3))
        params, opt = learner.init(jax.random.PRNGKey(0))
        losses = []
        for it in range(3):
            params, opt, m = learner.train_iteration(params, opt, it)
            losses.append(m["loss"])
            assert 0.0 <= m["expert_match"] <= 1.0
            assert np.isfinite(m["loss"])
        assert m["beta"] == pytest.approx(1.0 - 2 / 4)
        assert len(learner._buffer) == 3
        # Stage timing covers the whole iteration (SURVEY.md §5 tracing row):
        # expert queries + env steps and the device act step are both recorded,
        # so env_steps_per_s reflects true wall time, not just the update.
        for k in ("act_s", "env_step_s", "update_s", "env_steps_per_s"):
            assert k in m, sorted(m)
        assert m["act_s"] > 0 and m["env_step_s"] > 0
        assert m["env_steps_per_s"] <= (8 * 4) / max(
            m["act_s"] + m["env_step_s"] + m["update_s"], 1e-9) * 1.01
    finally:
        venv.close()
