"""VectorEnv worker pool + shared-memory frame ring + host rollout collection
(the external-simulator path: SURVEY.md §2.4 'vectorized env workers')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embodied_clip_tpu.envs.host_gridworld import HostGridNav
from embodied_clip_tpu.envs.vector import VectorEnv
from embodied_clip_tpu.models.policy import ActorCritic
from embodied_clip_tpu.training.host_rollout import HostRolloutCollector


def _make_venv(n=3, **kw):
    fns = [lambda i=i: HostGridNav(size=5, seed=i) for i in range(n)]
    return VectorEnv(fns, frame_shape=(56, 56, 3), **kw)


def test_host_gridnav_contract():
    env = HostGridNav(size=5, seed=0)
    obs = env.reset()
    assert obs["visual"].shape == (56, 56, 3) and obs["visual"].dtype == np.uint8
    done_seen = False
    for _ in range(200):
        obs, r, done, info = env.step(np.random.randint(0, 4))
        if done:
            done_seen = True
            assert {"success", "spl", "episode_len"} <= set(info)
    assert done_seen


def test_vector_env_steps_and_batches():
    venv = _make_venv(3)
    try:
        obs = venv.reset()
        assert obs["visual"].shape == (3, 56, 56, 3)
        obs, rewards, dones, infos, valid = venv.step(np.array([0, 1, 2]))
        assert obs["visual"].shape == (3, 56, 56, 3)
        assert rewards.shape == (3,) and valid.all()
        # frames differ across workers (different seeds)
        assert not np.array_equal(obs["visual"][0], obs["visual"][1])
    finally:
        venv.close()


def test_vector_env_straggler_cutoff_flags():
    venv = _make_venv(3, cutoff_fraction=0.5, cutoff_timeout_s=5.0)
    try:
        venv.reset()
        # Normal case: all respond quickly; valid should be all True eventually.
        _, _, _, _, valid = venv.step(np.array([1, 1, 1]))
        assert valid.sum() >= 2  # cutoff allows early return with >= ceil(0.5*3)=2
    finally:
        venv.close()


def test_vector_env_worker_death_recovery():
    """Kill a worker mid-rollout: the pool must not hang, must mask that index
    invalid, respawn the worker, and return to all-valid steps (VERDICT r2
    next #8; SURVEY.md §5 elastic-recovery row)."""
    venv = _make_venv(3, cutoff_timeout_s=3.0)
    try:
        venv.reset()
        venv.step(np.array([0, 0, 0]))
        venv.procs[1].kill()
        venv.procs[1].join(timeout=5)
        obs, rewards, dones, infos, valid = venv.step(np.array([1, 1, 1]))
        assert valid[0] and valid[2]
        assert not valid[1]
        assert obs["visual"].shape == (3, 56, 56, 3)  # stale obs repeated
        # next step drains + respawns; the respawned worker's first transition
        # answers a stale-obs action executed in a fresh episode, so it is
        # masked invalid AND flagged done (episode boundary: the collector
        # must reset the GRU carry instead of bleeding state across respawn)
        obs, _, dones, _, valid = venv.step(np.array([2, 2, 2]))
        assert venv.respawn_count == 1
        assert venv.procs[1].is_alive()
        assert valid[0] and valid[2]
        assert not valid[1] and dones[1]
        # from the step after that, the pool is whole again
        _, _, _, _, valid = venv.step(np.array([0, 0, 0]))
        assert valid.all()
    finally:
        venv.close()


def test_drained_straggler_done_masks_next_transition():
    """A straggler whose DELAYED reply crossed an episode boundary (done=True)
    must have its next transition masked invalid + done — the action it
    executes was computed from stale pre-done obs, and the GRU carry must
    reset at the boundary (same contract as a respawn)."""
    import time

    class SlowDoneSecondStep(HostGridNav):
        calls = 0

        def __init__(self, slow, **kw):
            super().__init__(**kw)
            self._slow = slow

        def step(self, a):
            type(self).calls += 1
            obs, r, d, info = super().step(a)
            if self._slow and type(self).calls == 2:
                time.sleep(0.6)
                d = True  # the delayed reply ends the episode
                obs = self.reset()
            return obs, r, d, info

    fns = [lambda i=i: SlowDoneSecondStep(slow=(i == 2), size=5, seed=i)
           for i in range(3)]
    venv = VectorEnv(fns, frame_shape=(56, 56, 3), cutoff_fraction=0.67,
                     cutoff_timeout_s=0.05)
    try:
        venv.reset()
        _, _, d1, _, v1 = venv.step(np.zeros(3, np.int64))
        assert v1.all() and not d1[2]
        # worker 2 sleeps past the cutoff: masked, done suppressed
        _, _, d2, _, v2 = venv.step(np.zeros(3, np.int64))
        assert not v2[2] and not d2[2]
        # drain consumed the done=True reply -> this transition is the
        # boundary mask: invalid AND done, so the collector resets state
        _, _, d3, _, v3 = venv.step(np.zeros(3, np.int64))
        assert not v3[2] and d3[2]
        assert v3[0] and v3[1]
        # back to coherent stepping
        _, _, _, _, v4 = venv.step(np.zeros(3, np.int64))
        assert v4.all()
    finally:
        venv.close()


def test_frame_ring_recovers_from_writer_death_mid_write():
    """A writer killed between the odd and even seq stores leaves the slot's
    seqlock odd; the next writer (a respawned worker) must restore stable
    parity instead of parking the slot on odd forever (reader spin-out)."""
    import mmap
    import struct

    from embodied_clip_tpu.native.frame_ring import FrameRing, frame_ring_available

    if not frame_ring_available():
        pytest.skip("native frame ring not built")
    ring = FrameRing.create(2, (4, 4, 3))
    try:
        f0 = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        ring.write(0, f0)
        np.testing.assert_array_equal(ring.read(0), f0)
        # simulate death mid-write: force slot 0's seq word odd
        with open("/dev/shm" + ring.name, "r+b") as f:
            m = mmap.mmap(f.fileno(), 0)
            seq = struct.unpack_from("<Q", m, 0)[0]
            struct.pack_into("<Q", m, 0, seq | 1)
            m.flush()
            m.close()
        f1 = f0 + 1
        ring.write(0, f1)  # fresh writer inherits the odd seq
        np.testing.assert_array_equal(ring.read(0), f1)  # must not spin out
    finally:
        ring.close()


def test_vector_env_reports_env_construction_failure():
    """A worker whose env constructor raises (e.g. simulator not installed)
    must surface THAT message, not respawn-loop into ConnectionResetError."""
    import pytest

    def bad_env():
        raise ImportError("ai2thor is required for THORRearrangeEnv")

    venv = VectorEnv([bad_env, lambda: HostGridNav(size=5, seed=0)],
                     frame_shape=(56, 56, 3))
    try:
        with pytest.raises(RuntimeError, match="ai2thor is required"):
            venv.reset()
    finally:
        venv.close()


def test_vector_env_reset_survives_death_inside_reset(tmp_path):
    """A worker that accepts the reset command but dies while executing
    env.reset() (simulator crash — the common real death mode) must be
    respawned instead of crashing the pool with EOFError."""
    import os

    flag = tmp_path / "die_once"
    flag.write_text("1")

    class DiesOnFirstReset(HostGridNav):
        def reset(self):
            if flag.exists():
                flag.unlink()
                os._exit(1)  # simulate a segfault mid-reset
            return super().reset()

    fns = [lambda i=i: (DiesOnFirstReset if i == 1 else HostGridNav)(size=5, seed=i)
           for i in range(3)]
    venv = VectorEnv(fns, frame_shape=(56, 56, 3))
    try:
        obs = venv.reset()  # must not raise; worker 1 dies, respawns, resets
        assert obs["visual"].shape == (3, 56, 56, 3)
        assert venv.respawn_count == 1 and venv.procs[1].is_alive()
        _, _, _, _, valid = venv.step(np.zeros(3, np.int64))
        assert valid.all()
    finally:
        venv.close()


def test_vector_env_reset_respawns_idle_dead_worker():
    """A worker that dies AFTER its last successful reply (idle, not a
    straggler) must not crash reset() with BrokenPipeError — reset respawns it
    and returns a full observation batch."""
    venv = _make_venv(3, cutoff_timeout_s=3.0)
    try:
        venv.reset()
        venv.step(np.zeros(3, np.int64))  # all replies consumed; nobody pending
        venv.procs[2].kill()
        venv.procs[2].join(timeout=5)
        obs = venv.reset()  # must not raise
        assert obs["visual"].shape == (3, 56, 56, 3)
        assert venv.respawn_count == 1 and venv.procs[2].is_alive()
        # post-reset transitions are coherent: no respawn-boundary masking
        _, _, _, _, valid = venv.step(np.zeros(3, np.int64))
        assert valid.all()
    finally:
        venv.close()


def test_vector_env_reset_drains_pending_stragglers():
    """A reset() issued right after a cutoff must not misread the straggler's
    stale step reply as the reset observation (VERDICT r2 weak #6)."""
    import time

    class SlowThirdEnv(HostGridNav):
        calls = 0

        def step(self, a):
            type(self).calls += 1
            if type(self).calls % 3 == 0:
                time.sleep(0.4)
            return super().step(a)

    fns = [lambda i=i: (SlowThirdEnv if i == 2 else HostGridNav)(size=5, seed=i)
           for i in range(3)]
    venv = VectorEnv(fns, frame_shape=(56, 56, 3), cutoff_fraction=0.6,
                     cutoff_timeout_s=0.05)
    try:
        venv.reset()
        for _ in range(6):  # provoke cutoffs leaving pending stragglers
            venv.step(np.zeros(3, np.int64))
        obs = venv.reset()
        assert obs["visual"].shape == (3, 56, 56, 3)
        # after reset every worker answers its own reset message: a full-budget
        # step is all-valid and no respawn was needed (worker was alive)
        venv.cutoff_timeout_s = 5.0
        venv.cutoff_fraction = 1.0
        _, _, _, _, valid = venv.step(np.zeros(3, np.int64))
        assert valid.all()
    finally:
        venv.close()


def test_host_rollout_collection():
    venv = _make_venv(2)
    try:
        policy = ActorCritic(num_actions=6, goal_kind="object_embed",
                             num_goal_classes=12, hidden=32, visual_is_map=False)
        # encode: flatten a downsampled frame (cheap stand-in for the CLIP encoder)
        def encode(frames_u8):
            x = frames_u8.astype(jnp.float32) / 255.0
            return x[:, ::8, ::8, :].reshape(x.shape[0], -1)

        collector = HostRolloutCollector(venv, policy, encode_fn=encode)
        collector.reset(jax.random.PRNGKey(0))
        obs0 = collector._policy_obs(collector._obs, collector._prev_action)
        params = policy.init(jax.random.PRNGKey(1), obs0,
                             policy.initial_state(2), jnp.zeros((2,), bool))["params"]
        rollout, last_value, metrics = collector.collect(params, num_steps=12)
        assert rollout.actions.shape == (12, 2)
        assert rollout.obs["visual"].shape[0] == 12
        assert last_value.shape == (2,)
        # PPO machinery consumes host rollouts unchanged
        from embodied_clip_tpu.training.ppo import PPOConfig, compute_gae, ppo_loss

        adv, ret = compute_gae(rollout.rewards, rollout.values, rollout.dones,
                               last_value, 0.99, 0.95)
        loss, m = jax.jit(
            lambda p: ppo_loss(p, policy.apply, rollout, adv, ret, PPOConfig())
        )(params)
        assert np.isfinite(float(loss))
    finally:
        venv.close()


def test_hostgrid_backend_experiment_trains(tmp_path):
    """Full host-backend path: VectorEnv pool -> HostPPOLearner -> checkpoints."""
    from embodied_clip_tpu.config.rl_experiments import NavRLExperiment

    exp = NavRLExperiment(
        name="hostgrid_smoke", backend="hostgrid", encoder=None,
        total_env_steps=64, rollout_len=8, hidden=32, num_workers=2,
        ckpt_every_steps=10 ** 9,
    )
    out = exp.train(output_dir=str(tmp_path))
    assert out["env_steps"] >= 64
    assert np.isfinite(out["loss"])
    import glob
    assert glob.glob(str(tmp_path / "hostgrid_smoke" / "exp__steps_*"))


@pytest.mark.slow
def test_experiment_resume_from_latest(tmp_path):
    """Resume-on-restart: a second train() continues from the saved env-step count."""
    from embodied_clip_tpu.config.rl_experiments import NavRLExperiment

    kw = dict(name="resume_smoke", backend="fake", encoder=None,
              total_env_steps=256, rollout_len=8, env_batch=8, hidden=16,
              ckpt_every_steps=128)
    exp = NavRLExperiment(**kw)
    out1 = exp.train(output_dir=str(tmp_path))
    assert out1["env_steps"] >= 256
    # Second run: already past total_env_steps -> trains 0 new iterations but
    # restores and re-saves cleanly.
    exp2 = NavRLExperiment(**kw)
    out2 = exp2.train(output_dir=str(tmp_path))
    assert out2["env_steps"] >= 256


@pytest.mark.slow
def test_resume_bitwise_matches_uninterrupted(tmp_path):
    """Checkpoints hold the FULL train state — params, optimizer state (Adam
    moments + step count) and the act carry (env state, obs, hidden, PRNG key) —
    so a run killed at a checkpoint and resumed is bitwise identical to an
    uninterrupted one (the reference's restorable …__steps_N.pt contract,
    baselines_robothor_objectnav.md:58-64)."""
    import jax

    from embodied_clip_tpu.config.rl_experiments import NavRLExperiment

    kw = dict(name="resume_bitwise", backend="fake", encoder=None,
              total_env_steps=512, rollout_len=8, env_batch=8, hidden=16,
              ckpt_every_steps=256)
    full = NavRLExperiment(**kw)
    full.train(output_dir=str(tmp_path / "full"))
    p_full = jax.tree.map(np.asarray, full._last_params)

    # "Kill" at 256 steps (train to the halfway checkpoint and stop) …
    half = NavRLExperiment(**{**kw, "total_env_steps": 256})
    half.train(output_dir=str(tmp_path / "split"))
    # … then resume from the latest checkpoint and finish.
    resumed = NavRLExperiment(**kw)
    out = resumed.train(output_dir=str(tmp_path / "split"))
    assert out["env_steps"] == 512
    p_res = jax.tree.map(np.asarray, resumed._last_params)

    jax.tree.map(np.testing.assert_array_equal, p_full, p_res)


class _SlowCounterEnv:
    """HostEnv stub: worker-identifiable counter; optionally slow."""

    num_actions = 2

    def __init__(self, slow=False):
        self.slow = slow
        self.count = 0

    def reset(self):
        return {"visual": np.full((4, 4, 3), self.count % 256, np.uint8),
                "count": np.int64(self.count)}

    def step(self, action):
        import time as _t

        if self.slow:
            _t.sleep(0.25)
        self.count += 1
        obs = {"visual": np.full((4, 4, 3), self.count % 256, np.uint8),
               "count": np.int64(self.count)}
        return obs, 0.0, False, {"count": self.count}

    def close(self):
        pass


def test_straggler_cutoff_no_desync():
    """With cutoff_fraction < 1 and a slow worker, valid replies must stay in lockstep
    with issued commands (the stale-reply drain in step_async)."""
    fns = [lambda: _SlowCounterEnv(slow=True)] + [lambda: _SlowCounterEnv() for _ in range(2)]
    venv = VectorEnv(fns, frame_shape=(4, 4, 3), cutoff_fraction=0.6,
                     cutoff_timeout_s=0.05)
    try:
        venv.reset()
        seen_counts = []
        n_steps = 6
        for s in range(n_steps):
            venv.step_async(np.zeros(venv.n, np.int64))
            obs, rew, done, infos, valid = venv.step_wait()
            # fast workers always valid and exactly in step
            for w in (1, 2):
                assert valid[w]
                assert int(obs["count"][w]) == s + 1
            if valid[0]:
                seen_counts.append(int(obs["count"][0]))
        # slow worker's valid replies are strictly increasing (no stale replay)
        assert seen_counts == sorted(set(seen_counts)), seen_counts
        # total commands issued == replies eventually consumed: one final full step
        venv.step(np.zeros(venv.n, np.int64))
    finally:
        venv.close()


@pytest.mark.slow
def test_host_learner_publishes_stage_timing_metrics(tmp_path):
    """SURVEY.md §5 tracing row: per-stage timers (act / env_step / update) and
    env-steps/s are first-class trainer metrics, logged to TensorBoard."""
    import dataclasses as dc
    import glob

    from embodied_clip_tpu.config.experiments import get_experiment

    exp = get_experiment("objectnav_robothor_rgb_clipresnet50gru_ddppo")
    exp = dc.replace(exp, backend="hostgrid", encoder=None, num_workers=2,
                     total_env_steps=16, rollout_len=4, hidden=32,
                     ckpt_every_steps=10_000, log_dir=str(tmp_path / "logs"))
    out = exp.train(output_dir=str(tmp_path))
    for k in ("act_s", "env_step_s", "update_s",
              "act_frac", "env_step_frac", "update_frac", "env_steps_per_s"):
        assert k in out, sorted(out)
    assert out["env_steps_per_s"] > 0
    assert abs(out["act_frac"] + out["env_step_frac"] + out["update_frac"] - 1.0) < 1e-6
    assert glob.glob(str(tmp_path / "logs" / exp.name / "events.out.tfevents*")), \
        "no TB event file written"


def test_pipelined_host_rollout_collection():
    """Double-buffered collection over two env groups (BASELINE.md pipeline
    north star): the concatenated (T, B) rollout must hold per-column coherent
    trajectories — each env's observed counter advances by exactly one per row,
    exactly as a single pool would produce."""
    fns_a = [lambda: _SlowCounterEnv() for _ in range(2)]
    fns_b = [lambda: _SlowCounterEnv() for _ in range(2)]
    venv_a = VectorEnv(fns_a, frame_shape=(4, 4, 3))
    venv_b = VectorEnv(fns_b, frame_shape=(4, 4, 3))
    try:
        policy = ActorCritic(num_actions=2, goal_kind="none", hidden=16,
                             visual_is_map=False)

        def encode(frames_u8):
            x = frames_u8.astype(jnp.float32) / 255.0
            return x.reshape(x.shape[0], -1)

        collector = HostRolloutCollector([venv_a, venv_b], policy,
                                         encode_fn=encode)
        assert collector.num_envs == 4
        collector.reset(jax.random.PRNGKey(0))
        obs0 = collector._policy_obs(collector._obs, collector._prev_action)
        assert obs0["visual"].shape[0] == 4  # concatenated across groups
        params = policy.init(jax.random.PRNGKey(1), obs0,
                             policy.initial_state(4), jnp.zeros((4,), bool))["params"]
        T = 9
        rollout, last_value, _ = collector.collect(params, num_steps=T)
        assert rollout.actions.shape == (T, 4)
        assert last_value.shape == (4,)
        assert bool(rollout.valid.all())
        # Column-coherent trajectories: counter obs advance 0,1,2,... per env.
        counts = np.asarray(rollout.obs["count"])
        for col in range(4):
            np.testing.assert_array_equal(counts[:, col], np.arange(T))
        # A second collect continues from the live state (counter keeps going).
        rollout2, _, _ = collector.collect(params, num_steps=3)
        counts2 = np.asarray(rollout2.obs["count"])
        for col in range(4):
            np.testing.assert_array_equal(counts2[:, col], T + np.arange(3))
        # PPO machinery consumes the pipelined rollout unchanged.
        from embodied_clip_tpu.training.ppo import PPOConfig, compute_gae, ppo_loss

        adv, ret = compute_gae(rollout.rewards, rollout.values, rollout.dones,
                               last_value, 0.99, 0.95, valid=rollout.valid)
        loss, _ = jax.jit(
            lambda p: ppo_loss(p, policy.apply, rollout, adv, ret, PPOConfig())
        )(params)
        assert np.isfinite(float(loss))
    finally:
        venv_a.close()
        venv_b.close()


@pytest.mark.slow
def test_hostgrid_pipeline_groups_trains(tmp_path):
    """pipeline_groups=2 splits the worker pool into two software-pipelined
    VectorEnvs end-to-end through NavRLExperiment."""
    from embodied_clip_tpu.config.rl_experiments import NavRLExperiment

    exp = NavRLExperiment(
        name="hostgrid_pipe", backend="hostgrid", encoder=None,
        total_env_steps=64, rollout_len=8, hidden=32, num_workers=4,
        pipeline_groups=2, ckpt_every_steps=10 ** 9,
    )
    out = exp.train(output_dir=str(tmp_path))
    assert out["env_steps"] >= 64
    assert np.isfinite(out["loss"])
