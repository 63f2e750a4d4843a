"""Frozen-encoder-inside-the-rollout: the reference's defining RL shape.

The reference's RL always runs the frozen CLIP preprocessor inside rollout
collection (ClipResNetPreprocessor; readme_files/baselines_robothor_objectnav.md:
48-51). Here the registered encoder-named experiments run frames→encode→policy
end-to-end on the hermetic fake backend too: GridNavEnv emits uint8 RGB frames and
the FrozenEncoder's fused preprocess+trunk runs inside the jitted rollout step.
These tests use the smoke-scale clip_rn_tiny config (full ModifiedResNet code path
— stem, 4 stages, attnpool — at CPU cost).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from embodied_clip_tpu.config.experiments import get_experiment
from embodied_clip_tpu.envs.gridworld import GridNavEnv
from embodied_clip_tpu.models.encoders import build_encoder
from embodied_clip_tpu.models.policy import ActorCritic
from embodied_clip_tpu.training.ddppo import DDPPOConfig, DDPPOLearner
from embodied_clip_tpu.training.ppo import PPOConfig


def test_registered_encoder_config_runs_frames_through_encoder(tmp_path):
    """The registered RoboTHOR config with an encoder set must (a) build a
    frames-emitting fake env, (b) wire a non-None encode_fn, (c) train end-to-end."""
    exp = get_experiment(
        "objectnav_robothor_rgb_clipresnet50gru_ddppo",
        overrides=["encoder=clip_rn_tiny", "total_env_steps=2048",
                   "env_batch=8", "rollout_len=16", "hidden=32",
                   "ckpt_every_steps=1000000"],
    )
    env = exp._build_fake_env()
    assert env.frame_obs, "encoder-named config must train on uint8 frames"
    obs = env.reset(jax.random.PRNGKey(0), 2)[1]
    assert obs["visual"].dtype == jnp.uint8
    assert exp._encode_fn() is not None

    out = exp.train(output_dir=str(tmp_path))
    assert out["env_steps"] >= 2048
    assert np.isfinite(out["loss"])
    # The encoded features actually flowed: evaluate through the same wiring.
    exp.eval_episodes = 16
    scores = exp.evaluate(output_dir=str(tmp_path))
    assert 0.0 <= scores["success"] <= 1.0
    # Real RoboTHOR vocabulary in the per-object-type records, not "0".."11".
    assert all(not t.isdigit() for t in scores["per_object_type"])


def test_scratch_config_trains_cnn_on_frames():
    """encoder=None (scratch) trains its ScratchCNN on rendered pixels — the
    habitat scratch-baseline shape (baselines_habitat.md:75) — with no frozen
    encoder in the loop, so its checkpoints restore into host-backend
    learners/eval (same param tree as the simulator backends)."""
    exp = get_experiment("ddppo_objectnav_rgb")  # registered scratch config
    env = exp._build_fake_env()
    assert env.frame_obs
    assert exp._encode_fn() is None
    assert exp._build_policy(env).scratch_cnn


def test_ddppo_learns_with_frozen_encoder_in_rollout():
    """Learning gate for the frames→frozen-encode→policy path (the flagship
    configuration): DD-PPO must beat 30% success on the size-5 gridworld with a
    frozen random tiny-CLIP encoder in the loop (oracle-feature runs reach ~45-58%;
    a random policy sits near 15%)."""
    env = GridNavEnv(size=5, max_steps=24, frame_obs=True)
    enc = build_encoder("clip_rn_tiny", dtype=jnp.float32).fold_bn()
    fn, variables = enc.encode_fn(), enc.variables

    def encode(frames_u8):
        return fn(variables, frames_u8)["clip_conv"]

    policy = ActorCritic(
        num_actions=env.num_actions, goal_kind="object_embed",
        num_goal_classes=env.num_classes, hidden=64,
    )
    learner = DDPPOLearner(
        env, policy,
        DDPPOConfig(rollout_len=32, env_batch=16,
                    ppo=PPOConfig(lr=3e-3, epochs=4)),
        encode_fn=encode,
    )
    params, opt_state, act = learner.init(jax.random.PRNGKey(0))
    best = 0.0
    for it in range(45):
        params, opt_state, act, m = learner.train_iteration(params, opt_state, act)
        if it >= 30:
            best = max(best, float(m["success"]))
            if best > 0.3:
                break
    assert best > 0.3, best
