"""Real-simulator eval path (VERDICT r2 next #2).

`train --config objectnav_robothor_rgb_clipresnet50gru_ddppo --override
backend=thor --eval` must run checkpoint eval ON THE SIMULATOR (the scripted
THOR fixture here) — never silently on the fake gridworld — per the reference's
eval contract (baselines_robothor_objectnav.md:54-68, baselines_habitat.md:
88-97)."""

import dataclasses as dc
import glob
import json
import os

import numpy as np
import pytest

from embodied_clip_tpu.config.experiments import get_experiment
from fake_thor import FakeController

SENTINEL_ENV = "ECT_TEST_EVAL_SENTINEL"


class SentinelController(FakeController):
    """Fixture controller that records (from inside VectorEnv worker processes)
    that the simulator adapter was actually instantiated."""

    def __init__(self, **kw):
        path = os.environ.get(SENTINEL_ENV)
        if path:
            with open(path, "a") as f:
                f.write("controller\n")
        super().__init__(**kw)


def _train_tiny(tmp_path):
    exp = get_experiment("objectnav_robothor_rgb_clipresnet50gru_ddppo")
    exp = dc.replace(exp, total_env_steps=32, rollout_len=4, env_batch=8,
                     hidden=32, encoder="clip_rn_tiny", encoder_dtype="float32",
                     ckpt_every_steps=32)
    exp.train(output_dir=str(tmp_path))
    ckpts = sorted(glob.glob(os.path.join(str(tmp_path), exp.name, "exp_*")))
    assert ckpts
    return exp, ckpts[-1]


@pytest.mark.slow
def test_thor_backend_eval_runs_on_simulator(tmp_path, monkeypatch):
    exp, ckpt = _train_tiny(tmp_path)
    sentinel = str(tmp_path / "sentinel.txt")
    monkeypatch.setenv(SENTINEL_ENV, sentinel)

    exp2 = dc.replace(exp, backend="thor",
                      controller_factory=SentinelController,
                      num_workers=2, eval_episodes=4, max_episode_steps=25)
    out = exp2.evaluate(output_dir=str(tmp_path / "eval"), ckpt=ckpt)

    # the simulator fixture really ran (one controller per worker process)
    assert os.path.exists(sentinel), \
        "no simulator was instantiated — eval ran on the fake gridworld"
    assert out["episodes"] == 4 and out["episodes_requested"] == 4
    assert 0.0 <= out["success"] <= 1.0

    path = os.path.join(str(tmp_path / "eval"), exp2.name, "metrics.json")
    with open(path) as f:
        eps = json.load(f)[0]["tasks"]
    assert len(eps) == 4
    # goal classes come from the fixture scene's object types (the THOR
    # adapter's candidate set), proving the records came from the simulator
    types = {e["task_info"]["object_type"] for e in eps}
    assert types <= {"Mug", "Laptop", "Apple"}, types
    assert all(e["ep_length"] > 0 for e in eps)


@pytest.mark.slow
def test_hostgrid_backend_eval_delivers_episodes(tmp_path):
    """The host eval loop also serves the hostgrid backend (no fixture needed):
    train a scratch policy there, then checkpoint-eval with full episode
    delivery and a valid schema."""
    exp = get_experiment("objectnav_robothor_rgb_clipresnet50gru_ddppo")
    exp = dc.replace(exp, backend="hostgrid", encoder=None, num_workers=3,
                     total_env_steps=24, rollout_len=4, hidden=32,
                     ckpt_every_steps=24, max_episode_steps=20)
    exp.train(output_dir=str(tmp_path / "hg_train"))
    ckpts = sorted(glob.glob(os.path.join(str(tmp_path / "hg_train"),
                                          exp.name, "exp_*")))
    assert ckpts
    exp2 = dc.replace(exp, eval_episodes=6)
    out = exp2.evaluate(output_dir=str(tmp_path / "eval_hg"), ckpt=ckpts[-1])
    assert out["episodes"] == 6
    assert np.isfinite(out["spl"])


@pytest.mark.slow
def test_scratch_config_ckpt_transfers_to_host_eval(tmp_path):
    """A fake-trained SCRATCH config (trainable ScratchCNN on pixels, no frozen
    encoder) restores into the host-backend eval policy: the fake env renders
    frames for scratch configs and _make_policy is the single construction
    point, so the param trees match across backends (regression: r3 host-eval
    once built a different architecture and restore_params raised)."""
    exp = get_experiment("ddppo_objectnav_rgb")
    exp = dc.replace(exp, total_env_steps=32, rollout_len=4, env_batch=8,
                     hidden=32, ckpt_every_steps=32)
    exp.train(output_dir=str(tmp_path))
    ckpts = sorted(glob.glob(os.path.join(str(tmp_path), exp.name, "exp_*")))
    assert ckpts

    exp2 = dc.replace(exp, backend="hostgrid", num_workers=2, eval_episodes=4,
                      max_episode_steps=20)
    out = exp2.evaluate(output_dir=str(tmp_path / "eval"), ckpt=ckpts[-1])
    assert out["episodes"] == 4
    assert 0.0 <= out["success"] <= 1.0


@pytest.mark.slow
def test_zeroshot_host_training_maps_goals(tmp_path):
    """Zeroshot host-backend training: the collector maps integer goals through
    the frozen CLIP text-goal table before the text_embed policy consumes them
    (regression: the host learners were built without goal_map_fn, so zeroshot
    host training fed raw ints to a Dense goal head)."""
    exp = get_experiment("zeroshot_objectnav_robothor_rgb_clipresnet50gru_ddppo")
    exp = dc.replace(exp, backend="hostgrid", total_env_steps=16, rollout_len=4,
                     num_workers=2, hidden=32, encoder="clip_rn_tiny",
                     encoder_dtype="float32", ckpt_every_steps=10**9)
    out = exp.train(output_dir=str(tmp_path))
    assert np.isfinite(out["loss"])
