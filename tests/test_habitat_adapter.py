"""Habitat adapter logic pinned against the scripted env fixture
(tests/fake_habitat.py): observation mapping per task, the NavRLEnv reward
(slack + distance delta + success), done/auto-reset, and metric passthrough."""

import math

import numpy as np
import pytest

from embodied_clip_tpu.envs.habitat import HabitatNavEnv
from fake_habitat import FORWARD, LEFT, STOP, FakeHabitatEnv


def make_env(task="objectnav", rgb_only=True, **kw):
    return HabitatNavEnv("cfg.yaml", task=task, rgb_only=rgb_only, seed=7,
                         env_factory=FakeHabitatEnv, **kw)


def test_objectnav_obs_mapping():
    env = make_env()
    obs = env.reset()
    assert obs["visual"].dtype == np.uint8 and obs["visual"].shape == (64, 64, 3)
    assert obs["goal"].dtype == np.int32 and "depth" not in obs
    # rgbd mode exposes the depth sensor
    env2 = make_env(rgb_only=False)
    obs2 = env2.reset()
    assert obs2["depth"].shape == (64, 64, 1) and obs2["depth"].dtype == np.float32


def test_pointnav_goal_is_gps_compass():
    env = make_env(task="pointnav")
    obs = env.reset()
    assert obs["goal"].shape == (2,) and obs["goal"].dtype == np.float32
    d0 = float(obs["goal"][0])
    # moving toward/away changes the range component coherently
    obs, _, _, _ = env.step(FORWARD)
    assert float(obs["goal"][0]) != d0


def test_reward_is_slack_plus_distance_delta():
    env = make_env()
    env.reset()
    inner = env.env
    d0 = inner.get_metrics()["distance_to_goal"]
    obs, reward, done, info = env.step(LEFT)  # turning changes no distance
    assert reward == pytest.approx(-0.01, abs=1e-6)
    # a forward step that closes distance pays slack + positive delta
    # (orient the fake agent straight at the goal first)
    inner.yaw = math.degrees(math.atan2(inner.gx - inner.x, inner.gz - inner.z))
    d_before = inner.get_metrics()["distance_to_goal"]
    _, reward, _, _ = env.step(FORWARD)
    d_after = inner.get_metrics()["distance_to_goal"]
    assert reward == pytest.approx(-0.01 + (d_before - d_after), abs=1e-6)
    assert d_after < d_before


def test_stop_at_goal_success_and_autoreset():
    env = make_env()
    env.reset()
    inner = env.env
    # walk the fake agent straight to the goal, then STOP
    for _ in range(40):
        inner.yaw = math.degrees(math.atan2(inner.gx - inner.x, inner.gz - inner.z))
        if inner.get_metrics()["distance_to_goal"] <= inner.step_m:
            break
        env.step(FORWARD)
    obs, reward, done, info = env.step(STOP)
    assert done and info["success"] == 1.0
    assert 0.0 < info["spl"] <= 1.0
    assert reward == pytest.approx(-0.01 + env.SUCCESS_REWARD
                                   + (info and 0.0), abs=0.3)  # slack+bonus±delta
    # auto-reset delivered the next episode's first obs
    assert obs["visual"].shape == (64, 64, 3)
    assert not env.env.episode_over


def test_stop_away_from_goal_fails():
    env = make_env()
    env.reset()
    _, _, done, info = env.step(STOP)
    assert done and info["success"] == 0.0 and info["spl"] == 0.0


def test_split_contract_with_factories():
    """A factory that accepts split= receives it; a path-only factory is fine
    when no split is requested but must FAIL LOUDLY when one is — silently
    dropping split='val' would score train scenes and report them as eval
    (baselines_habitat.md:88-97)."""
    seen = {}

    def factory_with_split(path, split=None):
        seen["split"] = split
        return FakeHabitatEnv(path)

    HabitatNavEnv("cfg.yaml", env_factory=factory_with_split, split="val")
    assert seen["split"] == "val"

    # path-only factory (FakeHabitatEnv itself), no split requested: ok
    HabitatNavEnv("cfg.yaml", env_factory=FakeHabitatEnv)

    with pytest.raises(TypeError, match="split"):
        HabitatNavEnv("cfg.yaml", env_factory=FakeHabitatEnv, split="val")
