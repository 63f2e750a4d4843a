"""THOR adapter logic pinned against the scripted controller fixture
(tests/fake_thor.py) — reset/teleport call signatures, the visibility success
predicate, SPL accounting, and auto-reset — without the Unity binary
(VERDICT round-1 missing #5)."""

import numpy as np
import pytest

from embodied_clip_tpu.envs.thor import OBJECTNAV_ACTIONS, THORObjectNavEnv
from fake_thor import FakeController

A = {name: i for i, name in enumerate(OBJECTNAV_ACTIONS)}


def make_env(**kw):
    return THORObjectNavEnv(
        scenes=["FakeScene_1"], object_types=["Mug", "Laptop", "Apple"],
        controller_factory=FakeController, max_steps=50, seed=3, **kw)


def test_reset_contract_and_obs():
    env = make_env()
    obs = env.reset()
    assert obs["visual"].dtype == np.uint8 and obs["visual"].shape == (300, 300, 3)
    assert 0 <= int(obs["goal"]) < 3
    # reset must query reachable positions and teleport (thor_frames.py:52-59 recipe)
    calls = [c for c, _ in env.controller.calls]
    assert "GetReachablePositions" in calls and "TeleportFull" in calls


def test_success_is_visibility_at_end():
    env = make_env()
    env.reset()
    # Script a known pose: stand 0.5m in front of the Apple (at 0.25, 0.25), facing it.
    env._episode["object_type"] = "Apple"
    env.controller.step(action="TeleportFull",
                        position=dict(x=0.25, y=0.9, z=0.75),
                        rotation=dict(x=0, y=180, z=0), horizon=0)
    assert env._visible_target()
    obs, reward, done, info = env.step(A["End"])
    assert done and info["success"] == 1.0
    assert 0.0 < info["spl"] <= 1.0
    assert info["object_type"] == "Apple"
    # auto-reset: obs is the next episode's first frame
    assert obs["visual"].shape == (300, 300, 3)


def test_end_without_visibility_fails():
    env = make_env()
    env.reset()
    env._episode["object_type"] = "Apple"
    env.controller.step(action="TeleportFull",
                        position=dict(x=3.0, y=0.9, z=3.0),
                        rotation=dict(x=0, y=0, z=0), horizon=0)
    assert not env._visible_target()
    _, _, done, info = env.step(A["End"])
    assert done and info["success"] == 0.0 and info["spl"] == 0.0


def test_path_len_accumulates_and_timeout_ends():
    env = make_env()
    env.reset()
    env._episode["object_type"] = "Apple"
    env.controller.step(action="TeleportFull", position=dict(x=1.0, y=0.9, z=1.0),
                        rotation=dict(x=0, y=0, z=0), horizon=0)
    p0 = env._episode["path_len"]
    env.step(A["MoveAhead"])
    assert env._episode["path_len"] == pytest.approx(p0 + 0.25)
    # blocked moves accrue no path length
    env.controller.step(action="TeleportFull", position=dict(x=0.0, y=0.9, z=3.0),
                        rotation=dict(x=0, y=0, z=0), horizon=0)
    before = env._episode["path_len"]
    env.step(A["MoveAhead"])  # facing +z at the wall
    assert env._episode["path_len"] == pytest.approx(before)
    # run out the clock → done with success 0
    done = False
    for _ in range(60):
        _, _, done, info = env.step(A["RotateLeft"])
        if done:
            break
    assert done and info["success"] == 0.0


def test_geodesic_uses_shortest_path_query():
    env = make_env()
    env.reset()
    env._episode["object_type"] = "Mug"
    env.controller.calls.clear()
    d = env._geodesic_to_target()
    assert any(c == "GetShortestPathToPoint" for c, _ in env.controller.calls)
    # L-path from the fixture: |dx| + |dz| to the Mug at (1.0, 2.0)
    ag = env.controller.last_event.metadata["agent"]["position"]
    expected = abs(1.0 - ag["x"]) + abs(2.0 - ag["z"])
    assert d == pytest.approx(expected)
