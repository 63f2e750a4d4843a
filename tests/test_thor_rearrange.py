"""THOR-backed 1-phase Rearrangement adapter (VERDICT round-1 next #8), driven
end-to-end on the scripted controller fixture: scene shuffling, dual-controller
goal view, pose-match metrics, and the greedy expert restoring the scene."""

import numpy as np

from embodied_clip_tpu.envs.thor_rearrange import (
    REARRANGE_ACTIONS, THORRearrangeEnv,
)
from fake_thor import FakeController

DONE = REARRANGE_ACTIONS.index("Done")


def make_env(**kw):
    defaults = dict(
        scenes=["FakeScene_1"], controller_factory=FakeController,
        num_misplaced=2, num_toggled_open=1, max_steps=120,
        visibility_distance=1.5, seed=5,
    )
    defaults.update(kw)
    return THORRearrangeEnv(**defaults)


def test_reset_shuffles_and_emits_dual_view():
    env = make_env()
    obs = env.reset()
    assert obs["visual"].shape == (300, 300, 3) and obs["visual"].dtype == np.uint8
    assert obs["goal_visual"].shape == (300, 300, 3)
    # something is actually misplaced after the shuffle
    assert len(env._episode["start_misplaced"]) >= 1
    # the goal (walkthrough) controller was never shuffled
    calls = [c for c, _ in env.goal_controller.calls]
    assert "SetObjectPoses" not in calls
    # goal view is rendered from the mirrored agent pose
    ag = env.controller.last_event.metadata["agent"]["position"]
    gg = env.goal_controller.last_event.metadata["agent"]["position"]
    assert (ag["x"], ag["z"]) == (gg["x"], gg["z"])


def test_done_without_fixing_fails():
    env = make_env()
    env.reset()
    n_start = len(env._episode["start_misplaced"])
    _, _, done, info = env.step(DONE)
    assert done and info["success"] == 0.0
    assert info["prop_fixed"] == 0.0
    assert info["num_newly_misplaced"] == 0.0
    assert n_start >= 1


def test_expert_restores_scene():
    env = make_env(seed=11)
    env.reset()
    info, done = {}, False
    for _ in range(env.max_steps + 1):
        a = env.expert_action()
        _, _, done, info = env.step(a)
        if done:
            break
    assert done, "expert never finished"
    assert info["success"] == 1.0, info
    assert info["prop_fixed"] == 1.0
    assert info["num_newly_misplaced"] == 0.0


def test_shuffle_poses_keyed_by_name_cover_all_placeables():
    # Real THOR keys SetObjectPoses by the object's `name` metadata field and
    # disables pickupable AND moveable objects missing from the list — the env
    # must send every placeable's pose, keyed by name, and none may vanish
    # from the scene (a missing chair would make the unshuffle scene silently
    # differ from the goal view the policy is conditioned on).
    env = make_env()
    env.reset()
    calls = [kw for c, kw in env.controller.calls if c == "SetObjectPoses"]
    assert calls, "shuffle never issued SetObjectPoses"
    names = {p["objectName"] for p in calls[0]["objectPoses"]}
    placeable_names = {o["name"] for o in env.controller._template
                       if o["pickupable"] or o.get("moveable")}
    assert names == placeable_names
    assert any(not o["pickupable"] and o.get("moveable")
               for o in env.controller._template), \
        "fixture must include a moveable-but-not-pickupable object"
    live = {o["name"] for o in env.controller.objects}
    assert placeable_names <= live, "a placeable object was disabled by the shuffle"


def test_set_object_poses_failure_raises():
    class BadController(FakeController):
        def step(self, action=None, **kwargs):
            if action == "SetObjectPoses":
                return self._event(success=False, error="boom")
            return super().step(action=action, **kwargs)

    import pytest

    env = make_env(controller_factory=BadController)
    with pytest.raises(RuntimeError, match="SetObjectPoses"):
        env.reset()


def test_open_close_only_episode():
    env = make_env(num_misplaced=0, num_toggled_open=2, seed=2)
    env.reset()
    assert len(env._episode["start_misplaced"]) >= 1  # openness counts as misplaced
    for _ in range(env.max_steps + 1):
        _, _, done, info = env.step(env.expert_action())
        if done:
            break
    assert info["success"] == 1.0, info


# ------------------------------------------------------------ 2-phase adapter


def make_two_phase(**kw):
    from embodied_clip_tpu.envs.thor_rearrange import THORTwoPhaseRearrangeEnv

    defaults = dict(
        scenes=["FakeScene_1"], controller_factory=FakeController,
        num_misplaced=2, num_toggled_open=1, max_steps=120,
        visibility_distance=1.5, seed=5, walkthrough_budget=20,
    )
    defaults.update(kw)
    return THORTwoPhaseRearrangeEnv(**defaults)


def test_two_phase_walkthrough_observes_goal_scene():
    env = make_two_phase()
    obs = env.reset()
    # single controller, no simultaneous goal view — the phase flag instead
    assert env.goal_controller is None
    assert "goal_visual" not in obs
    assert int(obs["goal"]) == 0
    # nothing was shuffled yet: the scene IS the goal configuration
    calls = [c for c, _ in env.controller.calls]
    assert "SetObjectPoses" not in calls
    assert all(env._in_goal_pose(o) for o in env._objects())


def test_two_phase_done_switches_to_unshuffle():
    env = make_two_phase()
    env.reset()
    obs, r, done, info = env.step(DONE)
    assert not done and r == 0.0 and info == {}
    assert int(obs["goal"]) == 1
    # the shuffle happened at the phase switch
    calls = [c for c, _ in env.controller.calls]
    assert "SetObjectPoses" in calls
    assert len(env._episode["start_misplaced"]) >= 1
    # Done in phase 1 now ends the episode (unsolved)
    _, _, done, info = env.step(DONE)
    assert done and info["success"] == 0.0


def test_two_phase_budget_forces_switch():
    env = make_two_phase(walkthrough_budget=4)
    env.reset()
    ahead = REARRANGE_ACTIONS.index("MoveAhead")
    for _ in range(4):
        obs, _, done, _ = env.step(ahead)
        assert not done
    assert int(obs["goal"]) == 1


def test_two_phase_interactions_inert_in_walkthrough():
    env = make_two_phase()
    env.reset()
    snapshot = {o["objectId"]: (dict(o["position"]), bool(o.get("isOpen", False)))
                for o in env._objects()}
    for name in ("PickupMisplaced", "PutHeld", "OpenTarget", "CloseTarget"):
        env.step(REARRANGE_ACTIONS.index(name))
    assert env._episode["held"] is None
    now = {o["objectId"]: (dict(o["position"]), bool(o.get("isOpen", False)))
           for o in env._objects()}
    assert now == snapshot, "walkthrough interactions must not touch the scene"
    assert int(env._episode["phase"]) == 0


def test_two_phase_expert_restores_scene():
    env = make_two_phase(seed=11)
    env.reset()
    # the walkthrough demo surveys the goal configuration (a full RotateRight
    # revolution), then ends the phase with Done
    scan = int(round(360.0 / env.rot_step))
    for i in range(min(scan, env.walkthrough_budget - 1)):
        a = env.expert_action()
        assert REARRANGE_ACTIONS[a] == "RotateRight", (i, REARRANGE_ACTIONS[a])
        env.step(a)
    assert REARRANGE_ACTIONS[env.expert_action()] == "Done"
    info, done = {}, False
    for _ in range(env.max_steps + env.walkthrough_budget + 2):
        a = env.expert_action()
        _, _, done, info = env.step(a)
        if done:
            break
    assert done, "expert never finished"
    assert info["success"] == 1.0, info
    assert info["prop_fixed"] == 1.0
    assert info["num_newly_misplaced"] == 0.0
