"""Scripted habitat.Env stand-in: a point agent on a 2D plane with the exact
observation keys ('rgb', 'depth', 'objectgoal', 'pointgoal_with_gps_compass'),
metrics ('distance_to_goal', 'success', 'spl') and episode_over semantics the
adapter consumes — pins envs/habitat.py without habitat-sim (VERDICT round-1
missing #5)."""

from __future__ import annotations

import math

import numpy as np

# habitat-lab ObjectNav action order: STOP, MOVE_FORWARD, TURN_LEFT, TURN_RIGHT, ...
STOP, FORWARD, LEFT, RIGHT = 0, 1, 2, 3


class _Space:
    def __init__(self, n):
        self.spaces = {i: None for i in range(n)}


class FakeHabitatEnv:
    success_distance = 0.2
    step_m = 0.25
    turn_deg = 30.0

    def __init__(self, config_path=None, width=64, height=64, n_actions=4):
        self.config_path = config_path
        self.w, self.h = width, height
        self.action_space = _Space(n_actions)
        self.episode_over = False
        self._rng = np.random.RandomState(0)
        self._episode_i = 0

    def seed(self, s):
        self._rng = np.random.RandomState(s)

    # ------------------------------------------------------------------ simulation

    def _obs(self):
        rgb = np.full((self.h, self.w, 3), (self._episode_i * 31) % 255, np.uint8)
        dx, dz = self.gx - self.x, self.gz - self.z
        dist = math.hypot(dx, dz)
        heading = math.atan2(dx, dz) - math.radians(self.yaw)
        return {
            "rgb": rgb,
            "depth": np.full((self.h, self.w, 1), 0.5, np.float32),
            "objectgoal": np.array([self.goal_id], np.int64),
            "pointgoal_with_gps_compass": np.array([dist, heading], np.float32),
        }

    def reset(self):
        self._episode_i += 1
        self.x, self.z, self.yaw = 0.0, 0.0, 0.0
        self.gx = float(self._rng.uniform(0.5, 2.0))
        self.gz = float(self._rng.uniform(0.5, 2.0))
        self.goal_id = int(self._rng.randint(0, 6))
        self.episode_over = False
        self._start_dist = math.hypot(self.gx, self.gz)
        self._path = 0.0
        self._stopped_at_goal = False
        return self._obs()

    def step(self, action):
        if action == STOP:
            self.episode_over = True
            self._stopped_at_goal = (
                math.hypot(self.gx - self.x, self.gz - self.z)
                <= self.success_distance
            )
        elif action == FORWARD:
            r = math.radians(self.yaw)
            self.x += math.sin(r) * self.step_m
            self.z += math.cos(r) * self.step_m
            self._path += self.step_m
        elif action == LEFT:
            self.yaw -= self.turn_deg
        elif action == RIGHT:
            self.yaw += self.turn_deg
        return self._obs()

    def get_metrics(self):
        d = math.hypot(self.gx - self.x, self.gz - self.z)
        success = float(self.episode_over and self._stopped_at_goal)
        spl = 0.0
        if success:
            spl = self._start_dist / max(self._path, self._start_dist)
        return {"distance_to_goal": d, "success": success, "spl": spl}

    def close(self):
        pass
