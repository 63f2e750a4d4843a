"""Pure-JAX goal-conditioned grid navigation env ("fake env" backend).

Fills the test-strategy gap SURVEY.md §4 identifies: the reference has no hermetic env
— its RL suites need AI2-THOR/habitat-sim binaries. This env is a deterministic,
fully-jittable ObjectNav analogue: egocentric observations, THOR's discrete
6-action ObjectNav space (MoveAhead / RotateLeft / RotateRight / LookUp /
LookDown / End, cf. thor_frames.py:66-86), a
target object class among distractors, shaped navigation reward, success + SPL
metrics. Because `step` is a pure function on a pytree state, whole rollouts run
on-device under `lax.scan` — the TPU-native counterpart of allenact's CPU vectorized
task samplers — and auto-reset keeps batches dense.

It doubles as a frame generator: `render_frames` emits uint8 RGB images so the full
frozen-encoder → policy pipeline can be exercised hermetically.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["GridNavEnv", "GridNavState", "ACTIONS"]

# The full THOR ObjectNav discrete action space (envs/thor.py OBJECTNAV_ACTIONS;
# ref thor_frames.py:66-86 horizon mechanics) — same names, same indices — so a
# checkpoint trained on this hermetic backend restores into a thor-backend
# learner unchanged. LookUp/LookDown pitch the camera: the egocentric window
# shifts along the forward axis (up = farther ahead, down = closer).
ACTIONS = ("MoveAhead", "RotateLeft", "RotateRight", "LookUp", "LookDown", "End")
MOVE_AHEAD, ROTATE_LEFT, ROTATE_RIGHT, LOOK_UP, LOOK_DOWN, END = range(6)

# dir: 0=N(-y), 1=E(+x), 2=S(+y), 3=W(-x)
_DIR_VECS = jnp.array([[-1, 0], [0, 1], [1, 0], [0, -1]], jnp.int32)
# Rotation matrices taking egocentric (forward, right) offsets to world (dy, dx).
_ROT = jnp.array(
    [[[-1, 0], [0, 1]],   # N: fwd=-y, right=+x
     [[0, 1], [1, 0]],    # E: fwd=+x, right=+y
     [[1, 0], [0, -1]],   # S: fwd=+y, right=-x
     [[0, -1], [-1, 0]]], # W: fwd=-x, right=-y
    jnp.int32,
)


@struct.dataclass
class GridNavState:
    key: jnp.ndarray            # (B, 2) uint32 per-env PRNG
    agent_pos: jnp.ndarray      # (B, 2) int32 (y, x)
    agent_dir: jnp.ndarray      # (B,) int32
    agent_hor: jnp.ndarray      # (B,) int32 camera horizon in {-1(up),0,1(down)}
    object_pos: jnp.ndarray     # (B, K, 2) int32
    object_cls: jnp.ndarray     # (B, K) int32
    target_idx: jnp.ndarray     # (B,) int32 — which object is the goal
    t: jnp.ndarray              # (B,) int32 steps taken this episode
    start_dist: jnp.ndarray     # (B,) int32 initial manhattan distance (for SPL)


@dataclasses.dataclass(frozen=True)
class GridNavEnv:
    size: int = 8
    num_objects: int = 2
    num_classes: int = 12
    max_steps: int = 64
    view: int = 7              # egocentric window (view × view)
    success_dist: int = 1
    step_penalty: float = -0.01
    shaping: float = 0.2
    success_reward: float = 10.0
    # Emit the egocentric view flattened to (B, view*view*C) instead of a conv map.
    # Used by CPU tests: XLA:CPU's conv backward is orders slower than its TPU
    # counterpart, so the hermetic learning gate trains a Dense-front policy.
    flat_obs: bool = False

    # Restrict object classes to a subset (zero-shot seen/unseen splits,
    # readme_files/zeroshot_objectnav.md:31-32). None = all classes.
    class_set: Optional[Tuple[int, ...]] = None
    # 'objectnav': goal = target object class id. 'pointnav': goal = egocentric
    # (distance, heading) to the target, recomputed every step — the
    # pointgoal-with-gps-compass analogue (reference baselines_habitat.md PointNav).
    task: str = "objectnav"
    # Emit uint8 RGB frames (render_frames) instead of the feature map — exercises the
    # frozen-encoder-in-the-rollout path entirely on device.
    frame_obs: bool = False
    frame_cell_px: int = 8
    # Also emit a normalized egocentric depth map under obs['depth'] — the RGBD
    # observation shape of the habitat ddppo_*_rgbd baselines
    # (baselines_habitat.md:63-75). Depth = per-cell distance from the agent in the
    # egocentric view, 1.0 (far) outside scene bounds, matching habitat's
    # [0,1]-normalized depth sensor semantics.
    depth_obs: bool = False

    @property
    def num_actions(self) -> int:
        return len(ACTIONS)

    @property
    def obs_channels(self) -> int:
        return self.num_classes + 1  # per-cell class one-hot + in-bounds

    # ----------------------------------------------------------------- episode init

    def _init_episode(self, key):
        k1, k2, k3, k4, k5 = jax.random.split(key, 5)
        agent_pos = jax.random.randint(k1, (2,), 0, self.size)
        agent_dir = jax.random.randint(k2, (), 0, 4)
        object_pos = jax.random.randint(k3, (self.num_objects, 2), 0, self.size)
        # Distinct classes per episode so the goal is unambiguous, at ANY
        # num_objects ≤ |pool|: a random permutation of the pool (repeats only
        # when there are more objects than classes, which no config registers).
        pool = jnp.asarray(
            self.class_set if self.class_set is not None else range(self.num_classes),
            jnp.int32,
        )
        perm = jax.random.permutation(k4, pool.shape[0])
        idx = perm[jnp.arange(self.num_objects) % pool.shape[0]]
        object_cls = pool[idx].astype(jnp.int32)
        target_idx = jax.random.randint(k5, (), 0, self.num_objects)
        tgt = object_pos[target_idx]
        start_dist = jnp.abs(agent_pos - tgt).sum()
        return (agent_pos.astype(jnp.int32), agent_dir.astype(jnp.int32),
                object_pos.astype(jnp.int32), object_cls, target_idx.astype(jnp.int32),
                jnp.maximum(start_dist, 1).astype(jnp.int32))

    def reset(self, key, batch: int) -> Tuple[GridNavState, Dict[str, jnp.ndarray]]:
        keys = jax.random.split(key, batch)
        nxt = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
        init = jax.vmap(self._init_episode)(nxt[:, 0])
        state = GridNavState(
            key=nxt[:, 1],
            agent_pos=init[0], agent_dir=init[1],
            agent_hor=jnp.zeros(batch, jnp.int32),
            object_pos=init[2],
            object_cls=init[3], target_idx=init[4],
            t=jnp.zeros(batch, jnp.int32), start_dist=init[5],
        )
        return state, self.observe(state)

    # ------------------------------------------------------------------ observation

    def observe(self, s: GridNavState) -> Dict[str, jnp.ndarray]:
        b = s.agent_pos.shape[0]
        r = self.view // 2
        fwd = jnp.arange(self.view, dtype=jnp.int32)[::-1] - r  # row 0 = farthest ahead
        rgt = jnp.arange(self.view, dtype=jnp.int32) - r
        ego = jnp.stack(jnp.meshgrid(fwd, rgt, indexing="ij"), -1)  # (v,v,2)=(fwd,right)
        rot = _ROT[s.agent_dir]                                     # (B,2,2)
        world = jnp.einsum("vwe,bed->bvwd", ego, rot) + s.agent_pos[:, None, None, :]
        # Camera pitch: looking up (hor=-1) shifts the window one cell farther
        # ahead, looking down (hor=+1) one cell closer (THOR horizon analogue).
        world = world - (s.agent_hor[:, None] * _DIR_VECS[s.agent_dir])[:, None, None, :]
        in_bounds = ((world >= 0) & (world < self.size)).all(-1)    # (B,v,v)
        # per-cell object class one-hot
        match = (world[:, :, :, None, :] == s.object_pos[:, None, None, :, :]).all(-1)
        match = match & in_bounds[..., None]                        # (B,v,v,K)
        onehot = jax.nn.one_hot(s.object_cls, self.num_classes)     # (B,K,C)
        cls_map = jnp.einsum("bvwk,bkc->bvwc", match.astype(jnp.float32), onehot)
        visual = jnp.concatenate([cls_map, in_bounds[..., None].astype(jnp.float32)], -1)
        depth = None
        if self.depth_obs:
            ego_f = ego.astype(jnp.float32)                       # (v,v,2)
            cell_d = jnp.linalg.norm(ego_f, axis=-1) / (r * jnp.sqrt(2.0) + 1e-6)
            depth = jnp.where(in_bounds, cell_d[None], 1.0)       # (B,v,v)
            depth = depth[..., None].astype(jnp.float32)
        if self.frame_obs:
            visual = self._render(visual)
            if depth is not None:
                px = self.frame_cell_px
                depth = jnp.repeat(jnp.repeat(depth, px, 1), px, 2)
        elif self.flat_obs:
            visual = visual.reshape(b, -1)
        if self.task == "pointnav":
            # Egocentric polar goal: (distance, heading) in the agent frame.
            d = (self._target_pos(s) - s.agent_pos).astype(jnp.float32)  # world (dy,dx)
            rotf = _ROT[s.agent_dir].astype(jnp.float32)                  # ego→world
            ego = jnp.einsum("bd,bed->be", d, rotf)                       # (fwd, right)
            dist = jnp.linalg.norm(d, axis=-1)
            heading = jnp.arctan2(ego[:, 1], ego[:, 0])
            goal = jnp.stack([dist / self.size, heading], -1)
        else:
            goal = jnp.take_along_axis(s.object_cls, s.target_idx[:, None], 1)[:, 0]
        out = {"visual": visual, "goal": goal}
        if depth is not None:
            out["depth"] = depth
        return out

    def _render(self, visual_map: jnp.ndarray) -> jnp.ndarray:
        """(B,v,v,C) feature map → uint8 RGB frames."""
        hue = jnp.linspace(0.1, 1.0, self.num_classes)
        r = (visual_map[..., : self.num_classes] * hue).sum(-1)
        g = visual_map[..., -1]  # in-bounds
        bl = visual_map[..., : self.num_classes].sum(-1)
        img = jnp.stack([r, 0.3 * g, bl], -1)  # (B,v,v,3) in [0,1]
        px = self.frame_cell_px
        img = jnp.repeat(jnp.repeat(img, px, 1), px, 2)
        return (jnp.clip(img, 0, 1) * 255).astype(jnp.uint8)

    def render_frames(self, s: GridNavState, cell_px: int = 8) -> jnp.ndarray:
        """uint8 RGB frames of the egocentric view (for encoder-in-loop pipelines)."""
        env = dataclasses.replace(self, frame_obs=False, flat_obs=False,
                                  frame_cell_px=cell_px)
        return env._render(env.observe(s)["visual"])

    # ---------------------------------------------------------------------- expert

    def expert_action(self, s: GridNavState) -> jnp.ndarray:
        """Greedy shortest-path oracle (End when within success_dist) — the expert for
        DAgger imitation (reference iTHOR Rearrangement trains 1-phase DAgger,
        baselines_ithor_rearrangement.md:7-12)."""
        tgt = self._target_pos(s)
        d = tgt - s.agent_pos                      # (B,2) (dy, dx)
        dist = jnp.abs(d).sum(-1)
        # Desired heading: move along the axis with the larger remaining distance.
        want_y = jnp.abs(d[:, 0]) >= jnp.abs(d[:, 1])
        dir_y = jnp.where(d[:, 0] < 0, 0, 2)       # N or S
        dir_x = jnp.where(d[:, 1] > 0, 1, 3)       # E or W
        desired = jnp.where(want_y & (d[:, 0] != 0), dir_y,
                            jnp.where(d[:, 1] != 0, dir_x, dir_y))
        diff = (desired - s.agent_dir) % 4
        turn = jnp.where(diff == 1, ROTATE_RIGHT,
                         jnp.where(diff == 3, ROTATE_LEFT, ROTATE_RIGHT))
        move_or_turn = jnp.where(diff == 0, MOVE_AHEAD, turn)
        return jnp.where(dist <= self.success_dist, END, move_or_turn).astype(jnp.int32)

    # ------------------------------------------------------------------------ step

    def _target_pos(self, s: GridNavState) -> jnp.ndarray:
        return jnp.take_along_axis(s.object_pos, s.target_idx[:, None, None], 1)[:, 0]

    def _dist(self, s: GridNavState) -> jnp.ndarray:
        return jnp.abs(s.agent_pos - self._target_pos(s)).sum(-1)

    def step(self, s: GridNavState, action: jnp.ndarray):
        """(state, actions (B,) int32) → (state', obs, reward (B,), done (B,), info).

        Auto-resets finished episodes (the returned obs is the first of the new
        episode where done). info carries per-step `success`, `spl`, `episode_len`
        valid where done.
        """
        d_prev = self._dist(s)

        delta = _DIR_VECS[s.agent_dir]
        moved = jnp.clip(s.agent_pos + delta, 0, self.size - 1)
        new_pos = jnp.where((action == MOVE_AHEAD)[:, None], moved, s.agent_pos)
        new_dir = (s.agent_dir
                   + jnp.where(action == ROTATE_LEFT, -1, 0)
                   + jnp.where(action == ROTATE_RIGHT, 1, 0)) % 4
        new_hor = jnp.clip(s.agent_hor
                           + jnp.where(action == LOOK_UP, -1, 0)
                           + jnp.where(action == LOOK_DOWN, 1, 0), -1, 1)
        stepped = s.replace(agent_pos=new_pos.astype(jnp.int32),
                            agent_dir=new_dir.astype(jnp.int32),
                            agent_hor=new_hor.astype(jnp.int32),
                            t=s.t + 1)

        d_new = self._dist(stepped)
        ended = action == END
        success = ended & (d_new <= self.success_dist)
        timeout = stepped.t >= self.max_steps
        done = ended | timeout

        reward = (self.step_penalty
                  + self.shaping * (d_prev - d_new).astype(jnp.float32)
                  + self.success_reward * success.astype(jnp.float32))

        ep_len = stepped.t
        spl = success.astype(jnp.float32) * (
            s.start_dist.astype(jnp.float32)
            / jnp.maximum(ep_len.astype(jnp.float32), s.start_dist.astype(jnp.float32))
        )

        # Auto-reset finished envs.
        nxt = jax.vmap(lambda k: jax.random.split(k, 2))(stepped.key)
        init = jax.vmap(self._init_episode)(nxt[:, 0])
        fresh = GridNavState(
            key=nxt[:, 1], agent_pos=init[0], agent_dir=init[1],
            agent_hor=jnp.zeros_like(stepped.agent_hor), object_pos=init[2],
            object_cls=init[3], target_idx=init[4],
            t=jnp.zeros_like(stepped.t), start_dist=init[5],
        )
        sel = lambda a, b: jnp.where(
            done.reshape((-1,) + (1,) * (a.ndim - 1)), a, b
        )
        new_state = jax.tree.map(sel, fresh, stepped)

        info = {"success": success.astype(jnp.float32), "spl": spl,
                "episode_len": ep_len.astype(jnp.float32),
                "done": done.astype(jnp.float32)}
        return new_state, self.observe(new_state), reward, done, info
