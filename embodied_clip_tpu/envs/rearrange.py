"""Pure-JAX rearrangement envs (pick → carry → place), 1-phase and 2-phase.

Fake-env analogue of the reference's iTHOR Rearrangement suite
(baselines_ithor_rearrangement.md:4-12). 1-phase (`GridRearrangeEnv`,
OnePhase*Dagger, trained with DAgger IL): one misplaced object must be picked
up at its current cell and dropped at its goal cell, with the goal cell
visible throughout. Jittable like envs/gridworld.py (pytree state, auto-reset,
lax.scan rollouts) and ships a greedy expert oracle for DAgger.

2-phase (`GridTwoPhaseRearrangeEnv`): the upstream walkthrough→unshuffle
variant — the agent first observes the scene in its GOAL configuration
(object sitting on its goal cell, goal channel visible), ends the walkthrough
with Drop (or exhausts the budget), then the object teleports to a random
cell, the agent teleports to a fresh start, and the goal channel DISAPPEARS:
the unshuffle phase must be solved from the GRU's memory of the walkthrough.
obs["goal"] carries the phase flag (0 walkthrough / 1 unshuffle).

Actions: MoveAhead, RotateLeft, RotateRight, Pickup, Drop.
Success: Drop while holding and within success_dist of the goal cell.
Metrics: per-episode success, "spl"-style efficiency (shortest pick+place path over
steps taken), episode_len — the same schema as the nav envs.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from embodied_clip_tpu.envs.gridworld import _DIR_VECS, _ROT

__all__ = ["GridRearrangeEnv", "GridRearrangeState", "GridTwoPhaseRearrangeEnv",
           "GridTwoPhaseState", "REARRANGE_ACTIONS"]

REARRANGE_ACTIONS = ("MoveAhead", "RotateLeft", "RotateRight", "Pickup", "Drop")
MOVE_AHEAD, ROTATE_LEFT, ROTATE_RIGHT, PICKUP, DROP = range(5)


@struct.dataclass
class GridRearrangeState:
    key: jnp.ndarray          # (B, 2) uint32
    agent_pos: jnp.ndarray    # (B, 2)
    agent_dir: jnp.ndarray    # (B,)
    obj_pos: jnp.ndarray      # (B, 2) current object cell (ignored while held)
    goal_pos: jnp.ndarray     # (B, 2) target cell
    holding: jnp.ndarray      # (B,) bool
    t: jnp.ndarray            # (B,)
    best_len: jnp.ndarray     # (B,) shortest pick+place path length (for efficiency)


@dataclasses.dataclass(frozen=True)
class GridRearrangeEnv:
    size: int = 8
    max_steps: int = 96
    view: int = 7
    success_dist: int = 1
    step_penalty: float = -0.01
    shaping: float = 0.2
    pickup_reward: float = 2.0
    success_reward: float = 10.0
    flat_obs: bool = False

    @property
    def num_actions(self) -> int:
        return len(REARRANGE_ACTIONS)

    @property
    def obs_channels(self) -> int:
        # channels: in-bounds, object-here, goal-here, holding-flag (broadcast)
        return 4

    # --------------------------------------------------------------------- episode

    def _init_episode(self, key):
        ks = jax.random.split(key, 4)
        agent = jax.random.randint(ks[0], (2,), 0, self.size)
        obj = jax.random.randint(ks[1], (2,), 0, self.size)
        goal = jax.random.randint(ks[2], (2,), 0, self.size)
        best = (jnp.abs(agent - obj).sum() + jnp.abs(obj - goal).sum())
        return (agent.astype(jnp.int32), jax.random.randint(ks[3], (), 0, 4).astype(jnp.int32),
                obj.astype(jnp.int32), goal.astype(jnp.int32),
                jnp.maximum(best, 1).astype(jnp.int32))

    def reset(self, key, batch: int) -> Tuple[GridRearrangeState, Dict[str, jnp.ndarray]]:
        keys = jax.random.split(key, batch)
        nxt = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
        init = jax.vmap(self._init_episode)(nxt[:, 0])
        state = GridRearrangeState(
            key=nxt[:, 1], agent_pos=init[0], agent_dir=init[1],
            obj_pos=init[2], goal_pos=init[3],
            holding=jnp.zeros(batch, bool), t=jnp.zeros(batch, jnp.int32),
            best_len=init[4],
        )
        return state, self.observe(state)

    # ----------------------------------------------------------------- observation

    def observe(self, s: GridRearrangeState) -> Dict[str, jnp.ndarray]:
        b = s.agent_pos.shape[0]
        r = self.view // 2
        fwd = jnp.arange(self.view, dtype=jnp.int32)[::-1] - r
        rgt = jnp.arange(self.view, dtype=jnp.int32) - r
        ego = jnp.stack(jnp.meshgrid(fwd, rgt, indexing="ij"), -1)
        world = jnp.einsum("vwe,bed->bvwd", ego, _ROT[s.agent_dir]) \
            + s.agent_pos[:, None, None, :]
        in_b = ((world >= 0) & (world < self.size)).all(-1).astype(jnp.float32)
        obj_here = ((world == s.obj_pos[:, None, None, :]).all(-1)
                    & ~s.holding[:, None, None]).astype(jnp.float32) * in_b
        goal_here = (world == s.goal_pos[:, None, None, :]).all(-1).astype(jnp.float32) * in_b
        hold = jnp.broadcast_to(
            s.holding[:, None, None].astype(jnp.float32), in_b.shape
        )
        visual = jnp.stack([in_b, obj_here, goal_here, hold], -1)
        if self.flat_obs:
            visual = visual.reshape(b, -1)
        return {"visual": visual, "goal": jnp.zeros((b,), jnp.int32)}

    # ---------------------------------------------------------------------- expert

    def expert_action(self, s: GridRearrangeState) -> jnp.ndarray:
        """Greedy two-phase oracle: go to object → Pickup; go to goal → Drop."""
        target = jnp.where(s.holding[:, None], s.goal_pos, s.obj_pos)
        d = target - s.agent_pos
        dist = jnp.abs(d).sum(-1)
        at_target = dist <= self.success_dist
        want_y = jnp.abs(d[:, 0]) >= jnp.abs(d[:, 1])
        dir_y = jnp.where(d[:, 0] < 0, 0, 2)
        dir_x = jnp.where(d[:, 1] > 0, 1, 3)
        desired = jnp.where(want_y & (d[:, 0] != 0), dir_y,
                            jnp.where(d[:, 1] != 0, dir_x, dir_y))
        diff = (desired - s.agent_dir) % 4
        turn = jnp.where(diff == 3, ROTATE_LEFT, ROTATE_RIGHT)
        move = jnp.where(diff == 0, MOVE_AHEAD, turn)
        interact = jnp.where(s.holding, DROP, PICKUP)
        return jnp.where(at_target, interact, move).astype(jnp.int32)

    # ------------------------------------------------------------------------ step

    def step(self, s: GridRearrangeState, action: jnp.ndarray):
        target = jnp.where(s.holding[:, None], s.goal_pos, s.obj_pos)
        d_prev = jnp.abs(target - s.agent_pos).sum(-1)

        delta = _DIR_VECS[s.agent_dir]
        moved = jnp.clip(s.agent_pos + delta, 0, self.size - 1)
        new_pos = jnp.where((action == MOVE_AHEAD)[:, None], moved, s.agent_pos)
        new_dir = (s.agent_dir
                   + jnp.where(action == ROTATE_LEFT, -1, 0)
                   + jnp.where(action == ROTATE_RIGHT, 1, 0)) % 4

        near_obj = jnp.abs(s.obj_pos - new_pos).sum(-1) <= self.success_dist
        pickup_ok = (action == PICKUP) & ~s.holding & near_obj
        new_holding = s.holding | pickup_ok

        near_goal = jnp.abs(s.goal_pos - new_pos).sum(-1) <= self.success_dist
        success = (action == DROP) & s.holding & near_goal
        # An off-target Drop puts the object at the agent's cell.
        dropped_off = (action == DROP) & s.holding & ~near_goal
        new_obj_pos = jnp.where(dropped_off[:, None], new_pos, s.obj_pos)
        new_holding = new_holding & ~(action == DROP)

        stepped = s.replace(agent_pos=new_pos.astype(jnp.int32),
                            agent_dir=new_dir.astype(jnp.int32),
                            obj_pos=new_obj_pos.astype(jnp.int32),
                            holding=new_holding, t=s.t + 1)

        target2 = jnp.where(stepped.holding[:, None], stepped.goal_pos, stepped.obj_pos)
        d_new = jnp.abs(target2 - stepped.agent_pos).sum(-1)
        timeout = stepped.t >= self.max_steps
        done = success | timeout

        shaping_delta = jnp.where(
            s.holding == stepped.holding, (d_prev - d_new).astype(jnp.float32), 0.0
        )
        reward = (self.step_penalty
                  + self.shaping * shaping_delta
                  + self.pickup_reward * pickup_ok.astype(jnp.float32)
                  + self.success_reward * success.astype(jnp.float32))

        ep_len = stepped.t.astype(jnp.float32)
        eff = success.astype(jnp.float32) * (
            s.best_len.astype(jnp.float32)
            / jnp.maximum(ep_len, s.best_len.astype(jnp.float32))
        )

        nxt = jax.vmap(lambda k: jax.random.split(k, 2))(stepped.key)
        init = jax.vmap(self._init_episode)(nxt[:, 0])
        fresh = GridRearrangeState(
            key=nxt[:, 1], agent_pos=init[0], agent_dir=init[1],
            obj_pos=init[2], goal_pos=init[3],
            holding=jnp.zeros_like(stepped.holding),
            t=jnp.zeros_like(stepped.t), best_len=init[4],
        )
        sel = lambda a, b: jnp.where(done.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
        new_state = jax.tree.map(sel, fresh, stepped)

        info = {"success": success.astype(jnp.float32), "spl": eff,
                "episode_len": ep_len, "done": done.astype(jnp.float32)}
        return new_state, self.observe(new_state), reward, done, info


@struct.dataclass
class GridTwoPhaseState:
    key: jnp.ndarray          # (B, 2) uint32
    agent_pos: jnp.ndarray    # (B, 2)
    agent_dir: jnp.ndarray    # (B,)
    obj_pos: jnp.ndarray      # (B, 2) current object cell (= goal during walkthrough)
    goal_pos: jnp.ndarray     # (B, 2) target cell
    holding: jnp.ndarray      # (B,) bool
    t: jnp.ndarray            # (B,) unshuffle-phase step count
    walk_t: jnp.ndarray       # (B,) walkthrough-phase step count
    phase: jnp.ndarray        # (B,) int32: 0 = walkthrough, 1 = unshuffle
    best_len: jnp.ndarray     # (B,) shortest pick+place path (set at phase switch)


@dataclasses.dataclass(frozen=True)
class GridTwoPhaseRearrangeEnv:
    """2-phase walkthrough→unshuffle rearrangement, jittable (see module doc).

    Phase 0: the object sits ON its goal cell and the goal channel is visible;
    only navigation acts (Pickup inert; Drop ends the walkthrough, as does the
    budget). Phase switch: object teleports to a random cell, agent teleports
    to a fresh start, goal channel goes dark. Phase 1: the 1-phase dynamics,
    solved from memory. obs["goal"] = phase (0/1), riding the policy's
    goal-class embedding (num_classes = 2)."""

    size: int = 8
    max_steps: int = 96
    walkthrough_budget: int = 24
    view: int = 7
    success_dist: int = 1
    step_penalty: float = -0.01
    shaping: float = 0.2
    pickup_reward: float = 2.0
    success_reward: float = 10.0
    flat_obs: bool = False
    num_classes: int = 2  # the phase flag rides the goal embedding

    @property
    def num_actions(self) -> int:
        return len(REARRANGE_ACTIONS)

    @property
    def obs_channels(self) -> int:
        return 4  # in-bounds, object-here, goal-here (walkthrough only), holding

    # --------------------------------------------------------------------- episode

    def _init_episode(self, key):
        ks = jax.random.split(key, 3)
        agent = jax.random.randint(ks[0], (2,), 0, self.size)
        goal = jax.random.randint(ks[1], (2,), 0, self.size)
        # walkthrough starts with the scene in its GOAL configuration
        return (agent.astype(jnp.int32),
                jax.random.randint(ks[2], (), 0, 4).astype(jnp.int32),
                goal.astype(jnp.int32))

    def reset(self, key, batch: int) -> Tuple[GridTwoPhaseState, Dict[str, jnp.ndarray]]:
        keys = jax.random.split(key, batch)
        nxt = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
        agent, adir, goal = jax.vmap(self._init_episode)(nxt[:, 0])
        state = GridTwoPhaseState(
            key=nxt[:, 1], agent_pos=agent, agent_dir=adir,
            obj_pos=goal, goal_pos=goal,
            holding=jnp.zeros(batch, bool),
            t=jnp.zeros(batch, jnp.int32), walk_t=jnp.zeros(batch, jnp.int32),
            phase=jnp.zeros(batch, jnp.int32),
            best_len=jnp.ones(batch, jnp.int32),
        )
        return state, self.observe(state)

    # ----------------------------------------------------------------- observation

    def observe(self, s: GridTwoPhaseState) -> Dict[str, jnp.ndarray]:
        b = s.agent_pos.shape[0]
        r = self.view // 2
        fwd = jnp.arange(self.view, dtype=jnp.int32)[::-1] - r
        rgt = jnp.arange(self.view, dtype=jnp.int32) - r
        ego = jnp.stack(jnp.meshgrid(fwd, rgt, indexing="ij"), -1)
        world = jnp.einsum("vwe,bed->bvwd", ego, _ROT[s.agent_dir]) \
            + s.agent_pos[:, None, None, :]
        in_b = ((world >= 0) & (world < self.size)).all(-1).astype(jnp.float32)
        obj_here = ((world == s.obj_pos[:, None, None, :]).all(-1)
                    & ~s.holding[:, None, None]).astype(jnp.float32) * in_b
        # the goal channel is only lit during the walkthrough — the unshuffle
        # phase must run on the GRU's memory of it
        walk = (s.phase == 0)[:, None, None].astype(jnp.float32)
        goal_here = (world == s.goal_pos[:, None, None, :]).all(-1) \
            .astype(jnp.float32) * in_b * walk
        hold = jnp.broadcast_to(
            s.holding[:, None, None].astype(jnp.float32), in_b.shape)
        visual = jnp.stack([in_b, obj_here, goal_here, hold], -1)
        if self.flat_obs:
            visual = visual.reshape(b, -1)
        return {"visual": visual, "goal": s.phase.astype(jnp.int32)}

    # ---------------------------------------------------------------------- expert

    def expert_action(self, s: GridTwoPhaseState) -> jnp.ndarray:
        """Walkthrough: navigate TO the goal cell — the demonstration gathers
        the information the unshuffle labels rely on (the goal channel lit at
        the view center, with the boundary pattern for localization) — then
        Drop to end the phase. Unshuffle: the greedy 1-phase oracle — go to
        object → Pickup; go to goal → Drop. An expert that ended the
        walkthrough at step 1 would make the imitation target a function of
        state the observation stream never provided."""
        is_walk = (s.phase == 0)
        target = jnp.where(is_walk[:, None], s.goal_pos,
                           jnp.where(s.holding[:, None], s.goal_pos, s.obj_pos))
        d = target - s.agent_pos
        dist = jnp.abs(d).sum(-1)
        at_target = dist <= self.success_dist
        want_y = jnp.abs(d[:, 0]) >= jnp.abs(d[:, 1])
        dir_y = jnp.where(d[:, 0] < 0, 0, 2)
        dir_x = jnp.where(d[:, 1] > 0, 1, 3)
        desired = jnp.where(want_y & (d[:, 0] != 0), dir_y,
                            jnp.where(d[:, 1] != 0, dir_x, dir_y))
        diff = (desired - s.agent_dir) % 4
        turn = jnp.where(diff == 3, ROTATE_LEFT, ROTATE_RIGHT)
        move = jnp.where(diff == 0, MOVE_AHEAD, turn)
        # at-target interaction: walkthrough ends with Drop (inert while not
        # holding, ends the phase); unshuffle picks up / places.
        interact = jnp.where(is_walk | s.holding, DROP, PICKUP)
        return jnp.where(at_target, interact, move).astype(jnp.int32)

    # ------------------------------------------------------------------------ step

    def step(self, s: GridTwoPhaseState, action: jnp.ndarray):
        is_walk = s.phase == 0
        target = jnp.where(s.holding[:, None], s.goal_pos, s.obj_pos)
        d_prev = jnp.abs(target - s.agent_pos).sum(-1)

        # navigation applies in both phases
        delta = _DIR_VECS[s.agent_dir]
        moved = jnp.clip(s.agent_pos + delta, 0, self.size - 1)
        new_pos = jnp.where((action == MOVE_AHEAD)[:, None], moved, s.agent_pos)
        new_dir = (s.agent_dir
                   + jnp.where(action == ROTATE_LEFT, -1, 0)
                   + jnp.where(action == ROTATE_RIGHT, 1, 0)) % 4

        # interactions act only in the unshuffle phase
        near_obj = jnp.abs(s.obj_pos - new_pos).sum(-1) <= self.success_dist
        pickup_ok = (action == PICKUP) & ~s.holding & near_obj & ~is_walk
        new_holding = s.holding | pickup_ok
        near_goal = jnp.abs(s.goal_pos - new_pos).sum(-1) <= self.success_dist
        success = (action == DROP) & s.holding & near_goal & ~is_walk
        dropped_off = (action == DROP) & s.holding & ~near_goal & ~is_walk
        new_obj_pos = jnp.where(dropped_off[:, None], new_pos, s.obj_pos)
        new_holding = new_holding & ~(action == DROP)

        # walkthrough → unshuffle switch: Drop ends the phase, budget forces it
        new_walk_t = jnp.where(is_walk, s.walk_t + 1, s.walk_t)
        end_walk = is_walk & ((action == DROP)
                              | (new_walk_t >= self.walkthrough_budget))
        ks = jax.vmap(lambda k: jax.random.split(k, 4))(s.key)
        shuf_obj = jax.vmap(
            lambda k: jax.random.randint(k, (2,), 0, self.size))(ks[:, 0]) \
            .astype(jnp.int32)
        shuf_agent = jax.vmap(
            lambda k: jax.random.randint(k, (2,), 0, self.size))(ks[:, 1]) \
            .astype(jnp.int32)
        shuf_dir = jax.vmap(
            lambda k: jax.random.randint(k, (), 0, 4))(ks[:, 2]).astype(jnp.int32)
        best = (jnp.abs(shuf_agent - shuf_obj).sum(-1)
                + jnp.abs(shuf_obj - s.goal_pos).sum(-1))
        ew = end_walk[:, None]
        stepped = s.replace(
            key=jnp.where(ew, ks[:, 3], s.key),
            agent_pos=jnp.where(ew, shuf_agent, new_pos).astype(jnp.int32),
            agent_dir=jnp.where(end_walk, shuf_dir, new_dir).astype(jnp.int32),
            obj_pos=jnp.where(ew, shuf_obj, new_obj_pos).astype(jnp.int32),
            holding=new_holding & ~end_walk,
            t=jnp.where(is_walk, s.t, s.t + 1),
            walk_t=new_walk_t,
            phase=jnp.where(end_walk, 1, s.phase).astype(jnp.int32),
            best_len=jnp.where(end_walk, jnp.maximum(best, 1), s.best_len)
            .astype(jnp.int32),
        )

        target2 = jnp.where(stepped.holding[:, None], stepped.goal_pos,
                            stepped.obj_pos)
        d_new = jnp.abs(target2 - stepped.agent_pos).sum(-1)
        timeout = (stepped.phase == 1) & (stepped.t >= self.max_steps)
        done = success | timeout

        # reward only in the unshuffle phase (the walkthrough is unrewarded
        # exploration, like the upstream task)
        shaping_delta = jnp.where(
            (s.holding == stepped.holding) & ~is_walk & ~end_walk,
            (d_prev - d_new).astype(jnp.float32), 0.0)
        reward = jnp.where(
            is_walk, 0.0,
            self.step_penalty
            + self.shaping * shaping_delta
            + self.pickup_reward * pickup_ok.astype(jnp.float32)
            + self.success_reward * success.astype(jnp.float32))

        ep_len = stepped.t.astype(jnp.float32)
        eff = success.astype(jnp.float32) * (
            stepped.best_len.astype(jnp.float32)
            / jnp.maximum(ep_len, stepped.best_len.astype(jnp.float32)))

        nxt = jax.vmap(lambda k: jax.random.split(k, 2))(stepped.key)
        agent, adir, goal = jax.vmap(self._init_episode)(nxt[:, 0])
        fresh = GridTwoPhaseState(
            key=nxt[:, 1], agent_pos=agent, agent_dir=adir,
            obj_pos=goal, goal_pos=goal,
            holding=jnp.zeros_like(stepped.holding),
            t=jnp.zeros_like(stepped.t), walk_t=jnp.zeros_like(stepped.walk_t),
            phase=jnp.zeros_like(stepped.phase),
            best_len=jnp.ones_like(stepped.best_len),
        )
        sel = lambda a, b: jnp.where(done.reshape((-1,) + (1,) * (a.ndim - 1)), a, b)
        new_state = jax.tree.map(sel, fresh, stepped)

        info = {"success": success.astype(jnp.float32), "spl": eff,
                "episode_len": ep_len, "done": done.astype(jnp.float32)}
        return new_state, self.observe(new_state), reward, done, info
