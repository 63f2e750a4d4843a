"""Goal-conditioned recurrent actor-critic policies.

Functional equivalent of the allenact/habitat-lab CLIP navigation policies the
reference's RL suites use (BASELINE.json north star: "CLIP feature-compressor CNN +
GRU + actor/critic heads"; entry configs at baselines_robothor_objectnav.md:48-51):
frozen visual features (2048×7×7 CLIP conv map) → small trainable compressor CNN →
concat goal embedding (+ previous action) → single-layer GRU → categorical actor +
scalar critic.

Goal conditioning variants (one policy class, selected by `goal_kind`):
  object_embed  learned embedding of the target object class (ObjectNav)
  pointgoal     linear embed of polar target coordinates (PointNav,
                baselines_habitat.md:63-75)
  text_embed    frozen CLIP text goal embedding → linear adapter (zero-shot
                ObjectNav, readme_files/zeroshot_objectnav.md:17)
  none          unconditioned (Rearrangement-style IL)

TPU notes: the policy consumes visual features NHWC; the GRU unrolls with `lax.scan`
(hidden state reset at episode boundaries via the done mask); everything is a pure
function of (params, inputs) so rollout and PPO-update share one unroll definition.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ActorCritic", "GOAL_KINDS"]

GOAL_KINDS = ("object_embed", "pointgoal", "text_embed", "none")


class VisualCompressor(nn.Module):
    """Trainable CNN over the frozen conv map (the allenact-style compressor)."""

    mid: int = 128
    out: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.relu(nn.Conv(self.mid, (1, 1), dtype=self.dtype, name="reduce")(x))
        x = nn.relu(nn.Conv(self.out, (3, 3), padding="SAME", dtype=self.dtype, name="mix")(x))
        return x.reshape(x.shape[0], -1)


class ScratchCNN(nn.Module):
    """Small from-scratch visual encoder trained end-to-end on raw frames — the
    habitat "scratch" baselines (ddppo_objectnav_rgb[d], baselines_habitat.md:75,
    'visual encoder is trained from scratch'). Habitat-SimpleCNN-shaped: 3 strided
    convs → flatten → Dense."""

    out: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if x.dtype == jnp.uint8:
            x = x.astype(self.dtype) / 255.0
        x = x.astype(self.dtype)
        x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4), dtype=self.dtype, name="c1")(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2), dtype=self.dtype, name="c2")(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(2, 2), dtype=self.dtype, name="c3")(x))
        x = x.reshape(x.shape[0], -1)
        return nn.relu(nn.Dense(self.out, dtype=self.dtype, name="fc")(x))


class ActorCritic(nn.Module):
    num_actions: int
    goal_kind: str = "object_embed"
    num_goal_classes: int = 12        # RoboTHOR ObjectNav vocabulary size
    goal_input_dim: int = 1024        # text_embed / pointgoal input width
    goal_dim: int = 32
    hidden: int = 512
    use_prev_action: bool = True
    visual_is_map: bool = True        # conv map vs flat feature vector
    # Train the visual encoder from scratch on raw frames (habitat scratch baselines);
    # overrides visual_is_map.
    scratch_cnn: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        assert self.goal_kind in GOAL_KINDS
        if self.scratch_cnn:
            self.scratch = ScratchCNN(dtype=self.dtype)
        elif self.visual_is_map:
            self.compressor = VisualCompressor(dtype=self.dtype)
        else:
            self.visual_fc = nn.Dense(512, dtype=self.dtype)
        if self.goal_kind == "object_embed":
            self.goal_embed = nn.Embed(self.num_goal_classes, self.goal_dim, dtype=self.dtype)
        elif self.goal_kind in ("pointgoal", "text_embed"):
            self.goal_fc = nn.Dense(self.goal_dim, dtype=self.dtype)
        if self.use_prev_action:
            # +1 slot: "no previous action" at episode starts.
            self.prev_action_embed = nn.Embed(self.num_actions + 1, 6, dtype=self.dtype)
        self.gru = nn.GRUCell(features=self.hidden, dtype=self.dtype)
        self.actor = nn.Dense(self.num_actions, dtype=jnp.float32)
        self.critic = nn.Dense(1, dtype=jnp.float32)

    def _features(self, obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        parts = []
        v = obs["visual"]
        if self.scratch_cnn:
            # RGBD (habitat ddppo_*_rgbd baselines): concat the depth channel onto the
            # frames before the trainable CNN.
            if "depth" in obs:
                depth = obs["depth"].astype(self.dtype)
                if v.dtype == jnp.uint8:
                    v = v.astype(self.dtype) / 255.0
                v = jnp.concatenate([v.astype(self.dtype), depth], axis=-1)
            parts.append(self.scratch(v))
        elif self.visual_is_map:
            # RGBD with a FROZEN encoder (habitat rgbd exp-configs,
            # baselines_habitat.md:75): the depth sensor bypasses the RGB
            # encoder — downsample it to the conv-map grid and concat as an
            # extra channel on the trainable compressor's input, so depth is
            # consumed (not silently dropped) and stays trainable end-to-end.
            if "depth" in obs:
                d = obs["depth"].astype(self.dtype)
                d = jax.image.resize(
                    d, (d.shape[0], v.shape[1], v.shape[2], d.shape[-1]),
                    method="linear")
                v = jnp.concatenate([v.astype(self.dtype), d], axis=-1)
            parts.append(self.compressor(v))
        else:
            parts.append(nn.relu(self.visual_fc(v.astype(self.dtype))))
        if self.goal_kind == "object_embed":
            parts.append(self.goal_embed(obs["goal"].astype(jnp.int32)))
        elif self.goal_kind in ("pointgoal", "text_embed"):
            g = obs["goal"].astype(self.dtype)
            # Frozen text goals must not backprop into CLIP (zero-shot recipe).
            if self.goal_kind == "text_embed":
                g = jax.lax.stop_gradient(g)
            parts.append(self.goal_fc(g))
        if self.use_prev_action:
            parts.append(self.prev_action_embed(obs["prev_action"].astype(jnp.int32)))
        return jnp.concatenate(parts, axis=-1)

    def __call__(self, obs: Dict[str, jnp.ndarray], h: jnp.ndarray,
                 done: Optional[jnp.ndarray] = None):
        """Single step: (obs batch, hidden) → (action logits, value, new hidden).

        `done` marks episode starts: hidden state is zeroed BEFORE the step, the
        recurrent-policy boundary handling DD-PPO depends on.
        """
        if done is not None:
            h = jnp.where(done[:, None], jnp.zeros_like(h), h)
        x = self._features(obs)
        h, out = self.gru(h, x)
        logits = self.actor(out.astype(jnp.float32))
        value = self.critic(out.astype(jnp.float32))[..., 0]
        return logits, value, h

    def initial_state(self, batch: int) -> jnp.ndarray:
        return jnp.zeros((batch, self.hidden), self.dtype)

    # -- unroll building blocks (see unroll_policy): only the GRU is recurrent,
    # so features and heads run batched over the flattened (T·B) sequence.

    def features(self, obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        return self._features(obs)

    def gru_step(self, x: jnp.ndarray, h: jnp.ndarray, done: jnp.ndarray):
        h = jnp.where(done[:, None], jnp.zeros_like(h), h)
        return self.gru(h, x)

    def heads(self, out: jnp.ndarray):
        logits = self.actor(out.astype(jnp.float32))
        value = self.critic(out.astype(jnp.float32))[..., 0]
        return logits, value


def unroll_policy(apply_fn, params, obs_seq: Dict[str, jnp.ndarray], h0: jnp.ndarray,
                  done_seq: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Unroll a policy over T steps.

    obs_seq: pytree of (T, B, ...); done_seq: (T, B) episode-start markers (hidden
    reset before those steps). Returns (logits (T,B,A), values (T,B), hT). Rollout
    collection and the PPO update's recomputation share this single definition —
    guaranteeing the recurrent state the learner sees matches what acted.

    Only the GRU recurrence runs under lax.scan; the visual compressor, goal /
    prev-action embeds, and actor/critic heads are not recurrent, so they run once
    over the flattened (T·B) batch — one large MXU-friendly pass instead of T
    small ones (same math; the per-step path computes identical values).
    """
    T, B = done_seq.shape

    flat_obs = jax.tree.map(lambda t: t.reshape((T * B,) + t.shape[2:]), obs_seq)
    x = apply_fn({"params": params}, flat_obs, method="features")
    x_seq = x.reshape(T, B, -1)

    def step(h, inp):
        xt, done = inp
        h, out = apply_fn({"params": params}, xt, h, done, method="gru_step")
        return h, out

    hT, outs = jax.lax.scan(step, h0, (x_seq, done_seq))
    logits, values = apply_fn(
        {"params": params}, outs.reshape(T * B, -1), method="heads")
    return logits.reshape(T, B, -1), values.reshape(T, B), hT
