"""The released RoboTHOR ObjectNav actor-critic (allenact architecture) + a
weight converter for the published checkpoints.

The reference's eval contract is "download the released `.pt`, eval it"
(readme_files/baselines_robothor_objectnav.md:54-68). Those checkpoints hold
allenact v0.5.0's `ResnetTensorNavActorCritic` — a DIFFERENT architecture from
this repo's native `ActorCritic` (which is a declared functional equivalent,
not a weight-compatible clone): the allenact model tiles the goal embedding
over the 7×7 frozen-CLIP conv grid and fuses it with 1×1 convs BEFORE
flattening, and runs a torch `nn.GRU` belief encoder. The released ObjectNav
configs train with `add_prev_actions=False`; checkpoints trained WITH it are
also supported (a `prev_action_embedder.fc` embedding whose output appends to
the GRU input after the visual features — allenact's FeatureEmbedding indexes
row 0 at episode starts and `action+1` otherwise, which this module derives
from the framework's prev-action sentinel `num_actions`).

This module is a flax functional equivalent of that released architecture with
a 1:1 parameter mapping, so the published state_dicts load exactly:

  goal_visual_encoder.embed_goal.weight            -> embed_goal (nn.Embed)
  goal_visual_encoder.resnet_compressor.{0,2}      -> compress1/compress2 (1×1)
  goal_visual_encoder.target_obs_combiner.{0,2}    -> combine1/combine2 (1×1)
  state_encoders.single_belief.rnn.*_l0            -> gru (flax GRUCell)
  actor.linear / critic.fc                         -> actor / critic

Note the asymmetric head naming: allenact's `LinearActorHead` registers its
layer as `self.linear` but `LinearCriticHead` registers `self.fc`, so the
released state_dicts carry `actor.linear.*` and `critic.fc.*`. The converter
also accepts `critic.linear.*` as a fallback for re-exported checkpoints.

Conversion subtleties (see `convert_allenact_state_dict`):
  * torch flattens the combiner output CHW; this module is NHWC — the GRU
    input-weight columns are permuted from CHW-flat to HWC-flat order.
  * torch GRU packs weight_ih_l0 rows as [r; z; n] and carries two bias sets;
    flax GRUCell sums input+recurrent gates, so b_ir+b_hr fold into ir.bias
    (gate math is otherwise identical — verified against a torch oracle in
    tests/test_allenact_policy.py).

The module exposes the same (obs, h, is_start) -> (logits, value, h) surface
as models/policy.ActorCritic, so `evaluate_policy_host` and the CLI eval path
drive either interchangeably (`--override policy_arch=allenact`).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["AllenActResnetPolicy", "convert_allenact_state_dict",
           "load_allenact_checkpoint"]


class AllenActResnetPolicy(nn.Module):
    """allenact `ResnetTensorNavActorCritic`, NHWC/flax.

    Consumes the frozen conv feature map (B, G, G, C) — e.g. CLIP RN50's
    (B, 7, 7, 2048) — and an integer goal class id, exactly like the released
    RoboTHOR ObjectNav models (baselines_robothor_objectnav.md:58-64).
    """

    num_actions: int = 6
    num_goal_classes: int = 12
    goal_dims: int = 32
    compressor_dims: Tuple[int, int] = (128, 32)
    combiner_dims: Tuple[int, int] = (128, 32)
    hidden: int = 512
    prev_action_embed_dims: int = 0  # >0 only for add_prev_actions checkpoints
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.embed_goal = nn.Embed(self.num_goal_classes, self.goal_dims,
                                   dtype=self.dtype)
        if self.prev_action_embed_dims:
            # allenact FeatureEmbedding: nn.Embedding(n_actions+1, E); row 0
            # is the episode-start null, row a+1 embeds action a.
            self.embed_prev_action = nn.Embed(
                self.num_actions + 1, self.prev_action_embed_dims,
                dtype=self.dtype)
        c1, c2 = self.compressor_dims
        k1, k2 = self.combiner_dims
        conv = lambda f, name: nn.Conv(f, (1, 1), dtype=self.dtype, name=name)
        self.compress1 = conv(c1, "compress1")
        self.compress2 = conv(c2, "compress2")
        self.combine1 = conv(k1, "combine1")
        self.combine2 = conv(k2, "combine2")
        self.gru = nn.GRUCell(features=self.hidden, dtype=self.dtype)
        self.actor = nn.Dense(self.num_actions, dtype=jnp.float32)
        self.critic = nn.Dense(1, dtype=jnp.float32)

    def _features(self, obs: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        v = obs["visual"].astype(self.dtype)          # (B, G, G, C)
        x = nn.relu(self.compress2(nn.relu(self.compress1(v))))
        g = self.embed_goal(obs["goal"].astype(jnp.int32))   # (B, D)
        g = jnp.broadcast_to(g[:, None, None, :],
                             x.shape[:3] + (self.goal_dims,))
        # channel order [compressed, goal] matches torch's cat(dim=1)
        x = self.combine2(nn.relu(self.combine1(
            jnp.concatenate([x, g], axis=-1))))
        flat = x.reshape(x.shape[0], -1)              # HWC-flat (see converter)
        if self.prev_action_embed_dims:
            # framework sentinel (prev_action == num_actions at episode start
            # / worker respawn) -> allenact's null row 0; action a -> row a+1.
            pa = obs["prev_action"].astype(jnp.int32)
            idx = jnp.where(pa >= self.num_actions, 0, pa + 1)
            flat = jnp.concatenate(
                [flat, self.embed_prev_action(idx).astype(flat.dtype)], -1)
        return flat

    def __call__(self, obs: Dict[str, jnp.ndarray], h: jnp.ndarray,
                 done: Optional[jnp.ndarray] = None):
        if done is not None:
            h = jnp.where(done[:, None], jnp.zeros_like(h), h)
        x = self._features(obs)
        h, out = self.gru(h, x)
        logits = self.actor(out.astype(jnp.float32))
        value = self.critic(out.astype(jnp.float32))[..., 0]
        return logits, value, h

    def initial_state(self, batch: int) -> jnp.ndarray:
        return jnp.zeros((batch, self.hidden), self.dtype)

    # unroll building blocks — same protocol as models/policy.unroll_policy
    def features(self, obs):
        return self._features(obs)

    def gru_step(self, x, h, done):
        h = jnp.where(done[:, None], jnp.zeros_like(h), h)
        return self.gru(h, x)

    def heads(self, out):
        logits = self.actor(out.astype(jnp.float32))
        value = self.critic(out.astype(jnp.float32))[..., 0]
        return logits, value


def _conv_kernel(w) -> np.ndarray:
    """torch Conv2d weight (O, I, 1, 1) -> flax (1, 1, I, O)."""
    w = np.asarray(w)
    return w.transpose(2, 3, 1, 0)


def _chw_to_hwc_perm(c: int, g: int) -> np.ndarray:
    """Column permutation taking torch's CHW-flat feature index to this
    module's HWC-flat index: perm[hwc_index] = chw_index."""
    idx = np.arange(c * g * g).reshape(c, g, g)       # chw layout
    return idx.transpose(1, 2, 0).reshape(-1)          # read out in hwc order


def convert_allenact_state_dict(state_dict: Dict[str, "np.ndarray"],
                                grid: int = 7) -> Dict:
    """allenact ResnetTensorNavActorCritic state_dict -> AllenActResnetPolicy
    params. Accepts the raw model state_dict or the full checkpoint dict
    (allenact saves {"model_state_dict": ..., ...}). Tensors may be torch
    tensors or numpy arrays. `grid` is the conv-map side (7 for RN50@224)."""
    if "model_state_dict" in state_dict:
        state_dict = state_dict["model_state_dict"]
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "detach") else v)
          for k, v in state_dict.items()}

    pre = "goal_visual_encoder."
    # allenact v0.5.x basic_models: LinearActorHead -> self.linear, but
    # LinearCriticHead -> self.fc. Released .pt files therefore carry
    # critic.fc.*; accept critic.linear.* as a fallback for re-exports.
    critic_key = "critic.fc" if "critic.fc.weight" in sd else "critic.linear"
    required = [
        f"{pre}embed_goal.weight",
        f"{pre}resnet_compressor.0.weight", f"{pre}resnet_compressor.0.bias",
        f"{pre}resnet_compressor.2.weight", f"{pre}resnet_compressor.2.bias",
        f"{pre}target_obs_combiner.0.weight", f"{pre}target_obs_combiner.0.bias",
        f"{pre}target_obs_combiner.2.weight", f"{pre}target_obs_combiner.2.bias",
        "state_encoders.single_belief.rnn.weight_ih_l0",
        "state_encoders.single_belief.rnn.weight_hh_l0",
        "state_encoders.single_belief.rnn.bias_ih_l0",
        "state_encoders.single_belief.rnn.bias_hh_l0",
        "actor.linear.weight", "actor.linear.bias",
        f"{critic_key}.weight", f"{critic_key}.bias",
    ]
    missing = [k for k in required if k not in sd]
    if missing:
        raise ValueError(
            f"state_dict is not a ResnetTensorNavActorCritic checkpoint — "
            f"missing keys {missing[:4]}{'…' if len(missing) > 4 else ''}")
    # add_prev_actions=True checkpoints carry a FeatureEmbedding
    # (prev_action_embedder.fc: nn.Embedding(num_actions+1, E)) whose output
    # torch-cats AFTER the visual features on the GRU input.
    pa_w = sd.get("prev_action_embedder.fc.weight")
    pa_dims = int(pa_w.shape[1]) if pa_w is not None and pa_w.size else 0

    wih = sd["state_encoders.single_belief.rnn.weight_ih_l0"]  # (3H, F)
    whh = sd["state_encoders.single_belief.rnn.weight_hh_l0"]  # (3H, H)
    bih = sd["state_encoders.single_belief.rnn.bias_ih_l0"]    # (3H,)
    bhh = sd["state_encoders.single_belief.rnn.bias_hh_l0"]
    hidden = whh.shape[1]
    feat = wih.shape[1]
    combiner_out = sd[f"{pre}target_obs_combiner.2.weight"].shape[0]
    vis_cols = combiner_out * grid * grid
    if feat != vis_cols + pa_dims:
        raise ValueError(
            f"GRU input width {feat} != combiner_out*grid² + prev_action_dims "
            f"({combiner_out}*{grid}² + {pa_dims}) — wrong grid for this "
            "checkpoint")
    # torch CHW flatten -> our HWC flatten: permute the visual input-weight
    # columns; prev-action embed columns (if any) follow in order either way.
    perm = np.concatenate([_chw_to_hwc_perm(combiner_out, grid),
                           np.arange(vis_cols, feat)])
    w_r, w_z, w_n = (w[:, perm] for w in np.split(wih, 3, axis=0))
    h_r, h_z, h_n = np.split(whh, 3, axis=0)
    bi_r, bi_z, bi_n = np.split(bih, 3)
    bh_r, bh_z, bh_n = np.split(bhh, 3)

    gru = {
        "ir": {"kernel": w_r.T, "bias": bi_r + bh_r},
        "iz": {"kernel": w_z.T, "bias": bi_z + bh_z},
        "in": {"kernel": w_n.T, "bias": bi_n},
        "hr": {"kernel": h_r.T},
        "hz": {"kernel": h_z.T},
        "hn": {"kernel": h_n.T, "bias": bh_n},
    }
    params = {
        "embed_goal": {"embedding": sd[f"{pre}embed_goal.weight"]},
        "compress1": {"kernel": _conv_kernel(sd[f"{pre}resnet_compressor.0.weight"]),
                      "bias": sd[f"{pre}resnet_compressor.0.bias"]},
        "compress2": {"kernel": _conv_kernel(sd[f"{pre}resnet_compressor.2.weight"]),
                      "bias": sd[f"{pre}resnet_compressor.2.bias"]},
        "combine1": {"kernel": _conv_kernel(sd[f"{pre}target_obs_combiner.0.weight"]),
                     "bias": sd[f"{pre}target_obs_combiner.0.bias"]},
        "combine2": {"kernel": _conv_kernel(sd[f"{pre}target_obs_combiner.2.weight"]),
                     "bias": sd[f"{pre}target_obs_combiner.2.bias"]},
        "gru": gru,
        "actor": {"kernel": sd["actor.linear.weight"].T,
                  "bias": sd["actor.linear.bias"]},
        "critic": {"kernel": sd[f"{critic_key}.weight"].T,
                   "bias": sd[f"{critic_key}.bias"]},
    }
    if pa_dims:
        if pa_w.shape[0] != sd["actor.linear.weight"].shape[0] + 1:
            raise ValueError(
                f"prev_action_embedder rows {pa_w.shape[0]} != num_actions+1 "
                f"({sd['actor.linear.weight'].shape[0]}+1)")
        params["embed_prev_action"] = {"embedding": pa_w}
    meta = dict(
        num_actions=int(sd["actor.linear.weight"].shape[0]),
        num_goal_classes=int(sd[f"{pre}embed_goal.weight"].shape[0]),
        goal_dims=int(sd[f"{pre}embed_goal.weight"].shape[1]),
        compressor_dims=(int(sd[f"{pre}resnet_compressor.0.weight"].shape[0]),
                         int(sd[f"{pre}resnet_compressor.2.weight"].shape[0])),
        combiner_dims=(int(sd[f"{pre}target_obs_combiner.0.weight"].shape[0]),
                       int(sd[f"{pre}target_obs_combiner.2.weight"].shape[0])),
        hidden=int(hidden),
        prev_action_embed_dims=pa_dims,
    )
    params = jax.tree.map(jnp.asarray, params)
    return {"params": params, "config": meta}


def load_allenact_checkpoint(path: str, grid: int = 7) -> Dict:
    """Load a released allenact `.pt` checkpoint (torch serialization) and
    convert it. Returns {"params", "config"}; build the module with
    AllenActResnetPolicy(**config)."""
    import torch  # host-side only; torch-cpu is a data-compat dependency

    raw = torch.load(path, map_location="cpu", weights_only=False)
    return convert_allenact_state_dict(raw, grid=grid)
