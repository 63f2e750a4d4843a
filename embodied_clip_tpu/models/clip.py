"""CLIP model assembly: visual tower + text tower + contrastive head.

Covers the model set the reference uses: RN50 (headline), RN50x16
(imagenet_vs_objectnav.md:11), ViT-B/32 (BASELINE.json model set). The reference
always uses CLIP *frozen* (thor_image_features.py:57-68); training-side freezing is
`jax.lax.stop_gradient` on features + `train=False` BN semantics.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from embodied_clip_tpu.models.clip_resnet import (
    CLIP_RESNET_CONFIGS,
    AttentionPool2d,
    ModifiedResNet,
)
from embodied_clip_tpu.models.clip_text import CLIP_TEXT_CONFIGS, TextTransformer
from embodied_clip_tpu.models.clip_vit import CLIP_VIT_CONFIGS, VisionTransformer

__all__ = ["CLIP", "CLIPVisual", "build_clip", "build_visual", "CLIP_MODELS"]

CLIP_MODELS = ("RN50", "RN50x16", "ViT-B/32")


class CLIPVisual(nn.Module):
    """Visual tower exposing the reference's three feature views in one pass:
    conv map, avgpool, attnpool/embed (thor_image_features.py:103-113)."""

    model_name: str
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    def setup(self):
        if self.model_name in CLIP_RESNET_CONFIGS:
            cfg = CLIP_RESNET_CONFIGS[self.model_name]
            self.trunk = ModifiedResNet(cfg["stage_sizes"], cfg["width"], self.dtype,
                                        folded=self.folded)
            self.attnpool = AttentionPool2d(cfg["num_heads"], cfg["output_dim"], self.dtype)
            self.is_vit = False
        elif self.model_name in CLIP_VIT_CONFIGS:
            cfg = {k: v for k, v in CLIP_VIT_CONFIGS[self.model_name].items() if k != "image_size"}
            self.vit = VisionTransformer(dtype=self.dtype, **cfg)
            self.is_vit = True
        else:
            raise ValueError(f"unknown CLIP visual: {self.model_name}")

    def __call__(self, x, train: bool = False):
        """Returns dict: ResNets → {conv, avgpool, embed}; ViT → {embed}."""
        if self.is_vit:
            return {"embed": self.vit(x, train)}
        conv = self.trunk(x, train)
        avg = jnp.mean(conv.astype(jnp.float32), axis=(1, 2)).astype(conv.dtype)
        return {"conv": conv, "avgpool": avg, "embed": self.attnpool(conv)}

    def embed(self, x, train: bool = False):
        return self(x, train)["embed"]


class CLIP(nn.Module):
    """Full dual-tower CLIP with contrastive logits."""

    model_name: str
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.visual = CLIPVisual(self.model_name, self.dtype)
        self.text = TextTransformer(dtype=self.dtype, **CLIP_TEXT_CONFIGS[self.model_name])
        self.logit_scale = self.param(
            "logit_scale", lambda k, s: jnp.full(s, np.log(1 / 0.07), jnp.float32), ()
        )

    def encode_image(self, images, train: bool = False):
        return self.visual.embed(images, train)

    def encode_text(self, tokens):
        return self.text(tokens)

    def __call__(self, images, tokens, train: bool = False):
        img = self.encode_image(images, train).astype(jnp.float32)
        txt = self.encode_text(tokens).astype(jnp.float32)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits_per_image = scale * img @ txt.T
        return logits_per_image, logits_per_image.T


@dataclasses.dataclass
class BuiltModel:
    module: nn.Module
    params: Any
    batch_stats: Optional[Any]
    image_size: int

    @property
    def variables(self):
        v = {"params": self.params}
        if self.batch_stats is not None:
            v["batch_stats"] = self.batch_stats
        return v


def image_size_of(name: str) -> int:
    if name in CLIP_RESNET_CONFIGS:
        return CLIP_RESNET_CONFIGS[name]["image_size"]
    return CLIP_VIT_CONFIGS[name]["image_size"]


def build_visual(name: str, dtype=jnp.float32, seed: int = 0) -> BuiltModel:
    module = CLIPVisual(name, dtype)
    size = image_size_of(name)
    variables = module.init(
        jax.random.PRNGKey(seed), jnp.zeros((1, size, size, 3), dtype), train=False
    )
    return BuiltModel(module, variables["params"], variables.get("batch_stats"), size)


def build_clip(name: str, dtype=jnp.float32, seed: int = 0, context_length: int = 77) -> BuiltModel:
    module = CLIP(name, dtype)
    size = image_size_of(name)
    variables = module.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, size, size, 3), dtype),
        jnp.zeros((1, context_length), jnp.int32),
        train=False,
    )
    return BuiltModel(module, variables["params"], variables.get("batch_stats"), size)
