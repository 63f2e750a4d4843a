"""CLIP ViT visual tower (flax/NHWC) — ViT-B/32 per BASELINE.json's model set.

Patch-embed conv (no bias) → [class token; patches] + positional embedding → ln_pre →
pre-LN transformer → ln_post on the class token → linear projection to the shared
embedding space. Functional equivalent of openai/CLIP `VisionTransformer` (pinned dep
of reference environment.yml:22).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from embodied_clip_tpu.models.transformer import Transformer

__all__ = ["VisionTransformer", "CLIP_VIT_CONFIGS"]


class VisionTransformer(nn.Module):
    patch_size: int
    width: int
    layers: int
    num_heads: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        n, h, w, c = x.shape
        grid = (h // self.patch_size) * (w // self.patch_size)
        x = nn.Conv(
            self.width, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            padding="VALID", use_bias=False, dtype=self.dtype, name="patch_embed",
        )(x)
        x = x.reshape(n, grid, self.width)
        scale = self.width ** -0.5
        cls = self.param("class_embedding", lambda k, s: scale * jax.random.normal(k, s), (self.width,))
        pos = self.param("positional_embedding", lambda k, s: scale * jax.random.normal(k, s), (grid + 1, self.width))
        x = jnp.concatenate([jnp.broadcast_to(cls.astype(x.dtype), (n, 1, self.width)), x], axis=1)
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_pre")(x).astype(self.dtype)
        x = Transformer(self.layers, self.num_heads, self.dtype, name="transformer")(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_post")(x[:, 0])
        proj = self.param("proj", lambda k, s: scale * jax.random.normal(k, s), (self.width, self.output_dim))
        return (x @ proj).astype(self.dtype)


CLIP_VIT_CONFIGS = {
    "ViT-B/32": dict(patch_size=32, width=768, layers=12, num_heads=12, output_dim=512, image_size=224),
    # Smoke-scale ViT (full code path, CPU-test cost; not a paper model).
    "ViTtiny": dict(patch_size=16, width=32, layers=2, num_heads=4, output_dim=16, image_size=64),
}
