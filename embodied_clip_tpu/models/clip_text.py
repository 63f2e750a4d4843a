"""CLIP text tower (flax) — powers zero-shot ObjectNav goal embeddings
(reference readme_files/zeroshot_objectnav.md:17-32).

Token embedding + positional embedding → causal pre-LN transformer → ln_final →
features at each sequence's EOT position (argmax of token ids — EOT is the largest id
in CLIP's BPE vocab) → text projection. Functional equivalent of the text half of
openai/CLIP (pinned dep of reference environment.yml:22).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from embodied_clip_tpu.models.transformer import Transformer

__all__ = ["TextTransformer", "CLIP_TEXT_CONFIGS"]


class TextTransformer(nn.Module):
    vocab_size: int = 49408
    context_length: int = 77
    width: int = 512
    layers: int = 12
    num_heads: int = 8
    output_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        n, t = tokens.shape
        emb = nn.Embed(self.vocab_size, self.width, dtype=self.dtype, name="token_embedding")
        x = emb(tokens)
        pos = self.param(
            "positional_embedding",
            lambda k, s: 0.01 * jax.random.normal(k, s),
            (self.context_length, self.width),
        )
        x = x + pos[None, :t].astype(x.dtype)
        causal = jnp.triu(jnp.full((t, t), -jnp.inf, dtype=jnp.float32), k=1)
        x = Transformer(self.layers, self.num_heads, self.dtype, name="transformer")(x, causal)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_final")(x)
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(n), eot]
        proj = self.param(
            "text_projection",
            lambda k, s: (self.width ** -0.5) * jax.random.normal(k, s),
            (self.width, self.output_dim),
        )
        return (x @ proj).astype(self.dtype)


CLIP_TEXT_CONFIGS = {
    "RN50": dict(width=512, layers=12, num_heads=8, output_dim=1024),
    "RN50x16": dict(width=768, layers=12, num_heads=12, output_dim=768),
    "ViT-B/32": dict(width=512, layers=12, num_heads=8, output_dim=512),
}
