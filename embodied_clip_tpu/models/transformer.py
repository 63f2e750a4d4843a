"""CLIP transformer blocks (flax), shared by the ViT visual tower and text tower.

Pre-LN residual attention blocks with QuickGELU (x·σ(1.702x)) and a fused-QKV
projection, matching openai/CLIP's `ResidualAttentionBlock` semantics (the pinned dep
of reference environment.yml:22). LayerNorm and attention softmax run in f32 under a
bf16 compute dtype.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ResidualAttentionBlock", "Transformer", "quick_gelu"]


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class MultiHeadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible: fused in-proj, out-proj."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        n, t, c = x.shape
        head_dim = c // self.num_heads
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(n, t, self.num_heads, head_dim)
        k = k.reshape(n, t, self.num_heads, head_dim)
        v = v.reshape(n, t, self.num_heads, head_dim)
        # f32 accumulation pinned on the logits dot (MXU accumulates f32
        # anyway; without preferred_element_type the output would round to
        # bf16 BEFORE the f32 softmax, defeating the precision policy —
        # same pattern as AttentionPool2d's einsums).
        logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits / (head_dim ** 0.5)
        if mask is not None:
            logits = logits + mask.astype(jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v,
                         preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).reshape(n, t, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        c = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x).astype(self.dtype)
        x = x + MultiHeadAttention(self.num_heads, self.dtype, name="attn")(y, mask)
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x).astype(self.dtype)
        y = nn.Dense(4 * c, dtype=self.dtype, name="mlp_fc")(y)
        y = quick_gelu(y)
        x = x + nn.Dense(c, dtype=self.dtype, name="mlp_proj")(y)
        return x


class Transformer(nn.Module):
    layers: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, x, mask=None):
        block = ResidualAttentionBlock
        if self.remat:
            block = nn.remat(block, static_argnums=())
        for i in range(self.layers):
            x = block(self.num_heads, self.dtype, name=f"block{i}")(x, mask)
        return x
