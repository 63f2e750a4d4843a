"""CLIP's modified ResNet visual encoder (flax/NHWC) with attention pooling.

Functional equivalent of the `visual` tower of openai/CLIP RN50/RN50x16 that the
reference loads frozen (thor_image_features.py:57-68). Architecture (vs torchvision
ResNet): 3-conv stem with a 2x2 average-pool (no maxpool), average-pool "anti-aliased"
downsampling inside bottlenecks and shortcuts, and a multi-head attention pool
(AttentionPool2d) instead of global average pooling.

The reference detaches attnpool to expose the 2048×7×7 conv map and applies
attnpool/avgpool separately (thor_image_features.py:62-67) — mirrored here by
`ModifiedResNet` returning the conv map and `AttentionPool2d` being a separate module.

TPU notes: NHWC; BN/attention-softmax in f32 under a bf16 trunk; the attention pool is
a single 50-token MHA — one fused attention, no flash/SP machinery needed.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["ModifiedResNet", "AttentionPool2d", "CLIP_RESNET_CONFIGS"]


def _avg_pool(x, k: int):
    return nn.avg_pool(x, (k, k), strides=(k, k))


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    # folded=True: frozen BN pre-folded into conv weights/bias (ops/fold_bn.py) —
    # inference-only graphs run pure conv+bias in the compute dtype.
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=self.folded, dtype=self.dtype, name="conv",
        )(x)
        if self.folded:
            return x
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32, name="bn",
        )(x)
        return x.astype(self.dtype)


class CLIPBottleneck(nn.Module):
    """Bottleneck where all convs are stride-1; downsampling is an explicit avg-pool
    before conv3 and in the shortcut (CLIP's anti-aliased design)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        out_feats = self.features * self.expansion
        cb = lambda f, k, name: _ConvBN(f, k, 1, self.dtype, self.folded, name=name)
        out = nn.relu(cb(self.features, 1, "cb1")(x, train))
        out = nn.relu(cb(self.features, 3, "cb2")(out, train))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = cb(out_feats, 1, "cb3")(out, train)

        identity = x
        if self.stride > 1 or x.shape[-1] != out_feats:
            if self.stride > 1:
                identity = _avg_pool(identity, self.stride)
            identity = cb(out_feats, 1, "down")(identity, train)
        return nn.relu(out + identity)


class ModifiedResNet(nn.Module):
    """Trunk: 3-conv stem + avgpool, 4 bottleneck stages; returns NHWC conv map
    (N,7,7,2048 for RN50 at 224px)."""

    stage_sizes: Sequence[int]
    width: int = 64
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not (self.folded and train), "folded trunks are inference-only"
        x = x.astype(self.dtype)
        cb = lambda f, s, name: _ConvBN(f, 3, s, self.dtype, self.folded, name=name)
        x = nn.relu(cb(self.width // 2, 2, "stem1")(x, train))
        x = nn.relu(cb(self.width // 2, 1, "stem2")(x, train))
        x = nn.relu(cb(self.width, 1, "stem3")(x, train))
        x = _avg_pool(x, 2)
        for stage, n_blocks in enumerate(self.stage_sizes):
            feats = self.width * (2 ** stage)
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = CLIPBottleneck(feats, stride, self.dtype, folded=self.folded,
                                   name=f"layer{stage + 1}_{b}")(x, train)
        return x


class _LinearParams(nn.Module):
    """torch-Linear-layout (in, out) kernel + bias params with nn.Dense's names and
    initializers, returned raw so the caller can apply them in reassociated einsums
    (AttentionPool2d needs W_k/W_v/W_c transposed-and-reshaped, which Dense can't
    express). Param tree is bit-identical to nn.Dense's: {kernel, bias}."""

    in_features: int
    out_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.in_features, self.out_features))
        bias = self.param("bias", nn.initializers.zeros_init(), (self.out_features,))
        return kernel, bias


class AttentionPool2d(nn.Module):
    """CLIP's attention pooling over the conv map.

    Tokens = [mean, 7×7 cells] + learned positional embedding; a single multi-head
    attention where only the mean token queries (mathematically identical to querying
    all tokens and keeping token 0, which is what the pinned CLIP commit computes).
    Separate q/k/v/c projections, torch-Linear layout.

    Since only token 0 queries, the K/V projections of all T tokens are never
    materialized (that would be the pool's entire FLOP cost, ~214 GFLOP at batch
    128 for RN50 — measured 0.6 ms/batch on v5e). Instead the matmuls are
    reassociated around the single query:
      logits[n,h,j] = Σ_e q[n,h,e]·(x̃[n,j]W_k)[h,e] = Σ_d x̃[n,j,d]·U[n,h,d],
                      U = q·W_kᵀ  (per head)
      out = ((Σ_j attn[n,h,j]·x̃[n,j])·W_v + b_v)·W_c + b_c
    The k bias is constant over j → softmax-invariant → dropped. Exact same math
    (fp reassociation only), O(T·c·heads) instead of O(T·c²).
    """

    num_heads: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        tokens = x.reshape(n, h * w, c)
        mean_tok = jnp.mean(tokens, axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_tok, tokens], axis=1)  # (n, hw+1, c)
        pos = self.param(
            "positional_embedding",
            lambda key, shape: jax.random.normal(key, shape) / (c ** 0.5),
            (h * w + 1, c),
        )
        tokens = tokens + pos[None].astype(tokens.dtype)

        H = self.num_heads
        e = c // H
        dt = self.dtype
        wq, bq = _LinearParams(c, c, name="q_proj")()
        wk, _bk = _LinearParams(c, c, name="k_proj")()  # b_k softmax-invariant
        wv, bv = _LinearParams(c, c, name="v_proj")()
        wc, bc = _LinearParams(c, self.output_dim, name="c_proj")()

        q = tokens[:, 0].astype(dt) @ wq.astype(dt) + bq.astype(dt)
        q = (q / (e ** 0.5)).reshape(n, H, e)
        u = jnp.einsum("nhe,dhe->nhd", q, wk.reshape(c, H, e).astype(dt),
                       preferred_element_type=jnp.float32)
        logits = jnp.einsum("njd,nhd->nhj", tokens, u.astype(dt),
                            preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(logits, axis=-1)  # f32
        pooled = jnp.einsum("nhj,njd->nhd", attn.astype(dt), tokens,
                            preferred_element_type=jnp.float32)
        vh = jnp.einsum("nhd,dhe->nhe", pooled.astype(dt),
                        wv.reshape(c, H, e).astype(dt),
                        preferred_element_type=jnp.float32)
        vh = vh + bv.reshape(H, e)  # f32; c_proj stays f32 (precision island)
        out = jnp.einsum("nhe,heo->no", vh,
                         wc.reshape(H, e, self.output_dim).astype(jnp.float32))
        return (out + bc).astype(dt)


CLIP_RESNET_CONFIGS = {
    # name: (stage_sizes, width, embed_dim=width*32, heads, output_dim, image_size)
    "RN50": dict(stage_sizes=(3, 4, 6, 3), width=64, num_heads=32, output_dim=1024, image_size=224),
    "RN50x16": dict(stage_sizes=(6, 8, 18, 8), width=96, num_heads=48, output_dim=768, image_size=384),
    # Smoke-scale config: exercises the full ModifiedResNet code path (stem, 4
    # stages, attnpool) at CPU-test cost. Not a reference model.
    "RNtiny": dict(stage_sizes=(1, 1, 1, 1), width=8, num_heads=4, output_dim=16, image_size=128),
}
