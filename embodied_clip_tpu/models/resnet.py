"""ImageNet-style ResNet encoders (flax/NHWC), torchvision-weight-compatible.

Fills the reference's role of `torchvision.models.resnet50` truncated before
avgpool/fc (reference thor_image_features.py:46-48): `apply` returns the final
conv feature map (N,7,7,2048 at 224px); pooled heads live in `encoders.py`.

Design notes (TPU-first):
  - NHWC layout end to end — XLA:TPU's native conv layout; no transposes.
  - BatchNorm runs on running statistics when `train=False`, matching the reference's
    freeze recipe (requires_grad=False + momentum 0 + eval(),
    thor_image_features.py:26-33). Trainable-from-scratch variants (the habitat
    "scratch" baselines) use `train=True` with mutable batch_stats.
  - `dtype` selects the compute dtype (bf16 for throughput); params and BN statistics
    stay f32.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["ResNet", "resnet18", "resnet50", "RESNET_CONFIGS"]


class _ConvBN(nn.Module):
    features: int
    kernel: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    # folded=True: frozen BN pre-folded into conv weights/bias (ops/fold_bn.py).
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.kernel // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=self.folded,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.folded:
            return x
        # BN statistics/affine in f32 even under a bf16 trunk: the per-channel affine is
        # cheap, fuses into the conv epilogue, and protects the 1e-3 fidelity bound.
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )(x)
        return x.astype(self.dtype)


class BasicBlock(nn.Module):
    """2×3x3 block (ResNet-18/34)."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        cb = lambda f, k, s, name: _ConvBN(f, k, s, self.dtype, self.folded, name=name)
        out = cb(self.features, 3, self.stride, "cb1")(x, train)
        out = nn.relu(out)
        out = cb(self.features, 3, 1, "cb2")(out, train)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = cb(self.features, 1, self.stride, "down")(x, train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    """1x1 → 3x3(stride) → 1x1(×4) block — torchvision's v1.5 stride placement."""

    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    expansion: int = 4
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out_feats = self.features * self.expansion
        cb = lambda f, k, s, name: _ConvBN(f, k, s, self.dtype, self.folded, name=name)
        out = nn.relu(cb(self.features, 1, 1, "cb1")(x, train))
        out = nn.relu(cb(self.features, 3, self.stride, "cb2")(out, train))
        out = cb(out_feats, 1, 1, "cb3")(out, train)
        if self.stride != 1 or x.shape[-1] != out_feats:
            identity = cb(out_feats, 1, self.stride, "down")(x, train)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """Trunk only: stem + 4 stages; returns the NHWC conv feature map."""

    stage_sizes: Sequence[int]
    block: str = "bottleneck"  # or "basic"
    width: int = 64
    dtype: jnp.dtype = jnp.float32
    folded: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        assert not (self.folded and train), "folded trunks are inference-only"
        x = x.astype(self.dtype)
        x = _ConvBN(self.width, 7, 2, self.dtype, self.folded, name="stem")(x, train)
        x = nn.relu(x)
        # torchvision maxpool: 3x3 stride 2 pad 1.
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        block_cls = Bottleneck if self.block == "bottleneck" else BasicBlock
        for stage, n_blocks in enumerate(self.stage_sizes):
            feats = self.width * (2 ** stage)
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                x = block_cls(feats, stride, self.dtype, folded=self.folded,
                              name=f"layer{stage + 1}_{b}")(x, train)
        return x


RESNET_CONFIGS = {
    "resnet18": dict(stage_sizes=(2, 2, 2, 2), block="basic"),
    "resnet50": dict(stage_sizes=(3, 4, 6, 3), block="bottleneck"),
}


def resnet18(dtype=jnp.float32) -> ResNet:
    return ResNet(dtype=dtype, **RESNET_CONFIGS["resnet18"])


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet(dtype=dtype, **RESNET_CONFIGS["resnet50"])
