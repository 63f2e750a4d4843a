"""Fused uint8-frame → normalized-tensor preprocessing, inside the jitted graph.

Behavioral spec (SURVEY.md §2.2; reference thor_image_features.py:36-44 + pinned
openai/CLIP preprocess):

  - ImageNet path: Resize(224, BICUBIC) → CenterCrop(224) → ToTensor →
    Normalize(mean=[0.485,0.456,0.406], std=[0.229,0.224,0.225])
  - CLIP path: Resize(n, BICUBIC) → CenterCrop(n) → RGB → [0,1] →
    Normalize(CLIP mean/std); n = 224 for RN50/ViT-B/32, 384 for RN50x16.

The reference runs this per-frame on host (PIL) then ships f32 to device
(thor_image_features.py:100-108). Here the raw uint8 NHWC batch is shipped once and the
whole pipeline — scale, PIL-parity bicubic resize (two matmuls, see ops/resize.py),
center crop (folded into the resize matrices), normalize, dtype cast — runs on-chip and
fuses with the encoder's first conv.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from embodied_clip_tpu import constants
from embodied_clip_tpu.ops.resize import apply_resize, resize_plan


@dataclasses.dataclass(frozen=True)
class Preprocessor:
    """A static preprocessing plan; `__call__` is pure and jit-traceable."""

    size: int
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]
    method: str = "bicubic"
    dtype: jnp.dtype = jnp.float32
    # Emulate PIL's per-pass uint8 round/clip for bit-faithful reference parity
    # (see ops/resize.py). Disable for maximum-accuracy float filtering.
    pil_exact: bool = True
    # 'bfloat16' trades ≤1 LSB pixel error for ~6x cheaper resize matmuls (rollouts).
    resize_matmul_dtype: str = "float32"
    # Run the whole pipeline as ONE pallas kernel (ops/pallas/preprocess_kernel.py):
    # both resize passes + quantize + normalize stay in VMEM, no HBM intermediates.
    # Requires uint8 input with an actual resize; falls back to the XLA path otherwise.
    use_pallas: bool = False

    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        """uint8/float NHWC (or HWC) frames → normalized NHWC in self.dtype.

        Also accepts the flat-channels layout (n, h, w*3) — the device layout
        the fused pallas kernel consumes directly. Shipping frames flat (a free
        host-side reshape of a contiguous NHWC buffer) removes the on-device
        uint8 relayout copy XLA otherwise inserts in front of the kernel
        (~0.15 ms at batch 128; STATUS.md perf log)."""
        flat = frames.ndim == 3 and frames.shape[-1] != 3
        if flat:
            n, h, w3 = frames.shape
            assert w3 % 3 == 0, f"flat frames last dim must be w*3, got {w3}"
            frames = frames.reshape(n, h, w3 // 3, 3)
        squeeze = frames.ndim == 3
        if squeeze:
            frames = frames[None]
        n, h, w, c = frames.shape
        import jax

        if (self.use_pallas and frames.dtype == jnp.uint8
                and (h, w) != (self.size, self.size)
                and jax.default_backend() == "tpu"):
            from embodied_clip_tpu.ops.pallas.preprocess_kernel import (
                fused_preprocess_pallas,
            )

            # The kernel consumes (n, h, w*3); reshape(reshape(flat)) cancels,
            # so flat callers reach it relayout-free.
            out = fused_preprocess_pallas(
                frames, self.size, self.mean, self.std, self.method, self.dtype
            )
            return out[0] if squeeze else out
        # Filter in f32 regardless of output dtype: the weights are row-stochastic so
        # f32 accumulation keeps us within the 1e-3 feature-fidelity envelope even when
        # the encoder itself runs bf16.
        is_u8 = frames.dtype == jnp.uint8
        x = frames.astype(jnp.float32)
        if is_u8:
            x = x / 255.0
        if (h, w) != (self.size, self.size):
            wh, ww = resize_plan((h, w), self.size, (self.size, self.size), self.method)
            mm_dtype = jnp.bfloat16 if self.resize_matmul_dtype == "bfloat16" else None
            x = apply_resize(x, wh, ww, pil_exact=self.pil_exact and is_u8,
                             matmul_dtype=mm_dtype)
        mean = jnp.asarray(np.array(self.mean, dtype=np.float32))
        std = jnp.asarray(np.array(self.std, dtype=np.float32))
        x = (x - mean) / std
        x = x.astype(self.dtype)
        return x[0] if squeeze else x


def make_preprocessor(kind: str, size: int = 224, dtype=jnp.float32) -> Preprocessor:
    """kind ∈ {'imagenet', 'clip'} — the two reference constant sets."""
    if kind == "imagenet":
        return Preprocessor(size, constants.IMAGENET_MEAN, constants.IMAGENET_STD, dtype=dtype)
    if kind == "clip":
        return Preprocessor(size, constants.CLIP_MEAN, constants.CLIP_STD, dtype=dtype)
    raise ValueError(f"unknown preprocessor kind: {kind!r}")
