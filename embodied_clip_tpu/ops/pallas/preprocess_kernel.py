"""Pallas TPU kernel: fused uint8 → resized/quantized/normalized preprocessing.

One kernel per image replaces the XLA lowering of ops/preprocess.py (two einsums +
four elementwise passes) and keeps every intermediate in VMEM: HBM traffic drops to
"read 270KB uint8, write the normalized output" per frame.

Layout trick: channels stay interleaved. The width-pass matrix is Kron(Ww, I₃) —
shape (OW·3, W·3) — so both resize passes are plain 2-D matmuls on (H, W·3) blocks
and the kernel needs no transposes or strided slicing (which Mosaic lanes dislike):

    x   (H, W·3)  u8 → f32 (0..255 domain)
    a = x @ Kron(Ww,I₃)ᵀ      → (H, OW·3)     then PIL-grid quantize
    b = Wh @ a                 → (OH, OW·3)    then PIL-grid quantize
    out = b · inv_scale − shift → compute dtype (normalize folded per channel)

Numerics identical to ops/preprocess.py (pil_exact path, full-precision matmuls).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from embodied_clip_tpu.ops.resize import resize_plan

__all__ = ["fused_preprocess_pallas", "pallas_preprocess_available"]


def pallas_preprocess_available() -> bool:
    return jax.default_backend() in ("tpu", "cpu")  # cpu via interpret mode


@functools.lru_cache(maxsize=16)
def _plan(in_hw, size, method):
    wh, ww = resize_plan(in_hw, size, (size, size), method)
    ww3 = np.kron(ww, np.eye(3, dtype=np.float32)).astype(np.float32)  # (OW*3, W*3)
    return wh, ww3


def _kernel(x_ref, wh_ref, ww3t_ref, inv_ref, shift_ref, out_ref, *, out_dtype):
    hi = jax.lax.Precision.DEFAULT  # bf16 MACs; the uint8-grid quantize absorbs the error
    # Mosaic has no direct u8→f32 cast; widen via int32 first.
    x = x_ref[0].astype(jnp.int32).astype(jnp.float32)     # (H, W*3), 0..255
    a = jax.lax.dot(x, ww3t_ref[...], precision=hi,
                    preferred_element_type=jnp.float32)    # (H, OW*3)
    a = jnp.clip(jnp.round(a), 0.0, 255.0)                 # PIL per-pass uint8 grid
    b = jax.lax.dot(wh_ref[...], a, precision=hi,
                    preferred_element_type=jnp.float32)    # (OH, OW*3)
    b = jnp.clip(jnp.round(b), 0.0, 255.0)
    out = b * inv_ref[...] - shift_ref[...]                # normalize, broadcast (1, OW*3)
    out_ref[0] = out.astype(out_dtype)


def fused_preprocess_pallas(frames: jnp.ndarray, size: int, mean, std,
                            method: str = "bicubic", dtype=jnp.bfloat16,
                            interpret: bool = False) -> jnp.ndarray:
    """uint8 NHWC frames → normalized (N, size, size, 3) in `dtype`, one fused kernel.

    Matches Preprocessor(pil_exact=True) to f32 rounding; requires uint8 input and a
    non-trivial resize.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert frames.dtype == jnp.uint8, "fused preprocess expects raw uint8 frames"
    n, h, w, c = frames.shape
    assert c == 3
    wh, ww3 = _plan((h, w), size, method)
    oh, ow3 = size, size * 3

    # Channel constants tiled across width: layout is (w0c0 w0c1 w0c2 w1c0 ...).
    inv = np.tile(1.0 / (255.0 * np.asarray(std, np.float32)), size).reshape(1, ow3)
    shift = np.tile(np.asarray(mean, np.float32) / np.asarray(std, np.float32),
                    size).reshape(1, ow3)

    kernel = functools.partial(_kernel, out_dtype=dtype)
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w * 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((oh, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w * 3, ow3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ow3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ow3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, oh, ow3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, oh, ow3), dtype),
        interpret=interpret,
    )(
        frames.reshape(n, h, w * 3),
        jnp.asarray(wh),
        jnp.asarray(ww3.T),
        jnp.asarray(inv),
        jnp.asarray(shift),
    )
    return out.reshape(n, oh, size, 3)
