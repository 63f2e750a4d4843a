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


@functools.lru_cache(maxsize=16)
def _band_tiles(in_hw, size, method, n_tile=128, k_align=128):
    """Banded decomposition of the width-pass matmul: bicubic weights are zero
    outside a ~(4·scale)-pixel support, so for each 128-lane tile of output
    columns only a short, 128-aligned slice of input columns carries nonzeros.
    Skipping the all-zero K-tiles is exact and drops ~2/3 of the width-pass
    FLOPs at 300→224 (the kernel's dominant compute). Returns
    ((n0, n1, k0, k1), ...) over the (W·3 → OW·3) matrix."""
    _, ww3 = _plan(in_hw, size, method)
    wt = ww3.T  # (W*3, OW*3)
    k_dim, n_dim = wt.shape
    tiles = []
    for n0 in range(0, n_dim, n_tile):
        n1 = min(n0 + n_tile, n_dim)
        nz = np.nonzero(np.abs(wt[:, n0:n1]).sum(axis=1))[0]
        k0 = (int(nz[0]) // k_align) * k_align
        k1 = min(-(-(int(nz[-1]) + 1) // k_align) * k_align, k_dim)
        tiles.append((n0, n1, k0, k1))
    return tuple(tiles)


def _kernel(x_ref, wh_ref, ww3t_ref, inv_ref, shift_ref, out_ref, *,
            out_dtype, band_tiles):
    hi = jax.lax.Precision.DEFAULT  # bf16 MACs; the uint8-grid quantize absorbs the error
    g, h, w3 = x_ref.shape
    # Mosaic has no direct u8→f32 cast; widen via int32 first. The group's
    # images stack along M (rows are independent in the width pass), so g > 1
    # just widens every dot's M — no extra FLOPs.
    x = x_ref[...].astype(jnp.int32).astype(jnp.float32).reshape(g * h, w3)
    # Width pass as banded 128-lane tiles (_band_tiles): exact — the skipped
    # K-tiles are identically zero in the bicubic weight matrix.
    parts = [
        jax.lax.dot(x[:, k0:k1], ww3t_ref[k0:k1, n0:n1], precision=hi,
                    preferred_element_type=jnp.float32)
        for (n0, n1, k0, k1) in band_tiles
    ]
    a = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)  # (g·H, OW*3)
    a = jnp.clip(jnp.round(a), 0.0, 255.0)                 # PIL per-pass uint8 grid
    # Height pass stays dense per image: banding it (m-tiled Wh row blocks)
    # wedges the Mosaic compile on this runtime, and a block-diagonal
    # kron(I_g, Wh) form would g-plicate its ~90M FLOPs/frame. A static loop
    # of g dots keeps the FLOPs flat.
    for i in range(g):
        b = jax.lax.dot(wh_ref[...], a[i * h:(i + 1) * h], precision=hi,
                        preferred_element_type=jnp.float32)  # (OH, OW*3)
        b = jnp.clip(jnp.round(b), 0.0, 255.0)
        out = b * inv_ref[...] - shift_ref[...]            # normalize, broadcast (1, OW*3)
        out_ref[i] = out.astype(out_dtype)


def fused_preprocess_pallas(frames: jnp.ndarray, size: int, mean, std,
                            method: str = "bicubic", dtype=jnp.bfloat16,
                            interpret: bool = False) -> jnp.ndarray:
    """uint8 NHWC frames → normalized (N, size, size, 3) in `dtype`, one fused kernel.

    Matches Preprocessor(pil_exact=True) to f32 rounding; requires uint8 input and a
    non-trivial resize.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import os

    assert frames.dtype == jnp.uint8, "fused preprocess expects raw uint8 frames"
    n, h, w, c = frames.shape
    assert c == 3
    wh, ww3 = _plan((h, w), size, method)
    oh, ow3 = size, size * 3

    # Images per grid step (ECT_PP_GROUP): grouping widens the width-pass M
    # and cuts the grid-step count at zero extra FLOPs — but measured a ~1%
    # in-graph REGRESSION (g=1: 14,351 vs g=2: 14,196 / g=4: 14,215 frames/s;
    # STATUS.md round-4 log): per-image blocks already pipeline fully and the
    # bigger f32 temporaries hurt DMA overlap granularity. Default 1; the
    # knob stays for re-measurement on other TPU generations. Bounded by
    # VMEM: the f32 image block is g·H·W·3·4 B and must leave room for the
    # banded weight matrix + f32 width-pass output.
    g = int(os.environ.get("ECT_PP_GROUP", "1"))
    while g > 1 and (n % g or g * h * w * 3 * 4 > (9 << 20)):
        g -= 1

    # Channel constants tiled across width: layout is (w0c0 w0c1 w0c2 w1c0 ...).
    inv = np.tile(1.0 / (255.0 * np.asarray(std, np.float32)), size).reshape(1, ow3)
    shift = np.tile(np.asarray(mean, np.float32) / np.asarray(std, np.float32),
                    size).reshape(1, ow3)

    kernel = functools.partial(
        _kernel, out_dtype=dtype,
        band_tiles=_band_tiles((h, w), size, method))
    out = pl.pallas_call(
        kernel,
        grid=(n // g,),
        in_specs=[
            pl.BlockSpec((g, h, w * 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((oh, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w * 3, ow3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ow3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ow3), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, oh, ow3), lambda i: (i, 0, 0),
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
