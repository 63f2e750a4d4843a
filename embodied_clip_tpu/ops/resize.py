"""PIL-parity separable image resampling as dense matmuls.

The reference preprocess (thor_image_features.py:36-44 and the pinned openai/CLIP
transform) resizes with PIL's antialiased BICUBIC filter. Bit-faithful features require
matching that filter, not a generic GPU/TPU resize. PIL's resample is separable: each
output row/column is a normalized weighted sum of input rows/columns, with the kernel
support widened by the downscale factor (antialiasing).

TPU-native design: the (out, in) weight matrices are tiny, static for a given shape, and
computed once on host in float64. The resize itself is then two dense matmuls —
`W_h @ img @ W_w^T` per channel — which XLA maps straight onto the MXU and fuses with the
surrounding normalize/cast. No gather, no dynamic shapes, no host round-trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _bicubic_kernel(x: np.ndarray, a: float = -0.5) -> np.ndarray:
    # Keys cubic kernel, a=-0.5 — identical to PIL's `bicubic_filter`.
    ax = np.abs(x)
    ax2 = ax * ax
    ax3 = ax2 * ax
    out = np.where(
        ax < 1.0,
        (a + 2.0) * ax3 - (a + 3.0) * ax2 + 1.0,
        np.where(ax < 2.0, a * (ax3 - 5.0 * ax2 + 8.0 * ax - 4.0), 0.0),
    )
    return out


def _bilinear_kernel(x: np.ndarray) -> np.ndarray:
    ax = np.abs(x)
    return np.maximum(0.0, 1.0 - ax)


_KERNELS = {
    "bicubic": (_bicubic_kernel, 2.0),
    "bilinear": (_bilinear_kernel, 1.0),
}


@functools.lru_cache(maxsize=64)
def resample_weights(in_size: int, out_size: int, method: str = "bicubic") -> np.ndarray:
    """(out_size, in_size) float32 row-stochastic resampling matrix, PIL semantics.

    Mirrors PIL's `precompute_coeffs`: kernel support scales with the downscale factor
    (antialias), window is clipped to the image, weights are normalized to sum to 1.
    """
    kernel, support = _KERNELS[method]
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    radius = support * filterscale

    w = np.zeros((out_size, in_size), dtype=np.float64)
    for i in range(out_size):
        center = (i + 0.5) * scale
        xmin = max(int(center - radius + 0.5), 0)
        xmax = min(int(center + radius + 0.5), in_size)
        xs = np.arange(xmin, xmax, dtype=np.float64)
        ws = kernel((xs + 0.5 - center) / filterscale)
        s = ws.sum()
        if s != 0.0:
            ws = ws / s
        w[i, xmin:xmax] = ws
    return w.astype(np.float32)


def resize_plan(
    in_hw: tuple[int, int],
    size: int | tuple[int, int],
    crop: tuple[int, int] | None = None,
    method: str = "bicubic",
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side plan: (Wh, Ww) matrices realizing resize(size) [+ center-crop].

    `size` as an int resizes the SHORT side to `size` preserving aspect ratio —
    torchvision `Resize(224)` semantics (reference thor_image_features.py:37). A center
    crop is folded into the matrices by slicing their output rows, so crop is free.
    """
    h, w = in_hw
    if isinstance(size, int):
        if h <= w:
            rh, rw = size, max(1, round(w * size / h))
        else:
            rh, rw = max(1, round(h * size / w)), size
    else:
        rh, rw = size
    wh = resample_weights(h, rh, method)
    ww = resample_weights(w, rw, method)
    if crop is not None:
        ch, cw = crop
        top = (rh - ch) // 2
        left = (rw - cw) // 2
        wh = wh[top : top + ch]
        ww = ww[left : left + cw]
    return wh, ww


def _quantize_u8(x: jnp.ndarray) -> jnp.ndarray:
    # PIL stores each separable pass back into a uint8 image: round + clip. Emulating
    # that grid (in [0,1] float) is what takes per-pixel parity from ~5e-2 worst-case
    # (bicubic overshoot gets clipped in PIL, not in a pure float pipeline) to <2/255.
    return jnp.clip(jnp.round(x * 255.0), 0.0, 255.0) * (1.0 / 255.0)


def apply_resize(
    x: jnp.ndarray,
    wh: np.ndarray,
    ww: np.ndarray,
    pil_exact: bool = True,
    dtype=jnp.float32,
    matmul_dtype=None,
) -> jnp.ndarray:
    """Apply a (Wh, Ww) resize plan to NHWC float images in [0,1].

    PIL order: horizontal (width) pass first, then vertical (height), quantizing to the
    uint8 grid after each pass when `pil_exact`. Both passes are dense matmuls on the
    MXU; the quantize is fused elementwise VPU work.

    Precision: TPU's default f32 "matmul" is a single reduced-precision bf16 pass, too
    coarse for PIL parity. With `pil_exact`, Precision.HIGH (bf16x3, error ~1e-7) is
    indistinguishable from full f32 after the uint8-grid quantize and 2x cheaper than
    HIGHEST; the float path keeps HIGHEST. `matmul_dtype=bfloat16` trades ≤1 LSB of
    per-pixel error for ~6x cheaper resize (inputs 0..255-scaled are exact in bf16;
    only the weights quantize) — for throughput-critical RL rollouts.
    """
    if matmul_dtype == jnp.bfloat16:
        prec = jax.lax.Precision.DEFAULT  # native bf16 MACs, f32 accumulation
        operand = jnp.bfloat16
    else:
        prec = jax.lax.Precision.HIGH if pil_exact else jax.lax.Precision.HIGHEST
        operand = jnp.float32

    def mm(eq, w, v):
        out = jnp.einsum(
            eq, jnp.asarray(w, operand), v.astype(operand),
            precision=prec, preferred_element_type=jnp.float32,
        )
        return out.astype(jnp.float32)

    x = mm("ow,nhwc->nhoc", ww, x)
    if pil_exact:
        x = _quantize_u8(x)
    x = mm("oh,nhwc->nowc", wh, x)
    if pil_exact:
        x = _quantize_u8(x)
    return x.astype(dtype)


def resize_bicubic(
    img: jnp.ndarray,
    size: int | tuple[int, int],
    crop: tuple[int, int] | None = None,
    method: str = "bicubic",
    dtype=jnp.float32,
    pil_exact: bool = True,
) -> jnp.ndarray:
    """Resize NHWC (or HWC) images with PIL-parity filtering; optionally center-crop.

    uint8 input is scaled to [0, 1] (torchvision ToTensor semantics) before filtering.
    """
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    n, h, w, c = img.shape
    # The height crop commutes with the width pass, so folding the crop into the plan
    # stays exact even with PIL's per-pass quantization.
    wh, ww = resize_plan((h, w), size, crop, method)
    x = img.astype(dtype)
    if img.dtype == jnp.uint8:
        x = x / 255.0
    else:
        pil_exact = False
    x = apply_resize(x, wh, ww, pil_exact=pil_exact, dtype=dtype)
    return x[0] if squeeze else x
