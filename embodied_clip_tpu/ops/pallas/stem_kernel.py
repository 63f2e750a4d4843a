"""Pallas TPU kernel: CLIP stem3 conv as one im2col matmul + requant + pool.

Motivation (measured on v5e, batch 128, STATUS.md round-3 profile): stem3
(3x3 conv, 32->64 over 112^2) runs at ~30% bf16 MXU in XLA's conv emitter —
the C_in=32 contraction uses a quarter of the MXU's 128-deep K window. Folding
the 9 taps into the contraction (im2col: K = 9*32 = 288) lifts the cap to the
N=64 output-lane limit (~50%), and fusing the requant epilogue plus the exact
2x2 int8 mean-pool writes the pooled s8 tensor directly — HBM traffic is
"read stem2-out bf16, write pooled s8" with no 112^2 intermediate.

Numerics: bf16 products accumulated in f32 (same math as XLA's conv), then the
same +0.5/truncating requant as ops/quantize._requant with the relu folded
into the clip-at-0, then _avg_pool_int8's round-half-up integer mean. The f32
accumulation ORDER differs from the conv emitter's, so vs the XLA graph a tiny
fraction of elements can flip by one s8 step at requant ties (the same
contract as the fused stage-1 kernel; see tests/test_stem_kernel.py).

Status: experimental, default off (ECT_PALLAS_STEM=1) until measured faster
than the XLA fusion on real hardware — the prior fused-kernel experiments
(STATUS.md round-3 negative results) lost to XLA on halo-slice relayouts, and
this kernel's im2col build has the same risk profile.

Reference anchor: replaces the stem compute of thor_image_features.py:57-68's
frozen CLIP visual encoder (the serving hot path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from embodied_clip_tpu.ops.pallas.bottleneck_kernel import _unscale

__all__ = ["stem3_requant_pool_int8"]


def _kernel(x_ref, w_ref, b_ref, s_ref, out_ref, pad_ref, col_ref,
            *, h, w, cin, cout, bt, rc):
    f32 = jnp.float32
    # zero-padded halo for the 3x3 'SAME' window
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[:, 1:h + 1, 1:w + 1, :] = x_ref[...]

    # Row-chunked im2col + matmul: materializing the full (h*w, 9*cin) col
    # tensor plus its f32 matmul output blows the 16 MB scoped-VMEM limit at
    # 112^2, so each pass builds `rc` rows' col block into a reused scratch,
    # runs one matmul at full contraction depth (K = 9*cin), and writes that
    # chunk's pooled s8 rows.
    for r0 in range(0, h, rc):
        # 9 shifted views concatenated along channels
        for t in range(9):
            ky, kx = divmod(t, 3)
            col_ref[:, :, :, t * cin:(t + 1) * cin] = \
                pad_ref[:, r0 + ky:r0 + ky + rc, kx:kx + w, :]

        y = jnp.dot(col_ref[...].reshape(bt * rc * w, 9 * cin), w_ref[...],
                    preferred_element_type=f32) + b_ref[...]
        # requant with the relu folded into the clip-at-0 (quantize._requant);
        # floor == the truncating s8 convert on non-negative values, kept in
        # f32 (values <= 127 are exact) so the pool stays on the f32 VPU path
        q = jnp.floor(jnp.clip(_unscale(y, s_ref[0, 0]) + 0.5, 0.0, 127.0))
        # exact integer 2x2 mean-pool, round-half-up (quantize._avg_pool_int8).
        # Mosaic lowers stride-2 slices of >2D values to an unsupported
        # gather, so the pairing is written as split-leading-dim reshapes +
        # unit slices (pure layout ops): w-major flattening makes horizontal
        # neighbors adjacent rows; vertical neighbors then pair on a split dim.
        q = q.reshape(bt * rc * w // 2, 2, cout)
        h1 = q[:, 0, :] + q[:, 1, :]
        h1 = h1.reshape(bt * rc // 2, 2, w // 2, cout)
        v = h1[:, 0] + h1[:, 1]
        # sums <= 508 and (v+2)/4 are exact in f32; floor == trunc on >=0
        out = jnp.floor((v + 2.0) * 0.25)
        out_ref[:, r0 // 2:(r0 + rc) // 2] = \
            out.reshape(bt, rc // 2, w // 2, cout).astype(jnp.int8)


def stem3_requant_pool_int8(x: jnp.ndarray, kernel, bias, scale,
                            batch_tile: int = 1,
                            interpret: bool = False,
                            row_chunk: int | None = None) -> jnp.ndarray:
    """x (N,H,W,Cin) bf16 (stem2 output), kernel (3,3,Cin,Cout), bias (Cout,)
    f32, scale: the stem.out activation scale. Returns the requantized,
    2x2-mean-pooled stem output (N, H/2, W/2, Cout) int8 — exactly
    _avg_pool_int8(_requant(conv+bias, scale), 2) with the relu folded.

    row_chunk overrides the auto-sized im2col chunk (tests force rc < h to
    exercise the multi-chunk path; must be an even divisor of H)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() == "cpu"
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    assert h % 2 == 0 and w % 2 == 0, (h, w)
    bt = batch_tile
    assert n % bt == 0, (n, bt)

    wmat = jnp.asarray(kernel, jnp.bfloat16).reshape(9 * cin, cout)
    b = jnp.asarray(bias, jnp.float32).reshape(1, cout)
    s = jnp.asarray(scale, jnp.float32).reshape(1, 1)

    # Rows per im2col chunk: largest even divisor of h keeping the col scratch
    # (+ its ~3x f32 matmul/requant temporaries) comfortably inside the 16 MB
    # scoped-VMEM budget alongside the image and halo blocks.
    if row_chunk is not None:
        assert row_chunk % 2 == 0 and h % row_chunk == 0, (row_chunk, h)
        rc = row_chunk
    else:
        rc = 2
        for cand in range(2, h + 1, 2):
            if h % cand == 0 and bt * cand * w * 9 * cin * 2 <= 2 << 20:
                rc = cand

    kfn = functools.partial(_kernel, h=h, w=w, cin=cin, cout=cout, bt=bt, rc=rc)
    full = lambda a: pl.BlockSpec(a.shape, lambda i, _s=a.shape: (0,) * len(_s),
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kfn,
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, w, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(wmat), full(b), full(s),
        ],
        out_specs=pl.BlockSpec((bt, h // 2, w // 2, cout),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, cout), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((bt, h + 2, w + 2, cin), x.dtype),
            pltpu.VMEM((bt, rc, w, 9 * cin), x.dtype),
        ],
        interpret=interpret,
    )(x.astype(jnp.bfloat16), wmat, b, s)
