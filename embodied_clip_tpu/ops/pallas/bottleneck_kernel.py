"""Pallas TPU kernel: fused stride-1 residual bottleneck (inference, folded BN).

Motivation (measured on v5e, batch 128): the CLIP-RN50 stage-1 bottleneck's skinny
1x1 convs are HBM-bandwidth-bound, not MXU-bound — the 256→64→256 projection pair
costs exactly its activation traffic (~0.65 ms = 512 MB @ 800 GB/s) while the MXU
idles at 20 TFLOP/s. XLA materializes every intermediate in HBM; fusing the whole
block — conv1(1x1) → relu → conv2(3x3) → relu → conv3(1x1) → +residual → relu —
into one kernel reduces per-block traffic from ~5 tensor passes to exactly
"read x, write out".

Applies to every stride-1 bottleneck of the folded (inference) trunk; stride-2 /
shortcut blocks stay on XLA. The 3x3 runs as 9 shifted VMEM matmuls accumulated in
f32 (zero-padded halo buffer), so every op is MXU/VPU work on resident data.

Layout: NHWC bf16 in/out; weights bf16 (f32 accumulation); biases f32.
Grid tiles the batch only — each program owns (bt, H, W, C) with full spatial extent,
so there is no cross-tile halo exchange.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["fused_bottleneck", "fused_stage1", "fused_stage1_int8",
           "fused_resblocks_int8", "fused_cb3_cb1_int8",
           "supports_fused_bottleneck"]


def _unscale(x, s):
    """Mirrors ops/quantize._unscale (same ECT_RECIP_REQUANT contract,
    default divide) so kernels stay bit-exact vs the XLA int8 graph under
    either setting."""
    import os

    if os.environ.get("ECT_RECIP_REQUANT", "0") == "1":
        return x * (jnp.float32(1.0) / s)
    return x / s


def supports_fused_bottleneck(h: int, w: int, c: int, cm: int,
                              vmem_budget: int = 12 * 2 ** 20) -> bool:
    """Conservative VMEM feasibility for batch-tile 1."""
    x_b = h * w * c * 2
    h1_b = (h + 2) * (w + 2) * cm * 2
    acc_b = h * w * cm * 4
    out_b = h * w * c * 4 + h * w * c * 2
    return x_b + h1_b + acc_b + out_b + 2 * c * cm * 2 + 9 * cm * cm * 2 < vmem_budget


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, out_ref,
            pad_ref, *, h, w, c, cm, bt):
    f32 = jnp.float32
    x = x_ref[...]                                    # (bt, h, w, c) bf16
    xm = x.reshape(bt * h * w, c)

    # conv1: 1x1 c→cm, relu
    h1 = jnp.dot(xm, w1_ref[...], preferred_element_type=f32) + b1_ref[...]
    h1 = jnp.maximum(h1, 0.0).astype(x.dtype)

    # zero-padded halo buffer for the 3x3
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[:, 1:h + 1, 1:w + 1, :] = h1.reshape(bt, h, w, cm)

    # conv2: 3x3 cm→cm as 9 shifted matmuls, f32 accumulation
    acc = jnp.broadcast_to(b2_ref[...], (bt * h * w, cm)).astype(f32)
    for ky in range(3):
        for kx in range(3):
            sl = pad_ref[:, ky:ky + h, kx:kx + w, :].reshape(bt * h * w, cm)
            acc = acc + jnp.dot(sl, w2_ref[ky, kx], preferred_element_type=f32)
    h2 = jnp.maximum(acc, 0.0).astype(x.dtype)

    # conv3: 1x1 cm→c, residual add, relu
    h3 = jnp.dot(h2, w3_ref[...], preferred_element_type=f32) + b3_ref[...]
    out = jnp.maximum(h3 + xm.astype(f32), 0.0)
    out_ref[...] = out.reshape(bt, h, w, c).astype(out_ref.dtype)


def fused_bottleneck(x: jnp.ndarray, w1, b1, w2, b2, w3, b3,
                     batch_tile: int = 1, interpret: bool = False) -> jnp.ndarray:
    """x (N,H,W,C) bf16; w1 (C,Cm), w2 (3,3,Cm,Cm), w3 (Cm,C); biases f32.

    Computes relu(conv1x1_3(relu(conv3x3(relu(conv1x1_1(x))))) + x) — a stride-1
    bottleneck with BN pre-folded into the conv weights/biases.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, c = x.shape
    cm = w1.shape[1]
    bt = batch_tile
    assert n % bt == 0, (n, bt)

    kernel = functools.partial(_kernel, h=h, w=w, c=c, cm=cm, bt=bt)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // bt,),
        in_specs=[
            pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(c, cm), full(1, cm),
            full(3, 3, cm, cm), full(1, cm),
            full(cm, c), full(1, c),
        ],
        out_specs=pl.BlockSpec((bt, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((bt, h + 2, w + 2, cm), x.dtype)],
        interpret=interpret,
    )(
        x,
        w1.astype(x.dtype), b1.reshape(1, cm).astype(jnp.float32),
        w2.astype(x.dtype), b2.reshape(1, cm).astype(jnp.float32),
        w3.astype(x.dtype), b3.reshape(1, c).astype(jnp.float32),
    )


# --------------------------------------------------------------- fused whole-stage


def _bottleneck_body(x2d, pad_ref, w1, b1, w2, b2, w3, b3, h, w, cm, bt, dtype):
    """One stride-1 bottleneck on a (bt*h*w, C) VMEM tensor; returns pre-residual f32."""
    f32 = jnp.float32
    h1 = jnp.dot(x2d, w1, preferred_element_type=f32) + b1
    h1 = jnp.maximum(h1, 0.0).astype(dtype)
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[:, 1:h + 1, 1:w + 1, :] = h1.reshape(bt, h, w, cm)
    acc = jnp.broadcast_to(b2, (bt * h * w, cm)).astype(f32)
    for ky in range(3):
        for kx in range(3):
            sl = pad_ref[:, ky:ky + h, kx:kx + w, :].reshape(bt * h * w, cm)
            acc = acc + jnp.dot(sl, w2[ky, kx], preferred_element_type=f32)
    h2 = jnp.maximum(acc, 0.0).astype(dtype)
    return jnp.dot(h2, w3, preferred_element_type=f32) + b3


def _stage1_kernel(x_ref,
                   w1a, b1a, w2a, b2a, w3a, b3a, wsc, bsc,
                   w1b, b1b, w2b, b2b, w3b, b3b,
                   w1c, b1c, w2c, b2c, w3c, b3c,
                   out_ref, pad_ref, *, h, w, cin, cm, cout, bt):
    f32 = jnp.float32
    dt = out_ref.dtype
    x0 = x_ref[...].reshape(bt * h * w, cin)
    # block 1: channel expansion, conv shortcut
    main = _bottleneck_body(x0, pad_ref, w1a[...], b1a[...], w2a[...], b2a[...],
                            w3a[...], b3a[...], h, w, cm, bt, dt)
    sc = jnp.dot(x0, wsc[...], preferred_element_type=f32) + bsc[...]
    x1 = jnp.maximum(main + sc, 0.0).astype(dt)
    # blocks 2, 3: identity shortcuts
    m2 = _bottleneck_body(x1, pad_ref, w1b[...], b1b[...], w2b[...], b2b[...],
                          w3b[...], b3b[...], h, w, cm, bt, dt)
    x2 = jnp.maximum(m2 + x1.astype(f32), 0.0).astype(dt)
    m3 = _bottleneck_body(x2, pad_ref, w1c[...], b1c[...], w2c[...], b2c[...],
                          w3c[...], b3c[...], h, w, cm, bt, dt)
    out = jnp.maximum(m3 + x2.astype(f32), 0.0)
    out_ref[...] = out.reshape(bt, h, w, cout).astype(dt)


def fused_stage1(x: jnp.ndarray, blocks, shortcut, batch_tile: int = 1,
                 interpret: bool = False) -> jnp.ndarray:
    """Whole CLIP-RN50 stage 1 (3 stride-1 bottlenecks, folded BN) as ONE kernel.

    x: (N, H, W, Cin) bf16 (stem output, Cin=64). blocks: list of 3 dicts with keys
    w1 (C,Cm), b1, w2 (3,3,Cm,Cm), b2, w3 (Cm,Cout), b3 — block 0 maps Cin→Cout with
    the conv `shortcut` = (ws (Cin,Cout), bs). Stage traffic drops from ~5 HBM tensor
    passes per block to exactly "read x, write out" for the whole stage.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, h, w, cin = x.shape
    cm = blocks[0]["w1"].shape[1]
    cout = blocks[0]["w3"].shape[1]
    bt = batch_tile
    dt = x.dtype

    operands, in_specs = [], []

    def add(a, cast=None):
        a = jnp.asarray(a, cast or dt)
        operands.append(a)
        in_specs.append(pl.BlockSpec(a.shape, lambda i, _s=a.shape: (0,) * len(_s),
                                     memory_space=pltpu.VMEM))

    for bi, blk in enumerate(blocks):
        add(blk["w1"]); add(blk["b1"].reshape(1, -1), jnp.float32)
        add(blk["w2"]); add(blk["b2"].reshape(1, -1), jnp.float32)
        add(blk["w3"]); add(blk["b3"].reshape(1, -1), jnp.float32)
        if bi == 0:
            add(shortcut[0]); add(shortcut[1].reshape(1, -1), jnp.float32)

    kernel = functools.partial(_stage1_kernel, h=h, w=w, cin=cin, cm=cm,
                               cout=cout, bt=bt)
    return pl.pallas_call(
        kernel,
        grid=(n // bt,),
        in_specs=[pl.BlockSpec((bt, h, w, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + in_specs,
        out_specs=pl.BlockSpec((bt, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), dt),
        scratch_shapes=[pltpu.VMEM((bt, h + 2, w + 2, cm), dt)],
        interpret=interpret,
    )(x, *operands)


# ---------------------------------------------------------- int8 fused whole-stage
#
# int8 variant of fused_stage1 for the quantized serving trunk (ops/quantize.py).
# In the XLA int8 graph, stage 1 is epilogue-fusion-bound: each block costs
# ~0.59 ms of serialized MXU/VPU/HBM phases around the cb3+identity+requant chain
# (STATUS.md perf budget). Here the whole stage — 3 bottlenecks, int8 matmuls with
# int32 accumulation, requant epilogues, the bf16 conv shortcut, and the final
# stage-output requant — runs on VMEM-resident data: HBM traffic is exactly
# "read x8 (int8), write out8 (int8)".
#
# Numerics mirror ops/quantize.quantized_trunk_apply op-for-op (same f32
# products, same divide-by-scale, same +0.5/truncating-convert requant,
# including the conv shortcut's signed s8 round-trip). Every integer path is
# bit-exact; the one non-integer reduction (the bf16 shortcut's f32
# accumulation) is compiler-ordered, so across separately compiled programs it
# can flip the signed requant on tie elements (±1 s8 step on ~0.1% of
# elements on CPU; exact on TPU's fixed MXU accumulation order) — see
# tests/test_bottleneck_kernel.py.


def _qdot(x, k):
    """Integer-exact matmul of quantized operands.

    int8 operands are computed on the MXU in bf16 with f32 accumulation —
    EXACT for this net: int8 values are integers ≤127 (exact in bf16),
    products ≤16129 fit f32 exactly, and the largest accumulation
    (9·64·16129 ≈ 9.3M for cb2) is < 2^24. Mosaic's int8 dot path does not
    reach the MXU's int8 rate on this runtime (measured), so bf16 is both
    exact and fast."""
    return jnp.dot(x, k, preferred_element_type=jnp.float32)


def _qblock_cb12(x, pad_ref, k1, s1, b1, k2, s2, b2, r2, r3, h, w, cm, bt):
    """cb1 (1x1) -> requant(/r2) -> cb2 (3x3 as 9 shifted matmuls) ->
    requant(/r3). Quantized values ride in bf16 (integers 0..127, exact);
    returns (bt*h*w, cm) bf16 on the r3 int8 grid."""
    y1 = _qdot(x, k1) * s1 + b1
    q1 = jnp.clip(y1 / r2 + 0.5, 0.0, 127.0).astype(jnp.int32).astype(jnp.bfloat16)
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[:, 1:h + 1, 1:w + 1, :] = q1.reshape(bt, h, w, cm)
    acc = jnp.zeros((bt * h * w, cm), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            sl = pad_ref[:, ky:ky + h, kx:kx + w, :].reshape(bt * h * w, cm)
            acc = acc + _qdot(sl, k2[ky, kx])
    y2 = acc * s2 + b2
    return jnp.clip(y2 / r3 + 0.5, 0.0, 127.0).astype(jnp.int32).astype(jnp.bfloat16)


def _stage1_int8_kernel(x_ref, scl_ref,
                        k1a, s1a, b1a, k2a, s2a, b2a, k3a, s3a, b3a, wsc, bsc,
                        k1b, s1b, b1b, k2b, s2b, b2b, k3b, s3b, b3b,
                        k1c, s1c, b1c, k2c, s2c, b2c, k3c, s3c, b3c,
                        out_ref, pad_ref, *, h, w, cin, cm, cout, bt):
    # scl layout: [sin, r2a, r3a, routa, r2b, r3b, routb, r2c, r3c, routc, dsc]
    f32 = jnp.float32
    scl = scl_ref[...]
    xb = x_ref[...].reshape(bt * h * w, cin).astype(jnp.bfloat16)  # int8→bf16 exact

    # block 0: conv shortcut in bf16 (same precision as the XLA fp path),
    # output requantized through the signed s8 grid — the same
    # _requant_signed round-trip quantized_trunk_apply applies, so the kernel
    # stays bit-exact vs the XLA int8 graph.
    q2 = _qblock_cb12(xb, pad_ref, k1a[...], s1a[...], b1a[...],
                      k2a[...], s2a[...], b2a[...], scl[0, 1], scl[0, 2],
                      h, w, cm, bt)
    y = _qdot(q2, k3a[...]) * s3a[...] + b3a[...]
    x0f = (xb.astype(f32) * scl[0, 0]).astype(jnp.bfloat16)
    # Same op as the XLA graph's fp_conv 1×1 path: bf16 operands, explicit
    # f32-accumulating dot, f32 bias add — well-defined on both sides, so the
    # requant below sees identical values.
    sc = jnp.dot(x0f, wsc[...], preferred_element_type=f32) + bsc[...]
    dsc = scl[0, 10]
    scq = sc / dsc
    scq = jnp.where(scq >= 0, scq + 0.5, scq - 0.5)
    # truncating convert toward zero, like the XLA graph's .astype(int8)
    sc = jnp.clip(scq, -127.0, 127.0).astype(jnp.int32).astype(f32) * dsc
    out = jnp.maximum(y + sc, 0.0)
    x1 = jnp.clip(_unscale(out, scl[0, 3]) + 0.5, 0.0, 127.0) \
        .astype(jnp.int32).astype(jnp.bfloat16)

    # block 1: identity shortcut = dequantized x1
    q2 = _qblock_cb12(x1, pad_ref, k1b[...], s1b[...], b1b[...],
                      k2b[...], s2b[...], b2b[...], scl[0, 4], scl[0, 5],
                      h, w, cm, bt)
    y = _qdot(q2, k3b[...]) * s3b[...] + b3b[...]
    out = jnp.maximum(y + x1.astype(f32) * scl[0, 3], 0.0)
    x2 = jnp.clip(_unscale(out, scl[0, 6]) + 0.5, 0.0, 127.0) \
        .astype(jnp.int32).astype(jnp.bfloat16)

    # block 2
    q2 = _qblock_cb12(x2, pad_ref, k1c[...], s1c[...], b1c[...],
                      k2c[...], s2c[...], b2c[...], scl[0, 7], scl[0, 8],
                      h, w, cm, bt)
    y = _qdot(q2, k3c[...]) * s3c[...] + b3c[...]
    out = jnp.maximum(y + x2.astype(f32) * scl[0, 6], 0.0)
    out8 = jnp.clip(_unscale(out, scl[0, 9]) + 0.5, 0.0, 127.0).astype(jnp.int8)
    out_ref[...] = out8.reshape(bt, h, w, cout)


def fused_stage1_int8(x8: jnp.ndarray, ops: dict, batch_tile: int = 1,
                      interpret: bool = False) -> jnp.ndarray:
    """Whole int8 CLIP-RN50 stage 1 as ONE kernel.

    x8: (N, H, W, Cin) int8 (requantized stem output). ops: operand dict from
    ops/quantize.stage1_int8_operands — int8 kernels, per-channel f32 epilogue
    multipliers/offsets (requant scales folded in), the bf16 conv-shortcut pair
    scaled into the output domain, and the scalar dequant ratios. Returns the
    stage output ALREADY requantized to stage 2's input scale (N, H, W, Cout)
    int8.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() == "cpu"
    n, h, w, cin = x8.shape
    cm = ops["k2a"].shape[-1]
    cout = ops["k3a"].shape[-1]
    bt = batch_tile
    assert n % bt == 0, (n, bt)

    names = ["scl",
             "k1a", "s1a", "b1a", "k2a", "s2a", "b2a", "k3a", "s3a", "b3a",
             "wsc", "bsc",
             "k1b", "s1b", "b1b", "k2b", "s2b", "b2b", "k3b", "s3b", "b3b",
             "k1c", "s1c", "b1c", "k2c", "s2c", "b2c", "k3c", "s3c", "b3c"]
    operands = [ops[nm] for nm in names]
    in_specs = [pl.BlockSpec(a.shape, lambda i, _s=a.shape: (0,) * len(_s),
                             memory_space=pltpu.VMEM) for a in operands]

    kernel = functools.partial(_stage1_int8_kernel, h=h, w=w, cin=cin, cm=cm,
                               cout=cout, bt=bt)
    return pl.pallas_call(
        kernel,
        grid=(n // bt,),
        in_specs=[pl.BlockSpec((bt, h, w, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + in_specs,
        out_specs=pl.BlockSpec((bt, h, w, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), jnp.int8),
        scratch_shapes=[pltpu.VMEM((bt, h + 2, w + 2, cm), jnp.bfloat16)],
        interpret=interpret,
    )(x8, *operands)


# ------------------------------------------------- int8 fused identity resblocks
#
# Generalization of the stage-1 kernel to the stride-1 IDENTITY bottlenecks of
# stages 2-4, where the channel widths (cm 128-512, cin 512-2048) keep the MXU
# fully utilized — measured on this runtime: int8 Mosaic dots reach ~490 TOP/s
# at (6272,1024)x(1024,1024) (vs ~595 for XLA's dot, ~250 TF/s bf16), while
# the stage-1 geometry (64-wide) runs the same kernel structure at <25% MXU.
# Each stage's block 0 (stride-2 pool + conv shortcut) stays on XLA; this
# kernel fuses the remaining k blocks into one VMEM-resident pass whose HBM
# traffic is "read x8, write out8" (both int8).
#
# Numerics mirror ops/quantize.quantized_trunk_apply op-for-op (int8 MXU
# accumulation is exact in i32; epilogues reuse the same f32 products,
# divide-by-scale, +0.5/truncating-convert requant) — bit-exact vs the XLA
# int8 graph (tests/test_bottleneck_kernel.py).


def _resblock_i8(xq, pad_ref, k1, s1, b1, k2, s2, b2, k3, s3, b3,
                 r_in, r2, r3, r_out, h, w, cm, bt, last, carrier):
    """carrier: the VMEM dtype quantized values ride in. int8 uses the MXU
    int8 path; bf16 is integer-exact for these magnitudes (see _qdot) and
    avoids int8's coarser sublane granularity in the halo slicing."""
    f32 = jnp.float32
    acc_t = jnp.int32 if carrier == jnp.int8 else f32
    bhw = bt * h * w
    a1 = jnp.dot(xq, k1, preferred_element_type=acc_t)
    q1 = jnp.clip((a1.astype(f32) * s1 + b1) / r2 + 0.5, 0.0, 127.0)
    q1 = q1.astype(jnp.int32).astype(carrier) if carrier != jnp.int8 \
        else q1.astype(carrier)
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[:, 1:h + 1, 1:w + 1, :] = q1.reshape(bt, h, w, cm)
    acc = jnp.zeros((bhw, cm), acc_t)
    for ky in range(3):
        for kx in range(3):
            sl = pad_ref[:, ky:ky + h, kx:kx + w, :].reshape(bhw, cm)
            acc = acc + jnp.dot(sl, k2[ky, kx], preferred_element_type=acc_t)
    q2 = jnp.clip((acc.astype(f32) * s2 + b2) / r3 + 0.5, 0.0, 127.0)
    q2 = q2.astype(jnp.int32).astype(carrier) if carrier != jnp.int8 \
        else q2.astype(carrier)
    y3 = jnp.dot(q2, k3, preferred_element_type=acc_t).astype(f32) * s3 + b3
    out = jnp.maximum(y3 + xq.astype(f32) * r_in, 0.0)
    if last:
        return out  # caller applies the final requant / dtype
    nxt = jnp.clip(out / r_out + 0.5, 0.0, 127.0)
    return nxt.astype(jnp.int32).astype(carrier) if carrier != jnp.int8 \
        else nxt.astype(carrier)


def _resblocks_kernel(*refs, nb, h, w, cin, cm, bt, out_int8, carrier):
    x_ref, scl_ref = refs[0], refs[1]
    out_ref = refs[2 + 9 * nb]
    pad_ref = refs[3 + 9 * nb]
    scl = scl_ref[...]
    xq = x_ref[...].reshape(bt * h * w, cin).astype(carrier)
    for i in range(nb):
        k1, s1, b1, k2, s2, b2, k3, s3, b3 = \
            (r[...] for r in refs[2 + 9 * i:11 + 9 * i])
        r_in = scl[0, 0] if i == 0 else scl[0, 3 * i]
        r2, r3, r_out = scl[0, 3 * i + 1], scl[0, 3 * i + 2], scl[0, 3 * i + 3]
        last = i == nb - 1
        xq = _resblock_i8(xq, pad_ref, k1, s1, b1, k2, s2, b2, k3, s3, b3,
                          r_in, r2, r3, r_out, h, w, cm, bt, last, carrier)
    if out_int8:
        xq = jnp.clip(_unscale(xq, scl[0, 3 * nb]) + 0.5, 0.0, 127.0).astype(jnp.int8)
        out_ref[...] = xq.reshape(bt, h, w, cin)
    else:
        out_ref[...] = xq.reshape(bt, h, w, cin).astype(out_ref.dtype)


def fused_resblocks_int8(x8: jnp.ndarray, block_ops, scl: jnp.ndarray,
                         batch_tile: int = 1, out_dtype=jnp.int8,
                         carrier=jnp.int8,
                         interpret: bool = False) -> jnp.ndarray:
    """k consecutive stride-1 identity bottlenecks of the int8 trunk as ONE
    kernel.

    x8: (N, H, W, C) int8 on scale scl[0]. block_ops: list of per-block dicts
    {k1 (C,Cm) int8, s1, b1, k2 (3,3,Cm,Cm) int8, s2, b2, k3 (Cm,C) int8, s3,
    b3} with s* the per-channel f32 epilogue scales (in_scale*w_scale) and b*
    the f32 biases. scl: (1, 3k+1) f32 = [r_in, (r2, r3, r_out) x k]; the last
    r_out requantizes the output when out_dtype is int8; pass out_dtype
    bf16/f32 for a trunk-final (conv map) output, which skips it.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() == "cpu"
    n, h, w, cin = x8.shape
    nb = len(block_ops)
    cm = block_ops[0]["k2"].shape[-1]
    bt = batch_tile
    assert n % bt == 0, (n, bt)
    out_int8 = out_dtype == jnp.int8

    operands = [scl.astype(jnp.float32)]
    for blk in block_ops:
        for key in ("k1", "s1", "b1", "k2", "s2", "b2", "k3", "s3", "b3"):
            a = blk[key]
            if key.startswith("k") and carrier != jnp.int8:
                a = a.astype(carrier)  # integer values — exact in bf16
            operands.append(a)
    in_specs = [pl.BlockSpec(a.shape, lambda i, _s=a.shape: (0,) * len(_s),
                             memory_space=pltpu.VMEM) for a in operands]

    kernel = functools.partial(_resblocks_kernel, nb=nb, h=h, w=w, cin=cin,
                               cm=cm, bt=bt, out_int8=out_int8, carrier=carrier)
    return pl.pallas_call(
        kernel,
        grid=(n // bt,),
        in_specs=[pl.BlockSpec((bt, h, w, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] + in_specs,
        out_specs=pl.BlockSpec((bt, h, w, cin), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cin), out_dtype),
        scratch_shapes=[pltpu.VMEM((bt, h + 2, w + 2, cm), carrier)],
        interpret=interpret,
    )(x8, *operands)


# ------------------------------------------ cross-block pointwise fusion (cb3·cb1)
#
# The spatially-fused kernels above lose to XLA on this runtime (halo slicing /
# im2col copies — STATUS.md). This kernel fuses ONLY the pointwise chain that
# crosses a block boundary: block n's [cb3 (1×1) → +residual → requant] with
# block n+1's [cb1 (1×1) → requant]. In the XLA int8 graph these are two
# fusions with the block-output tensor crossing HBM between them — the
# cb3+residual fusion writes out8 and the next block's cb1 fusion re-reads it.
# Both ops are pure matmuls over the flattened spatial grid (no halos), so one
# batch-streamed kernel computes both while out8 is VMEM-resident: per pair,
# HBM traffic drops from read(Cm+C)+write(C) + read(C)+write(C1) to
# read(Cm+C)+write(C+C1) rows — one full re-read of the block-output tensor
# gone (e.g. 103 MB per stage-1 pair at batch 128). Operands/results keep the
# NHWC 4-D shapes of the surrounding convs (the kernel collapses (bt,H,W) to
# rows in VMEM, which is layout-free) — a flattened (R,C) interface measured
# ~0.5 ms/pair of XLA relayout copies at the pallas boundaries.


def _cb3_cb1_batch_tile(n: int, h: int, w: int, c: int) -> int:
    """Largest batch tile that divides n and keeps the f32 pre-residual tile
    ≤ ~3.5 MB (double-buffered in/out DMA stays well under the 16 MB VMEM)."""
    bt = n
    while bt > 1 and (n % bt or bt * h * w * c * 4 > (7 << 19)):
        bt -= 1
    return bt


def _cb3_cb1_kernel(x_ref, res_ref, k3_ref, s3_ref, b3_ref,
                    k1_ref, s1_ref, b1_ref, scl_ref, out_ref, y_ref,
                    *, wide_k1):
    f32 = jnp.float32
    scl = scl_ref[...]
    bt, h, w, cm = x_ref.shape
    c = res_ref.shape[-1]
    rows = bt * h * w
    xb = x_ref[...].reshape(rows, cm).astype(jnp.bfloat16)  # s8→bf16 exact
    # cb3: same integer-exact bf16 dot as _qdot (K = Cm ≤ 512 keeps partial
    # sums < 2^24), same f32 epilogue order as qconv.
    y3 = jnp.dot(xb, k3_ref[...], preferred_element_type=f32) \
        * s3_ref[...] + b3_ref[...]
    out = y3 + res_ref[...].reshape(rows, c).astype(f32) * scl[0, 0]
    # _requant: relu folds into the clip-at-0; +0.5 then truncating convert.
    qf = jnp.clip(_unscale(out, scl[0, 1]) + 0.5, 0.0, 127.0)
    if wide_k1:
        # K = C > 1024: f32 accumulation of s8 products can exceed 2^24 —
        # run the MXU s8×s8→s32 path (exact; and at these widths Mosaic's
        # int8 dots run near rate — STATUS.md resblocks measurement).
        out8 = qf.astype(jnp.int8)
        out_ref[...] = out8.reshape(out_ref.shape)
        acc = jnp.dot(out8, k1_ref[...],
                      preferred_element_type=jnp.int32).astype(f32)
    else:
        qi = qf.astype(jnp.int32)
        out_ref[...] = qi.astype(jnp.int8).reshape(out_ref.shape)
        acc = jnp.dot(qi.astype(jnp.bfloat16), k1_ref[...],
                      preferred_element_type=f32)
    y1 = acc * s1_ref[...] + b1_ref[...]
    y8 = jnp.clip(_unscale(y1, scl[0, 2]) + 0.5, 0.0, 127.0).astype(jnp.int8)
    y_ref[...] = y8.reshape(y_ref.shape)


def fused_cb3_cb1_int8(x8: jnp.ndarray, res8: jnp.ndarray, ops: dict,
                       batch_tile: int = 0, row_chunk: int = 0,
                       s8_dot: bool = None, interpret: bool = False):
    """Block n's cb3+residual+requant fused with block n+1's cb1+requant.

    x8: (N, H, W, Cm) s8 — block n's cb2 output (post-requant, post-pool).
    res8: (N, H, W, C) s8 residual on scale scl[0] (the block input for
    identity blocks; the requantized conv-shortcut output for b0 blocks).
    ops (ops/quantize.cb3_cb1_operands): k3 (Cm,C), s3/b3 (1,C) f32,
    k1 (C,C1), s1/b1 (1,C1) f32, scl (1,3) f32 = [r_res, r_out, r_next].
    row_chunk (< H) splits each batch tile's rows across a second grid dim —
    the whole chain is pointwise over rows, so chunking is exact; it trades
    smaller f32 epilogue temporaries for more grid steps to pipeline.

    Returns (out8 (N,H,W,C) s8 on r_out — block n's output, the next residual
    — and y8 (N,H,W,C1) s8 on r_next — block n+1's cb1 output, its cb2
    input). Numerics mirror ops/quantize.quantized_trunk_apply op-for-op;
    every dot is integer-exact (see _qdot and the wide-K s32 path) — bit-exact
    vs the XLA int8 graph (tests/test_quantize.py, test_bottleneck_kernel.py).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = interpret or jax.default_backend() == "cpu"
    n, h, w, cm = x8.shape
    c = res8.shape[-1]
    c1 = ops["k1"].shape[-1]
    # K = C > 1024: f32 accumulation of s8 products can exceed 2^24 — the
    # kernel must run the MXU s8×s8→s32 dot (also measured faster at these
    # widths). s8_dot overrides for K ≤ 1024 (both paths exact there).
    wide_k1 = c > 1024 if s8_dot is None else s8_dot
    assert not (c > 1024 and not wide_k1), "K>1024 requires the s32 dot"
    bt = batch_tile or _cb3_cb1_batch_tile(n, h, w, c)
    hc = row_chunk or h
    assert n % bt == 0 and h % hc == 0, (n, bt, h, hc)

    k3 = ops["k3"].astype(jnp.bfloat16)  # integer values — exact in bf16
    k1 = ops["k1"] if wide_k1 else ops["k1"].astype(jnp.bfloat16)
    consts = [k3, ops["s3"], ops["b3"], k1, ops["s1"], ops["b1"], ops["scl"]]
    const_specs = [pl.BlockSpec(a.shape, lambda i, j, _s=a.shape: (0,) * len(_s),
                                memory_space=pltpu.VMEM) for a in consts]
    tile = lambda ch: pl.BlockSpec((bt, hc, w, ch), lambda i, j: (i, j, 0, 0),
                                   memory_space=pltpu.VMEM)

    return pl.pallas_call(
        functools.partial(_cb3_cb1_kernel, wide_k1=wide_k1),
        grid=(n // bt, h // hc),
        in_specs=[tile(cm), tile(c)] + const_specs,
        out_specs=[tile(c), tile(c1)],
        out_shape=[jax.ShapeDtypeStruct((n, h, w, c), jnp.int8),
                   jax.ShapeDtypeStruct((n, h, w, c1), jnp.int8)],
        interpret=interpret,
    )(x8, res8, *consts)
