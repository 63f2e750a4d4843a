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

__all__ = ["fused_bottleneck", "fused_stage1", "supports_fused_bottleneck"]


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
