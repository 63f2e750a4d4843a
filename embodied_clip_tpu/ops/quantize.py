"""Post-training int8 quantization of the frozen CLIP ResNet trunk (inference only).

Why: the RN50 trunk is HBM-bandwidth-bound on TPU (STATUS.md roofline: every stage
runs at the per-op traffic limit; FLOPs are not the constraint). int8 activations +
int8 weights halve activation traffic AND double MXU throughput, so the trunk speeds
up roughly with the traffic reduction — provided the requantization is FUSED into the
conv epilogues so no f32/bf16 intermediate ever reaches HBM. This module writes the
graph in exactly that shape: conv(int8,int8)→int32, then one elementwise chain
(per-channel scale → +residual → relu → round/clip → int8) that XLA fuses into the
conv output.

Scheme (standard symmetric PTQ):
  weights      int8 per-output-channel, scale = max|w| / 127 (exact at conv time:
               int32 accum × (a_scale · w_scale[c]) in f32)
  activations  int8 per-tensor; every conv input in this trunk is post-ReLU, so
               values ∈ [0, max] and scale = max / 127 (calibrated on sample frames)
  stem + attnpool + downsample (1×1 shortcut) convs stay bf16/f32 — they are cheap
  and keeping them high-precision protects fidelity.

The bf16 path remains the fidelity reference (≤1e-3 cosine north star); the int8
trunk is a measured trade (see STATUS.md for its cosine-vs-f32 numbers) exposed via
FrozenEncoder.quantize(calibration_frames).

Reference anchor: this replaces the compute of thor_image_features.py:103-113 (the
frozen encoder hot loop) — numerics validated against the bf16/f32 paths in
tests/test_quantize.py.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "quantize_trunk", "quantized_trunk_apply", "calibrate_trunk",
    "quantize_resnet_trunk", "quantized_resnet_apply", "calibrate_resnet_trunk",
    "stage1_int8_operands",
]

_QMAX = 127.0


def _conv(x, kernel, stride: int = 1, pet=None):
    k = kernel.shape[0]
    pad = [((k - 1) // 2, (k - 1) // 2)] * 2
    return lax.conv_general_dilated(
        x, kernel, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=pet,
    )


def _quantize_kernel(kernel) -> Dict[str, jnp.ndarray]:
    """Per-output-channel symmetric int8 weights."""
    k = jnp.asarray(kernel, jnp.float32)
    scale = jnp.max(jnp.abs(k), axis=(0, 1, 2)) / _QMAX + 1e-30
    q = jnp.clip(jnp.round(k / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return {"kernel_q": q, "w_scale": scale}


def _avg_pool_int8(x8, window: int):
    """Exact integer 2×2 (or w×w) mean-pool of an int8 tensor: sum in s32, then
    round-half-up back to s8. Used by the stride blocks so cb2's requant fuses
    into its conv epilogue (quantize pre-pool) and cb3 stays a plain 1×1 conv at
    the pooled resolution — both measured faster than a stride-2 2×2 conv or a
    pool that splits the conv from its epilogue. Adds one 0.5-LSB rounding of the
    pooled mean (input is already on the same int8 grid)."""
    n = window * window
    summed = lax.reduce_window(
        x8.astype(jnp.int32), 0, lax.add,
        (1, window, window, 1), (1, window, window, 1), "VALID")
    return ((summed + n // 2) // n).astype(jnp.int8)


def _max_pool_int8(x8, window: int = 3, stride: int = 2, pad: int = 1):
    """torchvision stem maxpool on the int8 grid — exact: max commutes with the
    monotone requant, so pooling after quantization equals quantizing the pooled
    f32 tensor, at a quarter of the traffic."""
    return lax.reduce_window(
        x8, jnp.int8(-128), lax.max,
        (1, window, window, 1), (1, stride, stride, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)])


def _requant(x_f32, a_scale):
    """f32 (non-negative, post-relu) → int8 with per-tensor scale.

    Round-half-up, written as +0.5 then a truncating convert: XLA's f32→s8
    convert truncates toward zero (TPU and CPU agree), and the +0.5 fuses into
    the scale multiply as one FMA, while an explicit jnp.round is a separate
    VPU pass costing ~0.6 ms/stage at batch 128 (measured; see STATUS.md).
    Differs from round-half-even only on exact ties — immaterial for PTQ."""
    return jnp.clip(_unscale(x_f32, a_scale) + 0.5, 0.0, _QMAX).astype(jnp.int8)


def _unscale(x_f32, a_scale):
    """x / a_scale. ECT_RECIP_REQUANT=1 rewrites it as a multiply by the
    trace-time-constant reciprocal — measured a consistent ~1.7% REGRESSION
    in-graph (14.11/14.16k vs 14.36/14.35k frames/s interleaved; STATUS.md
    round-4 log): XLA already folds the constant divide optimally and the
    explicit reciprocal perturbs its fusion scheduling. Default stays the
    divide, which also keeps the requant bit-identical to every committed
    golden fixture (the reciprocal is off by ±1 s8 step on near-ties)."""
    import os

    if os.environ.get("ECT_RECIP_REQUANT", "0") == "1":
        return x_f32 * (jnp.float32(1.0) / jnp.asarray(a_scale, jnp.float32))
    return x_f32 / jnp.asarray(a_scale, jnp.float32)


def _requant_signed(x_f32, a_scale):
    """Signed variant for tensors that aren't post-relu (the conv-shortcut
    outputs): round-half-away-from-zero via a sign-selected ±0.5 then the
    truncating convert — stays one fused elementwise chain in the producing
    conv's epilogue."""
    y = _unscale(x_f32, a_scale)
    y = jnp.where(y >= 0, y + 0.5, y - 0.5)
    return jnp.clip(y, -_QMAX, _QMAX).astype(jnp.int8)


_QMAX4 = 7.0


def _requant_u4(x_f32, a_scale8):
    """f32 (post-relu) → s4 on a widened grid (scale4 = scale8 · 127/7, i.e.
    the SAME calibrated max, 4-bit resolution). Returns (q4, scale4). The
    int4-stage-1 experiment (VERDICT r4 next #1a): stage 1 is HBM-traffic-
    bound, so s4 storage would halve its dominant cost IF XLA stores S4
    packed — see STATUS.md round-5 log for the measured answer."""
    s4 = jnp.asarray(a_scale8, jnp.float32) * (_QMAX / _QMAX4)
    q = jnp.clip(_unscale(x_f32, s4) + 0.5, 0.0, _QMAX4).astype(jnp.int4)
    return q, s4


def _requant_s4(x_f32, a_scale8):
    """Signed s4 variant (shortcut outputs span both signs)."""
    s4 = jnp.asarray(a_scale8, jnp.float32) * (_QMAX / _QMAX4)
    y = _unscale(x_f32, s4)
    y = jnp.where(y >= 0, y + 0.5, y - 0.5)
    return jnp.clip(y, -_QMAX4, _QMAX4).astype(jnp.int4), s4


def _as_s8(t):
    """Widen an s4 tensor to s8 at its consumer (the convert fuses into the
    consuming dot/pool fusion; Mosaic/XLA emit no native s4 dots)."""
    return t.astype(jnp.int8) if t.dtype == jnp.int4 else t


def _block_names(stage_sizes: Sequence[int]):
    for stage, n in enumerate(stage_sizes):
        for b in range(n):
            stride = 2 if (b == 0 and stage > 0) else 1
            yield f"layer{stage + 1}_{b}", stride


# --------------------------------------------------------------------- calibration


def calibrate_trunk(folded_trunk_params: Dict[str, Any], stage_sizes: Sequence[int],
                    x, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """Run the folded trunk on calibration input; record the max of every tensor
    that the int8 graph will quantize (keys match quantized_trunk_apply)."""
    p = folded_trunk_params
    scales: Dict[str, jnp.ndarray] = {}

    def record(name, t):
        scales[name] = jnp.max(t).astype(jnp.float32) / _QMAX + 1e-30
        return t

    def cb(name, t, stride=1, relu=True):
        sub = p
        for part in name.split("/"):
            sub = sub[part]
        out = _conv(t.astype(dtype), jnp.asarray(sub["conv"]["kernel"], dtype),
                    stride) + jnp.asarray(sub["conv"]["bias"], dtype)
        return nn.relu(out) if relu else out

    t = cb("stem1", x, 2)
    # Post-relu maxes for the int8-stem variant (stem2/stem3 as s8 convs):
    # recorded unconditionally — cheap, and quantize_trunk always packs the
    # s8 stem kernels so the runtime int8_stem switch needs no recalibration.
    record("stem1.out", t)
    t = cb("stem2", t)
    record("stem2.out", t)
    t = cb("stem3", t)
    # Recorded PRE-pool: the int8 graph requants in stem3's conv epilogue and
    # mean-pools on the int8 grid (_avg_pool_int8) — halves the stem-pool HBM
    # traffic (bf16 write+read → s8) at one 0.5-LSB rounding, the same
    # quantize-pre-pool trade the stride blocks make. The pre-pool max
    # upper-bounds the pooled max — safe scale.
    record("stem.out", t)
    t = nn.avg_pool(t, (2, 2), strides=(2, 2))
    for name, stride in _block_names(stage_sizes):
        o = cb(f"{name}/cb1", t)
        record(f"{name}/cb2.in", o)
        o = cb(f"{name}/cb2", o)
        # cb3.in is recorded PRE-pool for stride blocks: the int8 graph
        # quantizes before the pool (so cb2's requant fuses into its conv
        # epilogue) and pools on the int8 grid (_avg_pool_int8); the pre-pool
        # max upper-bounds the pooled max — safe scale.
        record(f"{name}/cb3.in", o)
        if stride > 1:
            o = nn.avg_pool(o, (stride, stride), strides=(stride, stride))
        o = cb(f"{name}/cb3", o, relu=False)
        identity = t
        if stride > 1 or t.shape[-1] != o.shape[-1]:
            if stride > 1:
                identity = nn.avg_pool(identity, (stride, stride),
                                       strides=(stride, stride))
            identity = cb(f"{name}/down", identity, relu=False)
            # Signed abs-max: the int8 graph writes the shortcut output as s8
            # (it is not post-relu, so values span both signs).
            scales[f"{name}/down.out"] = (
                jnp.max(jnp.abs(identity)).astype(jnp.float32) / _QMAX + 1e-30)
        t = nn.relu(o + identity)
        record(f"{name}.out", t)
    return scales


# -------------------------------------------------------------------- quantization


def quantize_trunk(folded_trunk_params: Dict[str, Any], stage_sizes: Sequence[int],
                   calibration_x) -> Dict[str, Any]:
    """Folded (conv+bias) trunk params → quantized param tree:
    int8 kernels + per-channel weight scales for the bottleneck cb1/cb2/cb3 convs,
    original f32/bf16 params for stem and shortcut convs, calibrated activation
    scales."""
    act_scales = calibrate_trunk(folded_trunk_params, stage_sizes, calibration_x)
    q: Dict[str, Any] = {"act_scales": act_scales, "fp": {}}
    p = folded_trunk_params
    for name in ("stem1", "stem2", "stem3"):
        q["fp"][name] = p[name]
    # s8 kernels for the int8-stem variant (stem1 stays bf16 — its input is
    # the normalized image, 3 channels, already traffic-light). The fp copies
    # above remain the default path's operands.
    for name in ("stem2", "stem3"):
        sub = p[name]["conv"]
        q[name] = dict(_quantize_kernel(sub["kernel"]),
                       bias=jnp.asarray(sub["bias"], jnp.float32))
    for name, stride in _block_names(stage_sizes):
        for cbname in ("cb1", "cb2", "cb3"):
            sub = p[name][cbname]["conv"]
            q[f"{name}/{cbname}"] = dict(
                _quantize_kernel(sub["kernel"]),
                bias=jnp.asarray(sub["bias"], jnp.float32),
            )
        if "down" in p[name]:
            q["fp"][f"{name}/down"] = p[name]["down"]

    return q


def stage1_int8_operands(q: Dict[str, Any]) -> Dict[str, jnp.ndarray]:
    """Precompute the operand dict for the fused int8 stage-1 Pallas kernel
    (ops/pallas/bottleneck_kernel.fused_stage1_int8) from the quantized trunk
    tree: int8 kernels (1x1s pre-squeezed), per-channel f32 epilogue scales
    S = in_scale * w_scale and biases, the bf16 conv-shortcut pair, and a
    packed scalar vector of the requant scales — the kernel mirrors
    quantized_trunk_apply's f32 ops one-for-one."""
    a = q["act_scales"]
    names = ["layer1_0", "layer1_1", "layer1_2"]
    letters = ["a", "b", "c"]
    ops: Dict[str, jnp.ndarray] = {}
    f32 = jnp.float32
    s_prev = jnp.asarray(a["stem.out"], f32)
    scl = [s_prev]
    for name, L in zip(names, letters):
        s2 = jnp.asarray(a[f"{name}/cb2.in"], f32)
        s3 = jnp.asarray(a[f"{name}/cb3.in"], f32)
        s_out = jnp.asarray(a[f"{name}.out"], f32)
        scl += [s2, s3, s_out]
        cb1, cb2, cb3 = (q[f"{name}/{c}"] for c in ("cb1", "cb2", "cb3"))
        # int8 kernels ride as bf16 (exact: integer values ≤127) — the kernel's
        # matmuls run on the MXU's bf16 path (see _qdot in bottleneck_kernel).
        ops[f"k1{L}"] = cb1["kernel_q"][0, 0].astype(jnp.bfloat16)
        ops[f"s1{L}"] = (s_prev * cb1["w_scale"]).reshape(1, -1)
        ops[f"b1{L}"] = cb1["bias"].reshape(1, -1)
        ops[f"k2{L}"] = cb2["kernel_q"].astype(jnp.bfloat16)
        ops[f"s2{L}"] = (s2 * cb2["w_scale"]).reshape(1, -1)
        ops[f"b2{L}"] = cb2["bias"].reshape(1, -1)
        ops[f"k3{L}"] = cb3["kernel_q"][0, 0].astype(jnp.bfloat16)
        ops[f"s3{L}"] = (s3 * cb3["w_scale"]).reshape(1, -1)
        ops[f"b3{L}"] = cb3["bias"].reshape(1, -1)
        if L == "a":
            down = q["fp"][f"{name}/down"]["conv"]
            ops["wsc"] = jnp.asarray(down["kernel"], jnp.bfloat16)[0, 0]
            ops["bsc"] = jnp.asarray(down["bias"], f32).reshape(1, -1)
        s_prev = s_out
    # scl[10]: the shortcut output's signed requant scale — the kernel mirrors
    # quantized_trunk_apply's s8 shortcut round-trip (_requant_signed) exactly.
    scl.append(jnp.asarray(a["layer1_0/down.out"], f32))
    ops["scl"] = jnp.stack(scl).astype(f32).reshape(1, -1)
    return ops


def cb3_cb1_operands(q: Dict[str, Any], name: str, next_name: str,
                     r_res) -> Dict[str, jnp.ndarray]:
    """Operand prep for the cross-block pointwise fusion kernel
    (ops/pallas/bottleneck_kernel.fused_cb3_cb1_int8): block `name`'s cb3
    kernel + f32 epilogue scale/bias, block `next_name`'s cb1 likewise, and
    the packed requant scales [r_res (the residual's scale), r_out (block
    output), r_next (the next block's cb2 input scale)]. The scale products
    are computed exactly as qconv computes them (in_scale * w_scale in f32)
    so the kernel is bit-exact vs the XLA graph."""
    a = q["act_scales"]
    f32 = jnp.float32
    cb3 = q[f"{name}/cb3"]
    cb1n = q[f"{next_name}/cb1"]
    s3 = jnp.asarray(a[f"{name}/cb3.in"], f32)
    s_out = jnp.asarray(a[f"{name}.out"], f32)
    r2n = jnp.asarray(a[f"{next_name}/cb2.in"], f32)
    return {
        "k3": cb3["kernel_q"][0, 0],
        "s3": (s3 * cb3["w_scale"]).reshape(1, -1),
        "b3": cb3["bias"].reshape(1, -1),
        "k1": cb1n["kernel_q"][0, 0],
        "s1": (s_out * cb1n["w_scale"]).reshape(1, -1),
        "b1": cb1n["bias"].reshape(1, -1),
        "scl": jnp.stack([jnp.asarray(r_res, f32), s_out, r2n])
               .astype(f32).reshape(1, -1),
    }


# Minimum bottleneck width for the fused identity-resblocks Pallas kernel:
# narrower stages run the kernel structure at <25% MXU (STATUS.md stage-1
# measurement). Module-level so tests can exercise the fused path on tiny
# trunks.
PALLAS_RESBLOCKS_MIN_CM = 128


def resblocks_int8_operands(q: Dict[str, Any], names: Sequence[str],
                            s_in, s_next):
    """Operand prep for the fused identity-resblocks Pallas kernel
    (ops/pallas/bottleneck_kernel.fused_resblocks_int8): per-block int8
    kernels (1x1s pre-squeezed) + f32 epilogue scales S = in_scale*w_scale and
    biases, plus the packed requant-scale vector [r_in, (r2, r3, r_out) x k]
    whose final entry is `s_next` (the scale the stage output requantizes to —
    the next stage's input scale)."""
    a = q["act_scales"]
    f32 = jnp.float32
    blocks = []
    scl = [jnp.asarray(s_in, f32)]
    s_prev = jnp.asarray(s_in, f32)
    for i, name in enumerate(names):
        s2 = jnp.asarray(a[f"{name}/cb2.in"], f32)
        s3 = jnp.asarray(a[f"{name}/cb3.in"], f32)
        s_out = jnp.asarray(s_next if i == len(names) - 1
                            else a[f"{name}.out"], f32)
        cb1, cb2, cb3 = (q[f"{name}/{c}"] for c in ("cb1", "cb2", "cb3"))
        blocks.append({
            "k1": cb1["kernel_q"][0, 0],
            "s1": (s_prev * cb1["w_scale"]).reshape(1, -1),
            "b1": cb1["bias"].reshape(1, -1),
            "k2": cb2["kernel_q"],
            "s2": (s2 * cb2["w_scale"]).reshape(1, -1),
            "b2": cb2["bias"].reshape(1, -1),
            "k3": cb3["kernel_q"][0, 0],
            "s3": (s3 * cb3["w_scale"]).reshape(1, -1),
            "b3": cb3["bias"].reshape(1, -1),
        })
        scl += [s2, s3, s_out]
        s_prev = s_out
    return blocks, jnp.stack(scl).astype(f32).reshape(1, -1)


def _resblocks_batch_tile(shape) -> int:
    """Batch tile keeping one program's activations VMEM-resident: the f32
    pre-residual intermediate (h·w·c·4 bytes) is the big term; target ~3 MB."""
    n, h, w, c = shape
    bt = max(1, (2 * 28 * 28 * 512) // (h * w * c))
    while n % bt:
        bt -= 1
    return bt


def quantized_trunk_apply(q: Dict[str, Any], x, stage_sizes: Sequence[int],
                          out_dtype=jnp.bfloat16, pallas_stage1: bool = False,
                          pallas_resblocks: bool = False,
                          pallas_stem: bool = False,
                          int8_stem: str = "off",
                          fuse_pointwise: int = 0,
                          int4_stage1: int = 0):
    """int8 trunk forward: x is the preprocessed image batch (f32/bf16 NHWC).
    Returns the conv feature map in out_dtype. pallas_stage1 runs stage 1
    through the fused int8 Pallas kernel (not a win on this runtime — see
    STATUS.md); pallas_resblocks runs each later stage's stride-1 identity
    bottlenecks through the fused wide-channel int8 kernel (block 0 of each
    stage — stride pool + conv shortcut — stays on XLA); pallas_stem runs
    stem3 + requant + pool as one im2col-matmul kernel (ops/pallas/
    stem_kernel.py); fuse_pointwise > 0 runs each block-boundary
    [cb3 → +residual → requant] + [next cb1 → requant] pair whose block
    output width is >= fuse_pointwise through the cross-block Pallas kernel
    (fused_cb3_cb1_int8), cutting one HBM re-read of the block-output tensor
    — measured NEGATIVE in-graph even for the one isolated win (stage-4
    pairs at width 2048: 12,810 vs 14,488 frames/s — XLA relayout-pads the
    7x7 int8 tiles to 32 sublanes at the pallas boundary; STATUS.md round-4
    log). Mutually exclusive with pallas_resblocks, which owns those blocks
    wholesale. int4_stage1 stores stage-1's cross-fusion activations as S4
    (1 = all of them, 2 = only the 256-wide block-output/shortcut tensors),
    widened to s8 at each consumer — the VERDICT r4 traffic lever; measured
    a LARGE NEGATIVE (see STATUS.md round-5: XLA scalarizes S4 stores, a
    materialized S4 tensor is ~20x slower than s8, not 2x cheaper)."""
    a = q["act_scales"]
    fuse_pointwise = 0 if pallas_resblocks else fuse_pointwise
    if pallas_stage1 or pallas_resblocks or fuse_pointwise:
        int4_stage1 = 0  # the pallas paths own those tensors wholesale

    def fp_conv(name, t, stride=1, relu=True):
        sub = q["fp"][name]["conv"]
        k = jnp.asarray(sub["kernel"], jnp.bfloat16)
        if k.shape[0] == 1 and k.shape[1] == 1 and stride == 1:
            # 1×1 shortcut as an explicit f32-accumulating einsum: the conv
            # emitter's bf16 output rounding is elided or kept at XLA's
            # discretion (allow-excess-precision), which makes the graph's
            # numerics build-dependent — and impossible for the fused Pallas
            # stage-1 kernel to be bit-exact against. dot_general with
            # preferred_element_type pins the semantics (and einsum is the
            # faster form for this net's 1×1s — see qconv).
            out = jnp.einsum("nhwc,cd->nhwd", t.astype(jnp.bfloat16), k[0, 0],
                             preferred_element_type=jnp.float32)
        else:
            out = _conv(t.astype(jnp.bfloat16), k, stride).astype(jnp.float32)
        out = out + jnp.asarray(sub["bias"], jnp.float32)
        return nn.relu(out) if relu else out

    def qconv(sub, t8, in_scale):
        """int8 conv → f32 (bias added); caller fuses the rest of the epilogue.
        1×1 kernels go through einsum (dot_general): measurably faster than the
        conv emitter for this net's small-channel 1×1s. s4 inputs widen to s8
        here (the convert fuses into the dot's operand read)."""
        t8 = _as_s8(t8)
        k = sub["kernel_q"]
        if k.shape[0] == 1 and k.shape[1] == 1:
            out = jnp.einsum("nhwc,cd->nhwd", t8, k[0, 0],
                             preferred_element_type=jnp.int32)
        else:
            out = _conv(t8, k, pet=jnp.int32)
        return out.astype(jnp.float32) * (in_scale * sub["w_scale"]) + sub["bias"]

    s_in = a["stem.out"]
    if int8_stem == "full" and "stem2" in q:
        # int8 stem variant: stem1 stays a bf16 conv (3-channel input) but its
        # epilogue writes s8 (relu folds into _requant's clip-at-0), and
        # stem2/stem3 run as s8×s8→s32 convs with requant epilogues — the stem
        # chain's HBM traffic drops ~40% (the bf16 stem is traffic-bound at
        # ~85% of the elementwise ceiling; STATUS.md round-4 profile) and
        # stem3's C_in=32 MXU cap halves at the int8 rate.
        t = fp_conv("stem1", x, 2, relu=False)
        s1 = a["stem1.out"]
        t8s = _requant(t, s1)
        s2 = a["stem2.out"]
        t8s = _requant(qconv(q["stem2"], t8s, s1), s2)
        t8 = _avg_pool_int8(_requant(qconv(q["stem3"], t8s, s2), s_in), 2)
        t = None
    elif int8_stem == "stem3" and "stem3" in q:
        # stem3-only int8: stem1/stem2 stay bf16 (their tiny channel counts
        # lose at the int8 conv rate — the "full" variant measured −640 f/s,
        # STATUS.md), but stem3 (C_in=32→64, the stem's 0.99 ms / 36%-MXU
        # fusion) runs s8×s8→s32 with the requant in its epilogue; its input
        # read also halves (bf16→s8).
        t = fp_conv("stem1", x, 2)
        t = fp_conv("stem2", t)
        s2 = a["stem2.out"]
        t8s = _requant(t, s2)
        t8 = _avg_pool_int8(_requant(qconv(q["stem3"], t8s, s2), s_in), 2)
        t = None
    else:
        t = fp_conv("stem1", x, 2)
        t = fp_conv("stem2", t)
    if t is None:
        pass
    elif pallas_stem and t.shape[1] % 2 == 0 and t.shape[2] % 2 == 0:
        from embodied_clip_tpu.ops.pallas.stem_kernel import (
            stem3_requant_pool_int8,
        )

        sub = q["fp"]["stem3"]["conv"]
        t8 = stem3_requant_pool_int8(t.astype(jnp.bfloat16), sub["kernel"],
                                     sub["bias"], s_in)
    else:
        # stem3's relu folds into _requant's clip-at-0 (bit-identical; one
        # fewer VPU pass in the stem3 epilogue fusion), like the block relus.
        t = fp_conv("stem3", t, relu=False)
        # Quantize pre-pool (scale calibrated pre-pool) + exact integer
        # mean-pool: the requant fuses into stem3's conv epilogue and the pool
        # moves bytes on the int8 grid instead of bf16 (with the s8 shortcut
        # outputs below: 13.54k → 13.73k frames/s at batch 128).
        t8 = _avg_pool_int8(_requant(t, s_in), 2)

    blocks = list(_block_names(stage_sizes))
    if pallas_stage1 and stage_sizes[0] == 3:
        from embodied_clip_tpu.ops.pallas.bottleneck_kernel import (
            fused_stage1_int8,
        )

        t8 = fused_stage1_int8(t8, stage1_int8_operands(q))
        s_in = a["layer1_2.out"]
        blocks = blocks[3:]

    def _identity_run(i):
        """Length of the run of fusable identity blocks starting at i: stride
        1, no conv shortcut, cm >= PALLAS_RESBLOCKS_MIN_CM (narrower stages
        lose on the MXU — STATUS.md stage-1 kernel measurement)."""
        j = i
        while (j < len(blocks) and blocks[j][1] == 1
               and f"{blocks[j][0]}/down" not in q["fp"]
               and (q[f"{blocks[j][0]}/cb2"]["kernel_q"].shape[-1]
                    >= PALLAS_RESBLOCKS_MIN_CM)):
            j += 1
        return j - i

    i = 0
    q1_carry = None  # next block's cb1 output (s8), produced by the fused kernel
    while i < len(blocks):
        name, stride = blocks[i]
        if pallas_resblocks and (run := _identity_run(i)) > 0:
            from embodied_clip_tpu.ops.pallas.bottleneck_kernel import (
                fused_resblocks_int8,
            )

            names = [blocks[i + k][0] for k in range(run)]
            is_final = i + run == len(blocks)
            s_next = 1.0 if is_final else a[f"{names[-1]}.out"]
            ops, scl = resblocks_int8_operands(q, names, s_in, s_next)
            bt = _resblocks_batch_tile(t8.shape)
            if is_final:
                return fused_resblocks_int8(t8, ops, scl, batch_tile=bt,
                                            out_dtype=out_dtype)
            t8 = fused_resblocks_int8(t8, ops, scl, batch_tile=bt)
            s_in = jnp.asarray(s_next, jnp.float32)
            i += run
            continue

        # int4-stage-1 experiment: narrow4 covers the 64-wide cb2/cb3 inputs,
        # wide4 the 256-wide block-output/shortcut tensors (VERDICT r4 #1a).
        in_stage1 = name.startswith("layer1_")
        narrow4 = int4_stage1 == 1 and in_stage1
        wide4 = int4_stage1 in (1, 2) and in_stage1

        # cb1/cb2 relus fold into the next _requant's clip-at-0 lower bound
        # (bit-identical on the int8 grid; one fewer VPU pass per conv epilogue).
        if q1_carry is not None:
            q18, q1_carry = q1_carry, None
            s2 = a[f"{name}/cb2.in"]
        elif narrow4:
            q18, s2 = _requant_u4(qconv(q[f"{name}/cb1"], t8, s_in),
                                  a[f"{name}/cb2.in"])
        else:
            s2 = a[f"{name}/cb2.in"]
            q18 = _requant(qconv(q[f"{name}/cb1"], t8, s_in), s2)
        o = qconv(q[f"{name}/cb2"], q18, s2)
        if narrow4:
            o8, s3 = _requant_u4(o, a[f"{name}/cb3.in"])
        else:
            s3 = a[f"{name}/cb3.in"]
            o8 = _requant(o, s3)  # pre-pool for stride blocks: cb2's epilogue fuses
        if stride > 1:
            o8 = _avg_pool_int8(_as_s8(o8), stride)

        if f"{name}/down" in q["fp"]:
            # Identity path traffic runs on the int8 grid end-to-end: pool the
            # s8 input exactly (integer mean), and requantize the bf16 shortcut
            # conv's output to s8 in its epilogue (signed per-tensor scale from
            # calibration) so the residual tensor crossing to the cb3 fusion is
            # s8 instead of bf16 — the conv itself stays bf16 (int8 shortcut
            # convs regress: STATUS.md round-2 log).
            idsrc = _avg_pool_int8(_as_s8(t8), stride) if stride > 1 else t8
            down = fp_conv(f"{name}/down",
                           idsrc.astype(jnp.float32) * s_in, relu=False)
            if wide4:
                id8, r_res = _requant_s4(down, a[f"{name}/down.out"])
            else:
                r_res = a[f"{name}/down.out"]
                id8 = _requant_signed(down, r_res)
        else:
            id8, r_res = t8, s_in

        is_last = name == blocks[-1][0]
        c_out = q[f"{name}/cb3"]["kernel_q"].shape[-1]
        if fuse_pointwise and c_out >= fuse_pointwise and not is_last:
            from embodied_clip_tpu.ops.pallas.bottleneck_kernel import (
                fused_cb3_cb1_int8,
            )

            ops = cb3_cb1_operands(q, name, blocks[i + 1][0], r_res)
            t8, q1_carry = fused_cb3_cb1_int8(o8, id8, ops)
            s_in = a[f"{name}.out"]
            i += 1
            continue

        o = qconv(q[f"{name}/cb3"], o8, s3)
        identity = id8.astype(jnp.float32) * r_res
        if is_last:
            # conv map output: no final requant round-trip
            return nn.relu(o + identity).astype(out_dtype)
        # No explicit relu: _requant's clip-at-0 lower bound IS the relu on the
        # int8 grid (bit-identical: negative sums land at 0 either way), and one
        # fewer elementwise pass over the f32 pre-residual tensor matters on an
        # emitter that serializes VPU phases.
        if wide4:
            t8, s_in = _requant_u4(o + identity, a[f"{name}.out"])
        else:
            s_in = a[f"{name}.out"]
            t8 = _requant(o + identity, s_in)
        i += 1


# ------------------------------------------------- torchvision ResNet (imagenet) --
#
# Same PTQ scheme applied to models/resnet.py's structure: 7×7/2 stem → maxpool →
# stages of basic (2×3×3) or bottleneck (1×1,3×3/s,1×1) blocks with stride-2 convs
# (not the CLIP avg-pool downsampling). The stem conv and shortcut convs stay
# bf16; the stem output requantizes before the maxpool (exact — see
# _max_pool_int8). Reference role: the frozen torchvision RN50/RN18 encoders of
# thor_image_features.py:46-48.


def _resnet_cbs(block: str):
    return ("cb1", "cb2", "cb3") if block == "bottleneck" else ("cb1", "cb2")


def calibrate_resnet_trunk(folded_params, stage_sizes: Sequence[int], block: str,
                           x, dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    p = folded_params
    scales: Dict[str, jnp.ndarray] = {}

    def record(name, t):
        scales[name] = jnp.max(t).astype(jnp.float32) / _QMAX + 1e-30
        return t

    def cb(name, t, stride=1, relu=True):
        sub = p
        for part in name.split("/"):
            sub = sub[part]
        out = _conv(t.astype(dtype), jnp.asarray(sub["conv"]["kernel"], dtype),
                    stride) + jnp.asarray(sub["conv"]["bias"], dtype)
        return nn.relu(out) if relu else out

    t = nn.relu(cb("stem", x, 2))
    record("stem.out", t)  # pre-maxpool: the int8 graph pools on the int8 grid
    t = nn.max_pool(t, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    for name, stride in _block_names(stage_sizes):
        if block == "bottleneck":
            o = cb(f"{name}/cb1", t)
            record(f"{name}/cb2.in", o)
            o = cb(f"{name}/cb2", o, stride)
            record(f"{name}/cb3.in", o)
            o = cb(f"{name}/cb3", o, relu=False)
        else:
            o = cb(f"{name}/cb1", t, stride)
            record(f"{name}/cb2.in", o)
            o = cb(f"{name}/cb2", o, relu=False)
        identity = t
        if stride > 1 or t.shape[-1] != o.shape[-1]:
            identity = cb(f"{name}/down", identity, stride, relu=False)
            scales[f"{name}/down.out"] = (
                jnp.max(jnp.abs(identity)).astype(jnp.float32) / _QMAX + 1e-30)
        t = nn.relu(o + identity)
        record(f"{name}.out", t)
    return scales


def quantize_resnet_trunk(folded_params, stage_sizes: Sequence[int], block: str,
                          calibration_x) -> Dict[str, Any]:
    act_scales = calibrate_resnet_trunk(folded_params, stage_sizes, block,
                                        calibration_x)
    q: Dict[str, Any] = {"act_scales": act_scales, "fp": {"stem": folded_params["stem"]}}
    for name, _stride in _block_names(stage_sizes):
        for cbname in _resnet_cbs(block):
            sub = folded_params[name][cbname]["conv"]
            q[f"{name}/{cbname}"] = dict(
                _quantize_kernel(sub["kernel"]),
                bias=jnp.asarray(sub["bias"], jnp.float32),
            )
        if "down" in folded_params[name]:
            q["fp"][f"{name}/down"] = folded_params[name]["down"]
    return q


def quantized_resnet_apply(q: Dict[str, Any], x, stage_sizes: Sequence[int],
                           block: str, out_dtype=jnp.bfloat16):
    """int8 torchvision-ResNet forward; mirrors quantized_trunk_apply."""
    a = q["act_scales"]

    def fp_conv(name, t, stride=1, relu=True):
        sub = q["fp"][name]["conv"]
        out = _conv(t.astype(jnp.bfloat16),
                    jnp.asarray(sub["kernel"], jnp.bfloat16), stride)
        out = out.astype(jnp.float32) + jnp.asarray(sub["bias"], jnp.float32)
        return nn.relu(out) if relu else out

    def qconv(sub, t8, in_scale, stride=1):
        k = sub["kernel_q"]
        if k.shape[0] == 1 and k.shape[1] == 1 and stride == 1:
            out = jnp.einsum("nhwc,cd->nhwd", t8, k[0, 0],
                             preferred_element_type=jnp.int32)
        else:
            out = _conv(t8, k, stride, pet=jnp.int32)
        return out.astype(jnp.float32) * (in_scale * sub["w_scale"]) + sub["bias"]

    # stem relu folds into _requant's clip-at-0 (bit-identical)
    t = fp_conv("stem", x, 2, relu=False)
    s_in = a["stem.out"]
    t8 = _max_pool_int8(_requant(t, s_in))

    blocks = list(_block_names(stage_sizes))
    for name, stride in blocks:
        # intermediate relus fold into _requant's clip-at-0 (see CLIP trunk).
        if block == "bottleneck":
            o = qconv(q[f"{name}/cb1"], t8, s_in)
            s2 = a[f"{name}/cb2.in"]
            o = qconv(q[f"{name}/cb2"], _requant(o, s2), s2, stride)
            s3 = a[f"{name}/cb3.in"]
            o = qconv(q[f"{name}/cb3"], _requant(o, s3), s3)
        else:
            o = qconv(q[f"{name}/cb1"], t8, s_in, stride)
            s2 = a[f"{name}/cb2.in"]
            o = qconv(q[f"{name}/cb2"], _requant(o, s2), s2)

        if f"{name}/down" in q["fp"]:
            # s8 shortcut output (conv stays bf16): the residual tensor crossing
            # to the final-add fusion moves as int8 — see the CLIP-trunk note.
            identity = fp_conv(f"{name}/down", t8.astype(jnp.float32) * s_in,
                               stride, relu=False)
            ds = a[f"{name}/down.out"]
            identity = _requant_signed(identity, ds).astype(jnp.float32) * ds
        else:
            identity = t8.astype(jnp.float32) * s_in
        if name == blocks[-1][0]:
            return nn.relu(o + identity).astype(out_dtype)
        s_in = a[f"{name}.out"]
        # relu folded into _requant's clip-at-0 (see the CLIP trunk note).
        t8 = _requant(o + identity, s_in)
