"""Post-training int8 quantization of the frozen CLIP ViT tower (inference only).

Same serving rationale as the ResNet int8 trunk (ops/quantize.py): the four big
dense layers per transformer block (fused-QKV in_proj, out_proj, mlp_fc,
mlp_proj) carry ~98% of ViT-B/32's FLOPs at MXU-friendly shapes — batch 128 ×
50 tokens flattens to (6400, 768)×(768, ·) dots — so int8 weights+activations
double the MXU rate AND halve the dominant activation traffic, with the
requantize fused into each dot's producer epilogue. Everything
fidelity-critical stays high-precision: LayerNorms, the attention core
(f32 softmax, f32-accumulated logits/out einsums — same policy as
models/transformer.py), QuickGELU, residual stream (compute dtype), patch
embed, ln_pre/ln_post, and the final projection.

Scheme (standard symmetric PTQ, matching ops/quantize.py conventions):
  weights      int8 per-output-channel, scale = max|w| / 127
  activations  int8 per-tensor SIGNED (dense inputs here are LayerNorm /
               attention / GELU outputs, which span both signs — unlike the
               post-ReLU ResNet trunk), scale = max|x| / 127 over the
               calibration frames

The bf16 module path remains the fidelity reference; the int8 tower is a
measured trade (cosine numbers in STATUS.md) exposed via
FrozenEncoder.quantize(calibration_frames), exactly like the ResNet families.

Reference anchor: replaces the frozen-encoder hot loop of
thor_image_features.py:103-113 for the ViT-B/32 member of the paper's encoder
sweep (readme_files/imagenet_vs_objectnav.md:6-11); numerics validated against
the f32/bf16 module in tests/test_quantize_vit.py.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from embodied_clip_tpu.models.transformer import quick_gelu as _quick_gelu

__all__ = ["quantize_vit", "quantized_vit_apply"]

_QMAX = 127.0

_QUANT_DENSE = ("in_proj", "out_proj", "mlp_fc", "mlp_proj")


def _quantize_dense_kernel(kernel) -> Dict[str, jnp.ndarray]:
    """Per-output-channel symmetric int8 for a Dense kernel (in, out)."""
    k = jnp.asarray(kernel, jnp.float32)
    scale = jnp.max(jnp.abs(k), axis=0) / _QMAX + 1e-30
    q = jnp.clip(jnp.round(k / scale), -_QMAX, _QMAX).astype(jnp.int8)
    return {"kernel_q": q, "w_scale": scale}


def _requant_signed(x, a_scale):
    """f32/bf16 → signed int8 on a per-tensor grid: the canonical helper from
    ops/quantize (round-half-away-from-zero, one fused elementwise chain in
    the producer's epilogue; honors ECT_RECIP_REQUANT via _unscale — the
    encoder's jit cache is keyed on that flag, so the graph must actually
    change with it)."""
    from embodied_clip_tpu.ops.quantize import _requant_signed as _rq

    return _rq(x.astype(jnp.float32), a_scale)


def _ln(x, p, eps: float = 1e-5):
    """f32 LayerNorm (flax semantics) over the last axis."""
    x = x.astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps)
    return y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)


def _attention_core(q, k, v, num_heads: int, dtype):
    """The high-precision attention middle (mirrors models/transformer.py:
    f32-accumulated logits/out einsums, f32 softmax)."""
    n, t, c = q.shape
    head_dim = c // num_heads
    q = q.reshape(n, t, num_heads, head_dim)
    k = k.reshape(n, t, num_heads, head_dim)
    v = v.reshape(n, t, num_heads, head_dim)
    logits = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                        preferred_element_type=jnp.float32)
    logits = logits / (head_dim ** 0.5)
    attn = jax.nn.softmax(logits, axis=-1).astype(dtype)
    out = jnp.einsum("nhqk,nkhd->nqhd", attn, v,
                     preferred_element_type=jnp.float32)
    return out.astype(dtype).reshape(n, t, c)


def _forward(params: Dict[str, Any], x, num_heads: int, layers: int,
             dtype, q: Dict[str, Any] | None, scales: Dict[str, jnp.ndarray],
             collect: bool, quant_attn: bool = True,
             conv_dense: bool = False):
    """Shared ViT forward skeleton.

    collect=True: f32 calibration pass — records per-tensor |max| at each
    dense input into `scales` and runs the f32 kernels.
    collect=False: serving pass — each dense input requantizes to signed s8
    (scale from `scales`) and the dot runs s8×s8→s32, dequantized in the
    epilogue with the fused (a_scale · w_scale[out]) multiplier + bias."""
    p = params

    def dense(name: str, block_q, block_p, t, key: str, use_q: bool = True):
        if collect:
            scales[key] = jnp.max(jnp.abs(t.astype(jnp.float32))) / _QMAX + 1e-30
            w = block_p[name]
            return (t.astype(jnp.float32) @ w["kernel"].astype(jnp.float32)
                    + w["bias"].astype(jnp.float32))
        if not use_q:
            # bf16 dense from the fp tree (ECT_VIT_QUANT_ATTN=0 variant):
            # wins in ISOLATED dot benches at the attention shapes but loses
            # in-graph — see quantized_vit_apply's docstring.
            w = block_p[name]
            y = jnp.einsum("ntc,cd->ntd", t.astype(dtype),
                           w["kernel"].astype(dtype),
                           preferred_element_type=jnp.float32)
            return y + w["bias"].astype(jnp.float32)
        a = scales[key]
        t8 = _requant_signed(t, a)
        qd = block_q[name]
        if conv_dense and name == "out_proj":
            # s8 1x1-conv form of the (6400,768)x(768,768) contraction: XLA's
            # conv emitter runs it at 117 TOPS where its dot emitter manages
            # only 53 (isolated probe, STATUS.md r5). NHWC (n,t,1,c) is a
            # free reshape of (n,t,c).
            nb, tt, cc = t8.shape
            y = jax.lax.conv_general_dilated(
                t8.reshape(nb, tt, 1, cc),
                qd["kernel_q"].reshape(1, 1, cc, -1), (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ).reshape(nb, tt, -1)
        else:
            y = jnp.einsum("ntc,cd->ntd", t8, qd["kernel_q"],
                           preferred_element_type=jnp.int32)
        return (y.astype(jnp.float32) * (jnp.asarray(a, jnp.float32)
                                         * qd["w_scale"])
                + block_p[name]["bias"].astype(jnp.float32))

    cdt = jnp.float32 if collect else dtype

    # patch embed (bf16/f32 conv, stride = patch size) + tokens + ln_pre
    kern = p["patch_embed"]["kernel"].astype(cdt)
    ps = kern.shape[0]
    n, h, w, _ = x.shape
    x = jax.lax.conv_general_dilated(
        x.astype(cdt), kern, (ps, ps), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    grid = (h // ps) * (w // ps)
    width = kern.shape[-1]
    x = x.reshape(n, grid, width)
    cls = jnp.broadcast_to(p["class_embedding"].astype(cdt), (n, 1, width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + p["positional_embedding"][None].astype(cdt)
    x = _ln(x, p["ln_pre"]).astype(cdt)

    tr = p["transformer"]
    for i in range(layers):
        bp = tr[f"block{i}"]
        bq = None if collect else q["blocks"][f"block{i}"]
        attn_p = {"in_proj": bp["attn"]["in_proj"],
                  "out_proj": bp["attn"]["out_proj"],
                  "mlp_fc": bp["mlp_fc"], "mlp_proj": bp["mlp_proj"]}
        y = _ln(x, bp["ln_1"]).astype(cdt)
        qkv = dense("in_proj", bq, attn_p, y, f"block{i}/attn_in",
                    use_q=quant_attn)
        qq, kk, vv = jnp.split(qkv.astype(cdt), 3, axis=-1)
        o = _attention_core(qq, kk, vv, num_heads, cdt)
        o = dense("out_proj", bq, attn_p, o, f"block{i}/attn_out_in",
                  use_q=quant_attn)
        x = x + o.astype(cdt)
        y = _ln(x, bp["ln_2"]).astype(cdt)
        y = dense("mlp_fc", bq, attn_p, y, f"block{i}/mlp_in")
        y = _quick_gelu(y.astype(jnp.float32))
        y = dense("mlp_proj", bq, attn_p, y.astype(cdt), f"block{i}/mlp_proj_in")
        x = x + y.astype(cdt)

    x = _ln(x[:, 0], p["ln_post"])
    return (x @ p["proj"].astype(jnp.float32)).astype(dtype)


def quantize_vit(params: Dict[str, Any], x_calib, num_heads: int,
                 layers: int) -> Dict[str, Any]:
    """Calibrate + quantize the ViT tower. `x_calib` is a PREPROCESSED
    representative frame batch (same contract as quantize_trunk: real frames,
    never noise — per-tensor maxima on noise clip natural images).

    Returns the serving tree: per-block int8 dense kernels + per-output-channel
    weight scales, per-tensor activation scales, and the high-precision
    leftovers (patch embed, LNs, biases, class/pos embeddings, projection)."""
    scales: Dict[str, jnp.ndarray] = {}
    _forward(params, x_calib, num_heads, layers, jnp.float32,
             None, scales, collect=True)

    blocks: Dict[str, Any] = {}
    fp_blocks: Dict[str, Any] = {}
    for i in range(layers):
        bp = params["transformer"][f"block{i}"]
        blocks[f"block{i}"] = {
            "in_proj": _quantize_dense_kernel(bp["attn"]["in_proj"]["kernel"]),
            "out_proj": _quantize_dense_kernel(bp["attn"]["out_proj"]["kernel"]),
            "mlp_fc": _quantize_dense_kernel(bp["mlp_fc"]["kernel"]),
            "mlp_proj": _quantize_dense_kernel(bp["mlp_proj"]["kernel"]),
        }
        # keep what the serving pass reads: LNs + dense biases, plus the attn
        # dense kernels in bf16 for the flag-gated ECT_VIT_QUANT_ATTN=0
        # variant (bf16 attention denses; measured slower in-graph — see
        # quantized_vit_apply).
        fp_blocks[f"block{i}"] = {
            "ln_1": bp["ln_1"], "ln_2": bp["ln_2"],
            "attn": {
                "in_proj": {
                    "kernel": jnp.asarray(bp["attn"]["in_proj"]["kernel"],
                                          jnp.bfloat16),
                    "bias": bp["attn"]["in_proj"]["bias"],
                },
                "out_proj": {
                    "kernel": jnp.asarray(bp["attn"]["out_proj"]["kernel"],
                                          jnp.bfloat16),
                    "bias": bp["attn"]["out_proj"]["bias"],
                },
            },
            "mlp_fc": {"bias": bp["mlp_fc"]["bias"]},
            "mlp_proj": {"bias": bp["mlp_proj"]["bias"]},
        }
    fp = {
        "patch_embed": params["patch_embed"],
        "class_embedding": params["class_embedding"],
        "positional_embedding": params["positional_embedding"],
        "ln_pre": params["ln_pre"], "ln_post": params["ln_post"],
        "proj": params["proj"],
        "transformer": fp_blocks,
    }
    # arrays only — this function runs under jit (encoders.quantize), so
    # static config (num_heads/layers) is passed to apply by the caller
    return {"fp": fp, "blocks": blocks, "act_scales": scales}


def quantized_vit_apply(q: Dict[str, Any], x, num_heads: int, layers: int,
                        out_dtype=jnp.bfloat16):
    """int8 ViT forward: x is the preprocessed image batch (f32/bf16 NHWC).
    Returns the CLIP embedding in out_dtype.

    Per-layer precision (trace-time flag `ECT_VIT_QUANT_ATTN`, default 1 =
    all four dense layers s8). ECT_VIT_QUANT_ATTN=0 runs in_proj/out_proj as
    bf16 dots instead — motivated by isolated dot benches (XLA's s8 dot
    emitter is slower than bf16 at the attention shapes: 53-186 TOPS s8 vs
    116-205 TFLOP/s bf16) but measured SLOWER in-graph (12.16k vs 12.68k f/s,
    STATUS.md r5 — the bf16 activations' extra traffic and lost requant
    fusions outweigh the dot-level win; the same isolated-win inversion as
    the RN50 kernel campaign). Kept flag-gated for re-measurement on future
    XLA versions."""
    import os

    quant_attn = os.environ.get("ECT_VIT_QUANT_ATTN", "1") == "1"
    conv_dense = os.environ.get("ECT_VIT_CONV_OUT", "0") == "1"
    return _forward(q["fp"], x, num_heads, layers,
                    out_dtype, q, q["act_scales"], collect=False,
                    quant_attn=quant_attn, conv_dense=conv_dense)
