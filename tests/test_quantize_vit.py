"""int8 ViT tower (ops/quantize_vit.py): the transformer blocks' dense layers
run s8×s8→s32 with fused dequant epilogues; LNs/attention-core/GELU/residuals
stay high-precision. Numerics validated against the f32 module path — same
harness shape as the ResNet int8 tests (tests/test_quantize.py)."""

import numpy as np

import jax.numpy as jnp

from embodied_clip_tpu.models.encoders import build_encoder
from embodied_clip_tpu.parity import cosine_distance, golden_frames


def test_int8_vit_close_to_f32():
    frames = golden_frames(n=8, size=96)
    ref_enc = build_encoder("clip_vit_tiny", dtype=jnp.float32)
    ref = ref_enc.encode(frames)["clip_embed"]

    qenc = ref_enc.quantize(frames)
    out = qenc.encode(frames)["clip_embed"]

    assert out.shape == ref.shape
    d = cosine_distance(np.asarray(ref, np.float32),
                        np.asarray(out, np.float32))
    # per-tensor-activation PTQ on a transformer: looser than the ResNet
    # trunk's conv budget but must stay in clearly-correlated territory
    assert d < 2e-2, f"clip_embed cosine distance {d}"


def test_vit_int8_encoder_in_rl_config():
    """`--override encoder=clip_vit_* encoder_dtype=int8` quantizes the ViT
    (no more bf16 fallback) and still routes the flat-embed policy path."""
    import dataclasses as _dc

    from embodied_clip_tpu.config.experiments import get_experiment

    exp = get_experiment("objectnav_robothor_rgb_clipresnet50gru_ddppo")
    exp = _dc.replace(exp, encoder="clip_vit_tiny", encoder_dtype="int8",
                      env_batch=4, hidden=32)
    vis = exp._encode_fn()(np.zeros((2, 64, 64, 3), np.uint8))
    assert vis.ndim == 2
    assert np.isfinite(np.asarray(vis, np.float32)).all()


def test_vit_quant_attn_variants_close_and_distinct():
    """ECT_VIT_QUANT_ATTN selects the attention-dense precision at trace time
    (0 = bf16 attn denses + s8 MLP, the measured-fastest split; 1 = all-s8).
    Both variants must stay close to f32, and the flag must actually retrace
    (the two graphs produce different outputs — guards the ADVICE-r4 stale-jit
    failure mode)."""
    import os

    frames = golden_frames(n=8, size=96)
    ref_enc = build_encoder("clip_vit_tiny", dtype=jnp.float32)
    ref = np.asarray(ref_enc.encode(frames)["clip_embed"], np.float32)
    qenc = ref_enc.quantize(frames)

    outs = {}
    prev = os.environ.get("ECT_VIT_QUANT_ATTN")
    try:
        for flag in ("0", "1"):
            os.environ["ECT_VIT_QUANT_ATTN"] = flag
            outs[flag] = np.asarray(qenc.encode(frames)["clip_embed"],
                                    np.float32)
    finally:
        if prev is None:
            os.environ.pop("ECT_VIT_QUANT_ATTN", None)
        else:
            os.environ["ECT_VIT_QUANT_ATTN"] = prev

    for flag, out in outs.items():
        d = cosine_distance(ref, out)
        assert d < 2e-2, f"ECT_VIT_QUANT_ATTN={flag}: cosine {d}"
    # bf16-attn variant quantizes strictly fewer layers -> closer to f32
    assert (cosine_distance(ref, outs["0"])
            <= cosine_distance(ref, outs["1"]) + 1e-6)
    assert not np.array_equal(outs["0"], outs["1"]), \
        "flag flip did not retrace: both settings ran the same graph"


def test_int8_vit_idempotent_and_schema():
    frames = golden_frames(n=4, size=96)
    enc = build_encoder("clip_vit_tiny", dtype=jnp.float32)
    q = enc.quantize(frames)
    assert q.quantize(frames) is q  # idempotent (f32 params are gone)
    out = q.encode(frames)
    assert set(out) == {"clip_embed"}
    assert np.isfinite(np.asarray(out["clip_embed"], np.float32)).all()
    # quantized kernels really are int8
    b0 = q.variables["qtrunk"]["blocks"]["block0"]
    for name in ("in_proj", "out_proj", "mlp_fc", "mlp_proj"):
        assert b0[name]["kernel_q"].dtype == jnp.int8
