"""int8 trunk quantization (ops/quantize.py): numerics vs the folded f32 path on
the full ModifiedResNet code path (tiny config), scale/shape invariants."""

import numpy as np
import pytest

import jax.numpy as jnp

from embodied_clip_tpu.models.encoders import build_encoder
from embodied_clip_tpu.parity import cosine_distance


@pytest.fixture(scope="module")
def encs():
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (4, 160, 160, 3), np.uint8)
    enc = build_encoder("clip_rn_tiny", dtype=jnp.float32).fold_bn()
    qenc = enc.quantize(frames[:2])
    return enc, qenc, frames


def test_quantized_outputs_close_to_f32(encs):
    enc, qenc, frames = encs
    ref = enc.encode(frames)
    out = qenc.encode(frames)
    assert set(out) == {"clip_conv", "clip_avgpool", "clip_attnpool"}
    for k in ref:
        assert out[k].shape == ref[k].shape
        d = cosine_distance(np.asarray(ref[k], np.float32),
                            np.asarray(out[k], np.float32))
        assert d < 1e-3, (k, d)


def test_quantized_params_are_int8(encs):
    _, qenc, _ = encs
    q = qenc.qtrunk
    assert q["layer1_0/cb2"]["kernel_q"].dtype == jnp.int8
    # per-output-channel weight scales
    k = q["layer2_0/cb1"]
    assert k["w_scale"].shape == (k["kernel_q"].shape[-1],)
    # activation scales are positive scalars
    for name, s in q["act_scales"].items():
        assert float(s) > 0.0, name


def test_quantized_encode_deterministic(encs):
    _, qenc, frames = encs
    a = qenc.encode(frames)
    b = qenc.encode(frames)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k], np.float32),
                                      np.asarray(b[k], np.float32))



@pytest.mark.slow
def test_quantized_imagenet_resnet_close_to_f32():
    """int8 torchvision-family trunk (basic blocks, stride-2 convs, int8-grid
    stem maxpool) stays within the 1e-3 cosine budget vs the f32 path."""
    rng = np.random.RandomState(1)
    frames = rng.randint(0, 256, (4, 96, 96, 3), np.uint8)
    enc = build_encoder("imagenet_rn18", dtype=jnp.float32).fold_bn()
    qenc = enc.quantize(frames[:2])
    ref = enc.encode(frames)
    out = qenc.encode(frames)
    assert set(out) == {"imagenet_conv", "imagenet_avgpool"}
    for k in ref:
        d = cosine_distance(np.asarray(ref[k], np.float32),
                            np.asarray(out[k], np.float32))
        assert d < 1e-3, (k, d)

def test_int8_stem_variants_close_to_f32(encs, monkeypatch):
    """Flag-gated int8-stem variants (ECT_INT8_STEM=stem3|full) stay inside the
    1e-3 cosine budget. Both measured SLOWER than the bf16 stem on v5e
    (STATUS.md round-4 negative results) and default off; this pins their
    numerics so the recorded measurements stay reproducible."""
    enc, qenc, frames = encs
    ref = enc.encode(frames)
    for variant in ("stem3", "full"):
        monkeypatch.setenv("ECT_INT8_STEM", variant)
        out = qenc.encode(frames)
        for k in ref:
            d = cosine_distance(np.asarray(ref[k], np.float32),
                                np.asarray(out[k], np.float32))
            assert d < 1e-3, (variant, k, d)

def test_fuse_pointwise_bit_exact(encs, monkeypatch):
    """ECT_FUSE_POINTWISE=1 routes every block-boundary cb3+residual+requant /
    cb1+requant pair through the cross-block Pallas kernel (fused_cb3_cb1_int8)
    — every dot in the kernel is integer-exact and the epilogues mirror the
    XLA graph op-for-op, so the conv map is BIT-exact vs the default graph."""
    _, qenc, frames = encs
    monkeypatch.setenv("ECT_FUSE_POINTWISE", "0")
    ref = qenc.encode(frames)
    monkeypatch.setenv("ECT_FUSE_POINTWISE", "1")
    out = qenc.encode(frames)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ref[k], np.float32),
                                      np.asarray(out[k], np.float32), k)

def test_int4_stage1_variants_change_graph(encs, monkeypatch):
    """ECT_INT4_STAGE1 (VERDICT r4 next #1a) stores stage-1's cross-fusion
    activations as S4. Measured a LARGE NEGATIVE on v5e (STATUS.md round-5:
    XLA scalarizes S4 stores — ~20x the cost of s8, and the real graph
    regressed accordingly), and the 4-bit grid costs real fidelity. This pins
    the variants: they genuinely retrace (distinct outputs from the default
    graph) and stay within the coarse-grid error envelope."""
    enc, qenc, frames = encs
    ref = enc.encode(frames)
    base = qenc.encode(frames)
    for variant in ("2", "1"):
        monkeypatch.setenv("ECT_INT4_STAGE1", variant)
        out = qenc.encode(frames)
        changed = float(np.max(np.abs(
            np.asarray(out["clip_conv"], np.float32)
            - np.asarray(base["clip_conv"], np.float32))))
        assert changed > 0.0, f"variant {variant} did not retrace"
        for k in ref:
            d = cosine_distance(np.asarray(ref[k], np.float32),
                                np.asarray(out[k], np.float32))
            assert d < 5e-2, (variant, k, d)
