"""stem3 im2col Pallas kernel (ops/pallas/stem_kernel.py) vs the XLA stem
composition: every integer op (requant, pool) is exact; the conv's f32
accumulation order is compiler-chosen, so across separately compiled programs
a tiny fraction of elements may flip by one s8 step at requant ties — the same
contract as the fused stage-1 kernel."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax


def _xla_ref(x, kernel, bias, scale):
    from embodied_clip_tpu.ops.quantize import _avg_pool_int8, _requant

    out = lax.conv_general_dilated(
        x.astype(jnp.bfloat16), jnp.asarray(kernel, jnp.bfloat16), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + jnp.asarray(bias, jnp.float32)
    return _avg_pool_int8(_requant(out, scale), 2)


def test_stem3_kernel_matches_xla_stem():
    from embodied_clip_tpu.ops.pallas.stem_kernel import stem3_requant_pool_int8

    rng = np.random.RandomState(0)
    n, h, w, cin, cout = 2, 16, 16, 32, 64
    x = jnp.asarray(np.abs(rng.randn(n, h, w, cin)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    kernel = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1
    bias = rng.randn(cout).astype(np.float32) * 0.05
    scale = jnp.float32(2.3 / 127)

    want = np.asarray(jax.jit(
        lambda t: _xla_ref(t, kernel, bias, scale))(x)).astype(np.int32)
    for bt in (1, 2):
        got = np.asarray(stem3_requant_pool_int8(
            x, kernel, bias, scale, batch_tile=bt, interpret=True)
        ).astype(np.int32)
        diff = np.abs(got - want)
        assert diff.max() <= 1, diff.max()
        assert (diff != 0).mean() <= 0.005, (diff != 0).mean()


def test_stem3_kernel_multi_chunk_rows():
    """Force rc < h so the r0 loop, chunked pad slicing, and out_ref row-slice
    writes run in CI (ADVICE r3: the auto-sized rc covers these shapes in one
    chunk, leaving the multi-chunk path untested)."""
    from embodied_clip_tpu.ops.pallas.stem_kernel import stem3_requant_pool_int8

    rng = np.random.RandomState(1)
    n, h, w, cin, cout = 2, 16, 16, 32, 64
    x = jnp.asarray(np.abs(rng.randn(n, h, w, cin)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    kernel = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1
    bias = rng.randn(cout).astype(np.float32) * 0.05
    scale = jnp.float32(2.3 / 127)

    want = np.asarray(jax.jit(
        lambda t: _xla_ref(t, kernel, bias, scale))(x)).astype(np.int32)
    one_chunk = np.asarray(stem3_requant_pool_int8(
        x, kernel, bias, scale, interpret=True)).astype(np.int32)
    for rc in (2, 4, 8):
        got = np.asarray(stem3_requant_pool_int8(
            x, kernel, bias, scale, interpret=True, row_chunk=rc)
        ).astype(np.int32)
        # chunking changes only the loop structure, not the math
        np.testing.assert_array_equal(got, one_chunk)
        assert np.abs(got - want).max() <= 1


@pytest.mark.slow
def test_quantized_trunk_pallas_stem_integration():
    """quantized_trunk_apply(pallas_stem=True) routes the stem through the
    kernel and stays within the tie contract vs the XLA path end to end."""
    from embodied_clip_tpu.models.encoders import build_encoder
    from embodied_clip_tpu.ops import quantize as qz

    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, (2, 160, 160, 3), np.uint8)
    enc = build_encoder("clip_rn_tiny", dtype=jnp.float32).fold_bn()
    qenc = enc.quantize(frames)

    x = qenc.preprocess(jnp.asarray(frames))
    fused = qz.quantized_trunk_apply(qenc.qtrunk, x, qenc.stage_sizes,
                                     pallas_stem=True)
    plain = qz.quantized_trunk_apply(qenc.qtrunk, x, qenc.stage_sizes)
    f = np.asarray(fused, np.float32)
    p = np.asarray(plain, np.float32)
    # Downstream int8 stages amplify 1-step stem requant flips, and the tiny
    # random trunk (4x4 output) amplifies far more than the real RN50 — the
    # strict ±1-step contract is pinned by the unit test above; here require
    # the end-to-end feature map to stay essentially identical.
    denom = np.linalg.norm(f) * np.linalg.norm(p) + 1e-9
    cos = float((f * p).sum() / denom)
    assert cos > 1 - 1e-3, cos
    assert np.isfinite(f).all()
