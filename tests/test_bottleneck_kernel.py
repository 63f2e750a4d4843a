"""Fused residual-bottleneck pallas kernel: exactness vs the XLA composition
(interpret mode). Status: experimental — see ops/pallas/bottleneck_kernel.py and
STATUS.md perf notes (XLA is already at the HBM roofline per block on v5e)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embodied_clip_tpu.ops.pallas.bottleneck_kernel import (
    fused_bottleneck, supports_fused_bottleneck,
)


def _ref(x, w1, b1, w2, b2, w3, b3):
    h1 = jax.nn.relu(jnp.einsum("nhwc,cm->nhwm", x, w1) + b1)
    h2 = jax.lax.conv_general_dilated(
        h1, w2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    h2 = jax.nn.relu(h2 + b2)
    h3 = jnp.einsum("nhwm,mc->nhwc", h2, w3) + b3
    return jax.nn.relu(h3 + x)


def test_fused_bottleneck_matches_xla():
    rng = np.random.RandomState(0)
    n, h, w, c, cm = 4, 10, 10, 32, 8
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32) * 0.5)
    w1 = jnp.asarray(rng.randn(c, cm).astype(np.float32) * 0.1)
    b1 = jnp.asarray(rng.randn(cm).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.randn(3, 3, cm, cm).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.randn(cm).astype(np.float32) * 0.1)
    w3 = jnp.asarray(rng.randn(cm, c).astype(np.float32) * 0.1)
    b3 = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    ref = np.asarray(_ref(x, w1, b1, w2, b2, w3, b3))
    for bt in (1, 2, 4):
        got = np.asarray(fused_bottleneck(
            x, w1, b1, w2, b2, w3, b3, batch_tile=bt, interpret=True))
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_vmem_feasibility_helper():
    assert supports_fused_bottleneck(56, 56, 256, 64)
    assert not supports_fused_bottleneck(112, 112, 2048, 512)


def test_fused_stage1_matches_xla():
    rng = np.random.RandomState(1)
    n, h, w, cin, cm, cout = 2, 8, 8, 16, 8, 32

    def mkblk(c_in):
        return {"w1": jnp.asarray(rng.randn(c_in, cm).astype(np.float32) * 0.1),
                "b1": jnp.asarray(rng.randn(cm).astype(np.float32) * 0.1),
                "w2": jnp.asarray(rng.randn(3, 3, cm, cm).astype(np.float32) * 0.1),
                "b2": jnp.asarray(rng.randn(cm).astype(np.float32) * 0.1),
                "w3": jnp.asarray(rng.randn(cm, cout).astype(np.float32) * 0.1),
                "b3": jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1)}

    blocks = [mkblk(cin), mkblk(cout), mkblk(cout)]
    sc = (jnp.asarray(rng.randn(cin, cout).astype(np.float32) * 0.1),
          jnp.asarray(rng.randn(cout).astype(np.float32) * 0.1))
    x = jnp.asarray(rng.randn(n, h, w, cin).astype(np.float32) * 0.5)

    def pre(x, b):
        h1 = jax.nn.relu(jnp.einsum("nhwc,cm->nhwm", x, b["w1"]) + b["b1"])
        h2 = jax.lax.conv_general_dilated(h1, b["w2"], (1, 1), "SAME",
                                          dimension_numbers=("NHWC", "HWIO", "NHWC"))
        h2 = jax.nn.relu(h2 + b["b2"])
        return jnp.einsum("nhwm,mc->nhwc", h2, b["w3"]) + b["b3"]

    x1 = jax.nn.relu(pre(x, blocks[0]) + jnp.einsum("nhwc,co->nhwo", x, sc[0]) + sc[1])
    x2 = jax.nn.relu(pre(x1, blocks[1]) + x1)
    ref = jax.nn.relu(pre(x2, blocks[2]) + x2)

    from embodied_clip_tpu.ops.pallas.bottleneck_kernel import fused_stage1

    for bt in (1, 2):
        got = fused_stage1(x, blocks, sc, batch_tile=bt, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


def test_fused_stage1_int8_matches_xla_int8_graph():
    """The fused int8 stage-1 kernel vs the XLA int8 graph
    (ops/quantize.quantized_trunk_apply's stage-1 loop): same int8 kernels,
    same f32 epilogue products, same divide-by-scale and +0.5/truncating
    requant — every integer path is bit-exact. The one non-integer reduction
    (the bf16 conv shortcut's f32 accumulation) is compiler-ordered, so across
    two separately compiled programs it can differ by 1 ULP, which flips its
    signed requant on tie elements: outputs may differ by ±1 s8 step on a tiny
    fraction of elements (exact on TPU, where both sides run the MXU's fixed
    accumulation order). Run in interpret mode on CPU."""
    import flax.linen as nn
    from jax import lax

    from embodied_clip_tpu.ops.pallas.bottleneck_kernel import fused_stage1_int8
    from embodied_clip_tpu.ops.quantize import (
        _requant, _requant_signed, stage1_int8_operands,
    )

    rng = np.random.RandomState(0)
    cin, cm, cout, h, w, n = 64, 64, 256, 14, 14, 2

    def qk(ci, co, k=1):
        kern = rng.randn(k, k, ci, co).astype(np.float32) * 0.1
        scale = np.abs(kern).reshape(-1, co).max(0) / 127.0 + 1e-30
        qq = np.clip(np.round(kern / scale), -127, 127).astype(np.int8)
        return {"kernel_q": jnp.asarray(qq), "w_scale": jnp.asarray(scale),
                "bias": jnp.asarray(rng.randn(co).astype(np.float32) * 0.05)}

    q = {"act_scales": {}, "fp": {}}
    a = q["act_scales"]
    a["stem.out"] = jnp.float32(2.0 / 127)
    names = ["layer1_0", "layer1_1", "layer1_2"]
    for i, nm in enumerate(names):
        q[f"{nm}/cb1"] = qk(cin if i == 0 else cout, cm)
        q[f"{nm}/cb2"] = qk(cm, cm, 3)
        q[f"{nm}/cb3"] = qk(cm, cout)
        a[f"{nm}/cb2.in"] = jnp.float32(1.5 / 127)
        a[f"{nm}/cb3.in"] = jnp.float32(1.2 / 127)
        a[f"{nm}.out"] = jnp.float32(2.5 / 127)
    q["fp"]["layer1_0/down"] = {"conv": {
        "kernel": jnp.asarray(rng.randn(1, 1, cin, cout).astype(np.float32) * 0.1),
        "bias": jnp.asarray(rng.randn(cout).astype(np.float32) * 0.05)}}
    a["layer1_0/down.out"] = jnp.float32(1.7 / 127)

    def conv(x, k, pet=None):
        kk = k.shape[0]
        pad = [((kk - 1) // 2,) * 2] * 2
        return lax.conv_general_dilated(
            x, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=pet)

    def qconv(sub, t8, s):
        k = sub["kernel_q"]
        if k.shape[0] == 1:
            out = jnp.einsum("nhwc,cd->nhwd", t8, k[0, 0],
                             preferred_element_type=jnp.int32)
        else:
            out = conv(t8, k, pet=jnp.int32)
        return out.astype(jnp.float32) * (s * sub["w_scale"]) + sub["bias"]

    def ref(t8):
        s_in = a["stem.out"]
        for i, nm in enumerate(names):
            o = nn.relu(qconv(q[f"{nm}/cb1"], t8, s_in))
            o = nn.relu(qconv(q[f"{nm}/cb2"],
                              _requant(o, a[f"{nm}/cb2.in"]), a[f"{nm}/cb2.in"]))
            o = qconv(q[f"{nm}/cb3"],
                      _requant(o, a[f"{nm}/cb3.in"]), a[f"{nm}/cb3.in"])
            if i == 0:
                # the 1×1 shortcut path of quantized_trunk_apply.fp_conv: bf16
                # operands, explicit f32-accumulating einsum, f32 bias add
                sub = q["fp"]["layer1_0/down"]["conv"]
                idt = jnp.einsum(
                    "nhwc,cd->nhwd",
                    (t8.astype(jnp.float32) * s_in).astype(jnp.bfloat16),
                    jnp.asarray(sub["kernel"], jnp.bfloat16)[0, 0],
                    preferred_element_type=jnp.float32) + sub["bias"]
                # s8 shortcut output round-trip, as quantized_trunk_apply does
                ds = a["layer1_0/down.out"]
                idt = _requant_signed(idt, ds).astype(jnp.float32) * ds
            else:
                idt = t8.astype(jnp.float32) * s_in
            s_in = a[f"{nm}.out"]
            t8 = _requant(nn.relu(o + idt), s_in)
        return t8

    x8 = jnp.asarray(rng.randint(0, 90, (n, h, w, cin)), jnp.int8)
    want = np.asarray(jax.jit(ref)(x8)).astype(np.int32)
    ops = jax.jit(lambda: stage1_int8_operands(q))()
    for bt in (1, 2):
        got = np.asarray(
            fused_stage1_int8(x8, ops, batch_tile=bt, interpret=True)
        ).astype(np.int32)
        diff = np.abs(got - want)
        assert diff.max() <= 1, diff.max()
        assert (diff != 0).mean() <= 0.005, (diff != 0).mean()


def _mk_identity_stage(rng, cin, cm, nb, prefix="layer3"):
    """Tiny int8 qtrunk fragment: nb stride-1 identity bottlenecks."""
    def qk(ci, co, k=1):
        kern = rng.randn(k, k, ci, co).astype(np.float32) * (1 / np.sqrt(k * k * ci))
        scale = np.abs(kern).reshape(-1, co).max(0) / 127.0 + 1e-30
        qq = np.clip(np.round(kern / scale), -127, 127).astype(np.int8)
        return {"kernel_q": jnp.asarray(qq), "w_scale": jnp.asarray(scale),
                "bias": jnp.asarray(rng.randn(co).astype(np.float32) * 0.05)}

    q = {"act_scales": {}, "fp": {}}
    a = q["act_scales"]
    names = [f"{prefix}_{i}" for i in range(1, nb + 1)]
    for nm in names:
        q[f"{nm}/cb1"] = qk(cin, cm)
        q[f"{nm}/cb2"] = qk(cm, cm, 3)
        q[f"{nm}/cb3"] = qk(cm, cin)
        a[f"{nm}/cb2.in"] = jnp.float32(1.5 / 127)
        a[f"{nm}/cb3.in"] = jnp.float32(1.2 / 127)
        a[f"{nm}.out"] = jnp.float32(2.1 / 127)
    return q, names


def test_fused_resblocks_int8_matches_xla_int8_graph():
    """fused_resblocks_int8 (identity bottlenecks of stages 2-4 as one VMEM-
    resident kernel) must be BIT-EXACT vs the XLA int8 block loop, for both
    the int8-out (mid-trunk) and bf16-out (trunk-final conv map) epilogues and
    both VMEM carriers. Interpret mode on CPU."""
    import flax.linen as nn
    from jax import lax

    from embodied_clip_tpu.ops.pallas.bottleneck_kernel import fused_resblocks_int8
    from embodied_clip_tpu.ops.quantize import _requant, resblocks_int8_operands

    rng = np.random.RandomState(2)
    cin, cm, h, w, n, nb = 32, 16, 6, 6, 2, 3
    q, names = _mk_identity_stage(rng, cin, cm, nb)
    a = q["act_scales"]
    s_in = jnp.float32(1.8 / 127)

    def qconv(sub, t8, s):
        k = sub["kernel_q"]
        if k.shape[0] == 1:
            out = jnp.einsum("nhwc,cd->nhwd", t8, k[0, 0],
                             preferred_element_type=jnp.int32)
        else:
            out = lax.conv_general_dilated(
                t8, k, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
        return out.astype(jnp.float32) * (s * sub["w_scale"]) + sub["bias"]

    def ref(t8, final_bf16):
        s = s_in
        for i, nm in enumerate(names):
            o = nn.relu(qconv(q[f"{nm}/cb1"], t8, s))
            o = nn.relu(qconv(q[f"{nm}/cb2"],
                              _requant(o, a[f"{nm}/cb2.in"]), a[f"{nm}/cb2.in"]))
            o = qconv(q[f"{nm}/cb3"],
                      _requant(o, a[f"{nm}/cb3.in"]), a[f"{nm}/cb3.in"])
            out = nn.relu(o + t8.astype(jnp.float32) * s)
            if final_bf16 and i == nb - 1:
                return out.astype(jnp.bfloat16)
            s = a[f"{nm}.out"]
            t8 = _requant(out, s)
        return t8

    x8 = jnp.asarray(rng.randint(0, 90, (n, h, w, cin)), jnp.int8)
    s_next = a[f"{names[-1]}.out"]

    # mid-trunk: int8 output on s_next
    want8 = np.asarray(jax.jit(lambda t: ref(t, False))(x8))
    ops, scl = jax.jit(lambda: resblocks_int8_operands(q, names, s_in, s_next))()
    for carrier in (jnp.int8, jnp.bfloat16):
        for bt in (1, 2):
            got = np.asarray(fused_resblocks_int8(
                x8, ops, scl, batch_tile=bt, carrier=carrier, interpret=True))
            np.testing.assert_array_equal(got, want8, err_msg=str((carrier, bt)))

    # trunk-final: bf16 conv-map output skips the last requant
    want16 = np.asarray(jax.jit(lambda t: ref(t, True))(x8), np.float32)
    ops, scl = jax.jit(lambda: resblocks_int8_operands(q, names, s_in, 1.0))()
    got = np.asarray(fused_resblocks_int8(
        x8, ops, scl, batch_tile=1, out_dtype=jnp.bfloat16, interpret=True),
        np.float32)
    np.testing.assert_array_equal(got, want16)


@pytest.mark.slow
def test_quantized_trunk_pallas_resblocks_integration():
    """quantized_trunk_apply(pallas_resblocks=True) routes qualifying identity
    runs through the fused kernel and stays bit-exact vs the XLA path end to
    end (tiny clip trunk; the min-cm gate is lowered to cover its widths)."""
    from embodied_clip_tpu.models.encoders import build_encoder
    from embodied_clip_tpu.ops import quantize as qz

    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, (2, 160, 160, 3), np.uint8)
    enc = build_encoder("clip_rn_tiny", dtype=jnp.float32).fold_bn()
    qenc = enc.quantize(frames)

    x = qenc.preprocess(jnp.asarray(frames))
    old = qz.PALLAS_RESBLOCKS_MIN_CM
    try:
        qz.PALLAS_RESBLOCKS_MIN_CM = 1
        fused = qz.quantized_trunk_apply(qenc.qtrunk, x, qenc.stage_sizes,
                                         pallas_resblocks=True)
    finally:
        qz.PALLAS_RESBLOCKS_MIN_CM = old
    plain = qz.quantized_trunk_apply(qenc.qtrunk, x, qenc.stage_sizes)
    np.testing.assert_array_equal(np.asarray(fused, np.float32),
                                  np.asarray(plain, np.float32))
