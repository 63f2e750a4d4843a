"""Fused residual-bottleneck pallas kernel: exactness vs the XLA composition
(interpret mode). Status: experimental — see ops/pallas/bottleneck_kernel.py and
STATUS.md perf notes (XLA is already at the HBM roofline per block on v5e)."""

import numpy as np

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
