"""FrozenEncoder: fused uint8→features graph — key schema, shapes, determinism."""

import numpy as np
import pytest

import jax.numpy as jnp

from embodied_clip_tpu.models.encoders import build_encoder


@pytest.mark.slow
def test_imagenet_rn18_encoder():
    enc = build_encoder("imagenet_rn18")
    frames = np.random.RandomState(0).randint(0, 256, (2, 300, 300, 3), np.uint8)
    out = enc.encode(jnp.asarray(frames))
    assert set(out) == {"imagenet_conv", "imagenet_avgpool"}
    assert out["imagenet_conv"].shape == (2, 7, 7, 512)
    assert out["imagenet_avgpool"].shape == (2, 512)


@pytest.mark.slow
def test_clip_rn50_encoder():
    enc = build_encoder("clip_rn50")
    frames = np.random.RandomState(1).randint(0, 256, (2, 300, 300, 3), np.uint8)
    out = enc.encode(jnp.asarray(frames))
    assert set(out) == {"clip_conv", "clip_avgpool", "clip_attnpool"}
    assert out["clip_conv"].shape == (2, 7, 7, 2048)
    assert out["clip_avgpool"].shape == (2, 2048)
    assert out["clip_attnpool"].shape == (2, 1024)
    # avgpool must equal the spatial mean of the conv map (reference
    # thor_image_features.py:63-66 applies AdaptiveAvgPool2d to the same map).
    np.testing.assert_allclose(
        np.asarray(out["clip_avgpool"]),
        np.asarray(out["clip_conv"]).mean(axis=(1, 2)),
        atol=1e-5,
    )
    # Determinism: same input → identical features.
    out2 = enc.encode(jnp.asarray(frames))
    np.testing.assert_array_equal(np.asarray(out["clip_attnpool"]), np.asarray(out2["clip_attnpool"]))
