"""Fused pallas preprocess kernel vs the reference XLA path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embodied_clip_tpu import constants
from embodied_clip_tpu.ops.pallas.preprocess_kernel import fused_preprocess_pallas
from embodied_clip_tpu.ops.preprocess import make_preprocessor


@pytest.mark.parametrize("kind,mean,std", [
    ("clip", constants.CLIP_MEAN, constants.CLIP_STD),
    ("imagenet", constants.IMAGENET_MEAN, constants.IMAGENET_STD),
])
def test_fused_kernel_matches_reference_path(kind, mean, std):
    frames = np.random.RandomState(0).randint(0, 256, (2, 300, 300, 3), np.uint8)
    ref = np.asarray(make_preprocessor(kind, 224, jnp.float32)(jnp.asarray(frames)))
    got = np.asarray(fused_preprocess_pallas(
        jnp.asarray(frames), 224, mean, std, dtype=jnp.float32, interpret=True
    ))
    assert got.shape == ref.shape
    # The kernel rounds in the 0..255 domain, the XLA path in 0..1 — f32 rounding can
    # flip isolated pixels by one uint8 LSB at exact .5 boundaries.
    lsb = 1.0 / 255.0 / min(std)
    err = np.abs(ref - got)
    assert err.max() <= 1.5 * lsb, err.max()
    assert (err > 0.5 * lsb).mean() < 1e-3  # flips are rare


def test_grouped_grid_steps_match_ungrouped(monkeypatch):
    """ECT_PP_GROUP=2 packs two images per grid step (images stack along the
    width-pass M; height pass loops per image) — bit-identical to g=1."""
    frames = jnp.asarray(
        np.random.RandomState(2).randint(0, 256, (4, 300, 300, 3), np.uint8))
    args = (frames, 224, constants.CLIP_MEAN, constants.CLIP_STD)
    monkeypatch.setenv("ECT_PP_GROUP", "1")
    ref = np.asarray(fused_preprocess_pallas(*args, dtype=jnp.float32,
                                             interpret=True))
    monkeypatch.setenv("ECT_PP_GROUP", "2")
    got = np.asarray(fused_preprocess_pallas(*args, dtype=jnp.float32,
                                             interpret=True))
    np.testing.assert_array_equal(ref, got)


def test_fused_kernel_upscale_shape():
    frames = np.random.RandomState(1).randint(0, 256, (1, 160, 120, 3), np.uint8)
    got = fused_preprocess_pallas(
        jnp.asarray(frames), 224, constants.CLIP_MEAN, constants.CLIP_STD,
        dtype=jnp.bfloat16, interpret=True,
    )
    assert got.shape == (1, 224, 224, 3) and got.dtype == jnp.bfloat16
