"""Preprocess fidelity: the on-chip resize/normalize must match the reference's PIL
pipeline (thor_image_features.py:36-44) within quantization noise."""

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from embodied_clip_tpu import constants
from embodied_clip_tpu.ops import make_preprocessor, resample_weights, resize_bicubic


def _pil_resize(img_u8, size, method=Image.BICUBIC):
    pil = Image.fromarray(img_u8)
    w, h = pil.size
    if isinstance(size, int):
        if h <= w:
            nh, nw = size, max(1, round(w * size / h))
        else:
            nh, nw = max(1, round(h * size / w)), size
    else:
        nh, nw = size
    return np.asarray(pil.resize((nw, nh), method))


def _center_crop(img, ch, cw):
    h, w = img.shape[:2]
    top, left = (h - ch) // 2, (w - cw) // 2
    return img[top : top + ch, left : left + cw]


@pytest.mark.parametrize("in_hw", [(300, 300), (256, 341), (480, 360)])
def test_resize_matches_pil_bicubic(in_hw):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(*in_hw, 3), dtype=np.uint8)
    ours = np.asarray(resize_bicubic(jnp.asarray(img), 224, crop=(224, 224)))
    ref = _center_crop(_pil_resize(img, 224), 224, 224).astype(np.float32) / 255.0
    # We emulate PIL's per-pass uint8 quantization; residual is fixed-point coefficient
    # rounding inside PIL (a couple of LSBs worst-case on iid noise input).
    assert ours.shape == ref.shape == (224, 224, 3)
    err = np.abs(ours - ref)
    assert err.max() <= 2.0 / 255.0 + 1e-6, err.max()
    assert err.mean() < 0.2 / 255.0, err.mean()


def test_resize_weights_row_stochastic():
    for in_size, out_size in [(300, 224), (224, 224), (100, 224), (640, 224)]:
        w = resample_weights(in_size, out_size)
        assert w.shape == (out_size, in_size)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)


def test_upscale_matches_pil():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, size=(100, 100, 3), dtype=np.uint8)
    ours = np.asarray(resize_bicubic(jnp.asarray(img), (224, 224)))
    ref = np.asarray(Image.fromarray(img).resize((224, 224), Image.BICUBIC))
    ref = ref.astype(np.float32) / 255.0
    assert np.abs(ours - ref).max() <= 2.0 / 255.0 + 1e-6


@pytest.mark.parametrize("kind,mean,std", [
    ("imagenet", constants.IMAGENET_MEAN, constants.IMAGENET_STD),
    ("clip", constants.CLIP_MEAN, constants.CLIP_STD),
])
def test_preprocessor_end_to_end(kind, mean, std):
    rng = np.random.RandomState(2)
    frames = rng.randint(0, 256, size=(2, 300, 300, 3), dtype=np.uint8)
    pre = make_preprocessor(kind)
    out = np.asarray(pre(jnp.asarray(frames)))
    assert out.shape == (2, 224, 224, 3)

    ref0 = _center_crop(_pil_resize(frames[0], 224), 224, 224).astype(np.float32) / 255.0
    ref0 = (ref0 - np.array(mean, np.float32)) / np.array(std, np.float32)
    assert np.abs(out[0] - ref0).max() < 2.0 / 255.0 / min(std) + 1e-5


def test_preprocessor_noop_resize_path():
    # Frames already at target size skip the matmuls but still normalize.
    rng = np.random.RandomState(3)
    frames = rng.randint(0, 256, size=(1, 224, 224, 3), dtype=np.uint8)
    pre = make_preprocessor("clip")
    out = np.asarray(pre(jnp.asarray(frames)))
    ref = frames[0].astype(np.float32) / 255.0
    ref = (ref - np.array(constants.CLIP_MEAN, np.float32)) / np.array(constants.CLIP_STD, np.float32)
    np.testing.assert_allclose(out[0], ref, atol=1e-5)


def test_preprocessor_bf16_output():
    pre = make_preprocessor("clip", dtype=jnp.bfloat16)
    frames = jnp.zeros((1, 300, 300, 3), jnp.uint8)
    assert pre(frames).dtype == jnp.bfloat16


def test_preprocessor_flat_channels_input():
    # (n, h, w*3) flat-channels input (the relayout-free device staging layout)
    # matches the NHWC path exactly.
    rng = np.random.RandomState(4)
    frames = rng.randint(0, 256, size=(2, 300, 300, 3), dtype=np.uint8)
    pre = make_preprocessor("clip")
    out_nhwc = np.asarray(pre(jnp.asarray(frames)))
    out_flat = np.asarray(pre(jnp.asarray(frames.reshape(2, 300, 900))))
    np.testing.assert_array_equal(out_nhwc, out_flat)
