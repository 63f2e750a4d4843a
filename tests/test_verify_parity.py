"""Real-weight parity harness, verified hermetically (VERDICT round-1 next #6).

The harness's two halves — tools/capture_reference_activations.py (torch side) and
the `verify-parity` CLI (our side) — are run end-to-end here on an oracle-generated
FULL-SIZE RN50 checkpoint (authentic state_dict layout, random weights). On contact
with real reference weights (clip.load('RN50') / torchvision), the identical commands
check the actual ≤1e-3-cosine north star (BASELINE.json)."""

import json
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))

import torch_oracle as O  # noqa: E402
from capture_reference_activations import capture  # noqa: E402

from embodied_clip_tpu.parity import (  # noqa: E402
    cosine_distance, golden_frames, verify_encoder_parity,
)


def test_golden_frames_deterministic():
    a, b = golden_frames(n=2), golden_frames(n=2)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.uint8 and a.shape == (2, 300, 300, 3)


def test_cosine_distance_basics():
    a = np.random.RandomState(0).randn(4, 16).astype(np.float32)
    assert cosine_distance(a, a) < 1e-12
    assert cosine_distance(a, -a) > 1.9


@pytest.mark.parametrize("encoder,builder", [
    ("clip_rn50",
     lambda: O.ModifiedResNetOracle((3, 4, 6, 3), 64, 32, 1024, 224)),
    ("imagenet_rn18",
     lambda: O.TVResNetTrunk((2, 2, 2, 2), block="basic")),
])
@pytest.mark.slow
def test_verify_parity_full_size_oracle(tmp_path, encoder, builder):
    torch.manual_seed(7)
    model = builder()
    ckpt = str(tmp_path / f"{encoder}_sd.pt")
    torch.save(model.state_dict(), ckpt)

    acts_path = str(tmp_path / "ref_acts.npz")
    acts = capture(encoder, ckpt, n_frames=2)
    np.savez_compressed(acts_path, **acts)

    result = verify_encoder_parity(
        encoder, acts_path, torch_checkpoint=ckpt, dtype="float32", threshold=1e-3
    )
    assert result["pass"], json.dumps(result, indent=2)
    # every reference cache key was compared (conv + pools)
    expected = {"clip_rn50": {"clip_conv", "clip_avgpool", "clip_attnpool"},
                "imagenet_rn18": {"imagenet_conv", "imagenet_avgpool"}}[encoder]
    assert set(result["per_key_cosine_distance"]) == expected


@pytest.mark.slow
def test_verify_parity_int8_runs_quantized_graph(tmp_path):
    # --dtype int8 must certify the actual serving graph (fold_bn + PTQ
    # calibrated on the capture frames), not silently re-validate f32
    # (ADVICE r2: parity.py int8 no-op).
    torch.manual_seed(7)
    model = O.TVResNetTrunk((2, 2, 2, 2), block="basic")
    ckpt = str(tmp_path / "rn18_sd.pt")
    torch.save(model.state_dict(), ckpt)
    acts_path = str(tmp_path / "ref_acts.npz")
    np.savez_compressed(acts_path, **capture("imagenet_rn18", ckpt, n_frames=2))

    r_f32 = verify_encoder_parity("imagenet_rn18", acts_path,
                                  torch_checkpoint=ckpt, dtype="float32")
    r_int8 = verify_encoder_parity("imagenet_rn18", acts_path,
                                   torch_checkpoint=ckpt, dtype="int8",
                                   threshold=2e-2)
    assert r_int8["pass"], json.dumps(r_int8, indent=2)
    # a genuinely different (quantized) graph ran: measurably farther from the
    # f32 reference than the f32 path is
    assert r_int8["worst"] > 10 * max(r_f32["worst"], 1e-9)
