"""Real-weight parity harness (torch-free side).

North star: frozen-CLIP features within 1e-3 cosine distance of the reference's
`clip.load('RN50')` outputs (reference generate_data/thor_image_features.py:57,
BASELINE.json). The full check needs real pretrained weights, which cannot be
downloaded in every environment — so the harness is split:

  torch side   tools/capture_reference_activations.py — runs wherever the reference
               stack lives (openai clip package, a torchscript RN50.pt archive, or a
               plain state_dict). Encodes the shared golden frames with the
               reference's exact preprocessing and saves an activations .npz.
  this side    `python -m embodied_clip_tpu verify-parity --encoder clip_rn50
               --torch-checkpoint RN50_state_dict.pt --activations ref_acts.npz`
               converts the weights (models/convert.py), encodes the SAME frames
               through the fused TPU graph, and asserts per-key cosine distance ≤
               threshold.

Both sides share `golden_frames` so no image files need shipping. The harness itself
is verified hermetically in tests/test_verify_parity.py with an oracle-generated
full-size RN50 checkpoint; on contact with real weights the same command checks the
actual north star.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

__all__ = ["golden_frames", "cosine_distance", "verify_encoder_parity"]


def golden_frames(n: int = 8, size: int = 300, seed: int = 0) -> np.ndarray:
    """Deterministic uint8 NHWC frames shared by both harness sides.

    Mixture of smooth gradients (exercises bicubic-resize fidelity — the hard part
    of preprocessing parity, SURVEY.md §7 hard-parts #1) and structured noise
    (exercises the full activation range).
    """
    rng = np.random.RandomState(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size),
                         indexing="ij")
    frames = np.empty((n, size, size, 3), np.uint8)
    for i in range(n):
        phase = rng.uniform(0, 2 * np.pi, 3)
        freq = rng.uniform(1.0, 6.0, 3)
        smooth = np.stack(
            [0.5 + 0.5 * np.sin(2 * np.pi * f * (yy * rng.rand() + xx * rng.rand())
                                + p) for f, p in zip(freq, phase)], axis=-1)
        noise = rng.rand(size, size, 3)
        alpha = rng.uniform(0.2, 0.8)
        img = alpha * smooth + (1 - alpha) * noise
        frames[i] = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    return frames


def cosine_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Max per-sample cosine distance between feature batches (flattened per row)."""
    a = np.asarray(a, np.float64).reshape(a.shape[0], -1)
    b = np.asarray(b, np.float64).reshape(b.shape[0], -1)
    num = (a * b).sum(-1)
    den = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-30
    return float((1.0 - num / den).max())


def _to_nhwc(x: np.ndarray) -> np.ndarray:
    """Accept reference conv maps in either NCHW (torch-native) or NHWC."""
    if x.ndim == 4 and x.shape[1] > x.shape[-1]:
        return np.transpose(x, (0, 2, 3, 1))
    return x


def verify_encoder_parity(
    encoder_name: str,
    activations_path: str,
    torch_checkpoint: Optional[str] = None,
    variables_dir: Optional[str] = None,
    dtype: str = "float32",
    threshold: float = 1e-3,
) -> Dict[str, object]:
    """Encode the captured frames with our converted encoder; compare per key.

    Returns {"pass": bool, "per_key": {key: cosine_distance}, ...}. Keys compared
    are the intersection of the capture's keys and ours (conv maps accepted NCHW
    or NHWC).
    """
    import jax.numpy as jnp

    from embodied_clip_tpu.models.encoders import build_encoder

    with np.load(activations_path) as z:
        frames = z["__frames__"]
        ref = {k: z[k] for k in z.files if not k.startswith("__")}

    if dtype not in ("float32", "bfloat16", "int8"):
        raise ValueError(f"unsupported parity dtype {dtype!r}")
    # int8 runs the actual serving graph: bf16 trunk, BN folded, int8 PTQ
    # calibrated on the capture's own frames — so "pass" certifies the graph
    # that bench.py / extract --dtype int8 really execute.
    jdt = jnp.float32 if dtype == "float32" else jnp.bfloat16
    enc = build_encoder(encoder_name, dtype=jdt, torch_checkpoint=torch_checkpoint)
    if variables_dir is not None:
        from embodied_clip_tpu.utils.checkpoint import restore_pytree

        enc.variables = restore_pytree(variables_dir, enc.variables)
    if dtype == "int8":
        enc = enc.fold_bn().quantize(frames)
    ours = {k: np.asarray(v, np.float32) for k, v in enc.encode(frames).items()}

    per_key = {}
    for k in sorted(set(ref) & set(ours)):
        per_key[k] = cosine_distance(_to_nhwc(ref[k]), _to_nhwc(ours[k]))
    if not per_key:
        raise ValueError(
            f"no comparable keys: capture has {sorted(ref)}, encoder emits {sorted(ours)}"
        )
    worst = max(per_key.values())
    return {
        "encoder": encoder_name,
        "dtype": dtype,
        "threshold": threshold,
        "per_key_cosine_distance": per_key,
        "worst": worst,
        "pass": bool(worst <= threshold),
        "frames": int(frames.shape[0]),
    }
