"""Navigational-primitive probe heads + losses/metrics.

Functional equivalent of the reference's LinearEncoder (train.py:14-113), rebuilt as
flax modules + pure loss functions:

  object_presence      Linear(D → 52) + sigmoid, BCE            (train.py:27-29,76)
  reachability         Linear(D → 110) + sigmoid, per-sample object-indexed BCE
                                                                 (train.py:30-32,61-63,71-72)
  free_space           Linear(D → 11) + softmax, then F.cross_entropy *on the softmax
                       output* — the reference double-softmax quirk is reproduced
                       bit-faithfully                            (train.py:33-35,64-65,78)
  object_localization  AdaptiveAvgPool2d(3,3) → 1x1 conv(2048→52) + sigmoid over the
                       9 cells, BCE                              (train.py:42-49,59,69-70)

Valid (embedding × prediction) combos and input dims mirror train.py:19-25,43:
pooled probes accept imagenet_avgpool/clip_avgpool (2048) or clip_attnpool (1024);
localization uses the conv map (the data layer remaps *_avgpool → *_conv).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from embodied_clip_tpu.constants import MAX_FORWARD_STEPS, TARGET_OBJECTS
from embodied_clip_tpu.utils.metrics import argmax_accuracy, binary_accuracy, f1_score

__all__ = [
    "PREDICTION_TYPES", "EMBEDDING_TYPES", "validate_combo",
    "PooledProbe", "LocalizationProbe", "build_probe",
    "probe_loss", "probe_metrics", "adaptive_avg_pool",
]

PREDICTION_TYPES = ("object_presence", "object_localization", "reachability", "free_space")
EMBEDDING_TYPES = ("imagenet_avgpool", "clip_avgpool", "clip_attnpool")

_POOLED_OUT = {
    "object_presence": len(TARGET_OBJECTS),
    "reachability": 110,
    "free_space": MAX_FORWARD_STEPS + 1,
}


def validate_combo(embedding_type: str, prediction_type: str) -> None:
    assert prediction_type in PREDICTION_TYPES, prediction_type
    if prediction_type == "object_localization":
        assert embedding_type in ("imagenet_avgpool", "clip_avgpool"), (
            "localization probes the conv map of avgpool-style encoders (train.py:43)"
        )
    else:
        assert embedding_type in EMBEDDING_TYPES, embedding_type


class PooledProbe(nn.Module):
    """Single linear layer over a pooled embedding; returns LOGITS (activation folded
    into the loss — same math as the reference's in-model sigmoid/softmax)."""

    output_dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.output_dim, name="linear")(x.astype(jnp.float32))


def adaptive_avg_pool(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d semantics on NHWC: bin i spans
    [floor(i·H/O), ceil((i+1)·H/O)). Static shapes → unrolled means, XLA-fusable."""
    n, h, w, c = x.shape
    oh, ow = out_hw
    rows = []
    for i in range(oh):
        r0, r1 = (i * h) // oh, -(-((i + 1) * h) // oh)
        cols = []
        for j in range(ow):
            c0, c1 = (j * w) // ow, -(-((j + 1) * w) // ow)
            cols.append(jnp.mean(x[:, r0:r1, c0:c1, :], axis=(1, 2)))
        rows.append(jnp.stack(cols, axis=1))
    return jnp.stack(rows, axis=1)  # (n, oh, ow, c)


class LocalizationProbe(nn.Module):
    """Adaptive 3×3 pool + 1×1 conv (= per-cell Dense) over the conv map; returns
    logits shaped (N, 9, num_classes) — cell-major, matching the reference's
    permute(0,2,1).flatten ordering (train.py:69-70)."""

    num_classes: int = len(TARGET_OBJECTS)

    @nn.compact
    def __call__(self, x):
        x = adaptive_avg_pool(x.astype(jnp.float32), (3, 3))
        x = nn.Dense(self.num_classes, name="cell_linear")(x)  # 1x1 conv == Dense on C
        n = x.shape[0]
        return x.reshape(n, 9, self.num_classes)


def build_probe(embedding_type: str, prediction_type: str) -> nn.Module:
    validate_combo(embedding_type, prediction_type)
    if prediction_type == "object_localization":
        return LocalizationProbe()
    return PooledProbe(_POOLED_OUT[prediction_type])


# ------------------------------------------------------------------ losses / metrics


def _bce_with_logits(logits, targets):
    # == torch F.binary_cross_entropy(sigmoid(logits), targets), mean reduction.
    t = targets.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * t + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def probe_loss(prediction_type: str, logits, labels):
    """Loss with reference-exact semantics. `labels`: presence (N,52); localization
    (N,9,52) or (N,3,3,52); reachability (obj_idx (N,), y (N,)); free_space (N,)."""
    if prediction_type == "object_presence":
        return _bce_with_logits(logits, labels)
    if prediction_type == "object_localization":
        labels = labels.reshape(labels.shape[0], 9, -1)
        return _bce_with_logits(logits, labels)
    if prediction_type == "reachability":
        obj_idx, y = labels
        sel = jnp.take_along_axis(logits, obj_idx[:, None].astype(jnp.int32), axis=1)[:, 0]
        return _bce_with_logits(sel, y)
    if prediction_type == "free_space":
        y = jnp.minimum(labels, MAX_FORWARD_STEPS).astype(jnp.int32)  # train.py:64-65
        # Reference quirk (train.py:35,78): CE applied to softmax *probabilities*.
        probs = jax.nn.softmax(logits, axis=1)
        logp = jax.nn.log_softmax(probs, axis=1)
        return -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
    raise ValueError(prediction_type)


def probe_metrics(prediction_type: str, logits, labels):
    """accuracy metric per reference train.py:84-90."""
    if prediction_type in ("object_presence", "object_localization"):
        if prediction_type == "object_localization":
            labels = labels.reshape(labels.shape[0], 9, -1)
        return {"accuracy": f1_score(jax.nn.sigmoid(logits), labels)}
    if prediction_type == "reachability":
        obj_idx, y = labels
        sel = jnp.take_along_axis(logits, obj_idx[:, None].astype(jnp.int32), axis=1)[:, 0]
        return {"accuracy": binary_accuracy(jax.nn.sigmoid(sel), y)}
    if prediction_type == "free_space":
        y = jnp.minimum(labels, MAX_FORWARD_STEPS).astype(jnp.int32)
        return {"accuracy": argmax_accuracy(logits, y)}
    raise ValueError(prediction_type)
