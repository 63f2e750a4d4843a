"""Probe evaluation metrics (jit-friendly).

Parity targets (reference train.py:84-90):
  - object_presence / object_localization: torchmetrics.functional.f1(pred, y) — the
    pinned torchmetrics default is MICRO-averaged F1 over predictions binarized at 0.5.
  - reachability: ((y_pred > 0.5) == y).float().mean()
  - free_space: (argmax(y_pred, dim=1) == y).float().mean()
"""

from __future__ import annotations

import jax.numpy as jnp


def f1_score(probs: jnp.ndarray, targets: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    """Micro-averaged F1 over binarized probabilities (torchmetrics.functional.f1 default)."""
    pred = (probs > threshold).astype(jnp.float32)
    t = targets.astype(jnp.float32)
    tp = jnp.sum(pred * t)
    fp = jnp.sum(pred * (1.0 - t))
    fn = jnp.sum((1.0 - pred) * t)
    denom = 2.0 * tp + fp + fn
    return jnp.where(denom > 0, 2.0 * tp / denom, jnp.float32(0.0))


def binary_accuracy(probs: jnp.ndarray, targets: jnp.ndarray, threshold: float = 0.5) -> jnp.ndarray:
    pred = probs > threshold
    return jnp.mean((pred == (targets > 0.5)).astype(jnp.float32))


def argmax_accuracy(probs: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((jnp.argmax(probs, axis=1) == labels).astype(jnp.float32))
