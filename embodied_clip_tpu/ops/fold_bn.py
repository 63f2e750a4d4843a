"""Frozen-BatchNorm folding for inference encoders.

For a frozen encoder (the reference's only mode for CLIP/ImageNet backbones,
thor_image_features.py:26-33), BN at inference is a per-channel affine with constant
coefficients, so it folds exactly into the preceding conv:

    scale = γ / sqrt(var + ε)
    W'    = W · scale        (per output channel)
    b'    = β − mean · scale

This transforms a {conv/kernel, bn/{scale,bias}} + batch_stats variable tree into a
{conv/{kernel,bias}} tree for the *folded* module variants (ResNet/ModifiedResNet with
`folded=True`), eliminating every BN op and f32 cast island from the inference graph —
pure conv+bias+relu in the compute dtype.

Folding is exact in f32; under a bf16 trunk the only difference is which side of the
multiply bf16 rounding lands on (same error order as the conv itself).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

__all__ = ["fold_conv_bn_tree"]

_EPS = 1e-5


def _fold_one(cb_params: Dict[str, Any], cb_stats: Dict[str, Any]) -> Dict[str, Any]:
    # Device-side (jnp, jit-friendly) so folding never round-trips params through the
    # host; wrap the whole-tree call in jax.jit for a single compiled program.
    kernel = jnp.asarray(cb_params["conv"]["kernel"], jnp.float32)
    gamma = jnp.asarray(cb_params["bn"]["scale"], jnp.float32)
    beta = jnp.asarray(cb_params["bn"]["bias"], jnp.float32)
    mean = jnp.asarray(cb_stats["bn"]["mean"], jnp.float32)
    var = jnp.asarray(cb_stats["bn"]["var"], jnp.float32)
    scale = gamma * jax.lax.rsqrt(var + _EPS)
    return {
        "conv": {
            "kernel": kernel * scale,
            "bias": beta - mean * scale,
        }
    }


def fold_conv_bn_tree(params: Dict[str, Any], batch_stats: Dict[str, Any]) -> Dict[str, Any]:
    """Recursively fold every {conv,bn} pair; other subtrees pass through unchanged."""
    out: Dict[str, Any] = {}
    for key, sub in params.items():
        if isinstance(sub, dict) and "conv" in sub and "bn" in sub:
            out[key] = _fold_one(sub, batch_stats[key])
        elif isinstance(sub, dict):
            out[key] = fold_conv_bn_tree(sub, batch_stats.get(key, {}))
        else:
            out[key] = sub
    return out
