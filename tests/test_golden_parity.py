"""Golden-fixture parity: torch-oracle reference activations captured once
(tests/golden/clip_rn_tiny.npz, generated from tests/torch_oracle.py at seed 123) —
verifies the flax CLIP ModifiedResNet + attnpool WITHOUT needing torch at test time,
guarding against silent regressions in the jax architecture."""

import os

import numpy as np

from embodied_clip_tpu.models.clip_resnet import AttentionPool2d, ModifiedResNet

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "clip_rn_tiny.npz")


def _unflatten(items):
    tree = {}
    for path, val in items:
        node = tree
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def test_golden_clip_resnet_parity():
    with np.load(GOLDEN) as z:
        x = z["__x__"]
        conv_ref = z["__conv_ref__"]
        embed_ref = z["__embed_ref__"]
        flat = [(k, z[k]) for k in z.files if not k.startswith("__")]
    tree = _unflatten(flat)

    import jax.numpy as jnp

    trunk = ModifiedResNet((1, 1, 1, 1), 8)
    conv = trunk.apply(
        {"params": tree["trunk_params"], "batch_stats": tree["trunk_stats"]},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(conv), conv_ref, atol=5e-4, rtol=5e-4)

    pool = AttentionPool2d(num_heads=2, output_dim=16)
    embed = pool.apply({"params": tree["attn_params"]}, conv)
    np.testing.assert_allclose(np.asarray(embed), embed_ref, atol=1e-3, rtol=1e-3)
