"""BN folding: the folded inference graph must match the unfolded one exactly (f32)."""

import numpy as np
import pytest

import jax.numpy as jnp

from embodied_clip_tpu.models.encoders import build_encoder


@pytest.mark.slow
def test_folded_encoder_matches_unfolded():
    enc = build_encoder("imagenet_rn18")
    # Randomize BN statistics so folding is non-trivial.
    import jax

    key = jax.random.PRNGKey(3)
    stats = enc.variables["batch_stats"]
    leaves, treedef = jax.tree.flatten(stats)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        k = jax.random.fold_in(key, i)
        new_leaves.append(jnp.abs(jax.random.normal(k, leaf.shape)) + 0.5)
    enc.variables["batch_stats"] = jax.tree.unflatten(treedef, new_leaves)

    folded = enc.fold_bn()
    frames = np.random.RandomState(0).randint(0, 256, (2, 224, 224, 3), np.uint8)
    a = enc.encode(jnp.asarray(frames))
    b = folded.encode(jnp.asarray(frames))
    for key_ in a:
        ref = np.asarray(a[key_], np.float32)
        got = np.asarray(b[key_], np.float32)
        denom = np.abs(ref).max() + 1e-6
        assert np.abs(ref - got).max() / denom < 2e-5, key_


@pytest.mark.slow
def test_folded_clip_visual_runs():
    enc = build_encoder("clip_rn50").fold_bn()
    frames = np.random.RandomState(1).randint(0, 256, (1, 224, 224, 3), np.uint8)
    out = enc.encode(jnp.asarray(frames))
    assert set(out) == {"clip_conv", "clip_avgpool", "clip_attnpool"}
