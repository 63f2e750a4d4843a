"""Full CLIP assembly: contrastive logits, text tower wiring, zero-shot matching."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from embodied_clip_tpu.models.clip_text import TextTransformer
from embodied_clip_tpu.models.clip import CLIP


def _tiny_clip():
    # ViT-B/32-shaped but tiny: patch the config tables for the test.
    from embodied_clip_tpu.models import clip as clip_mod
    from embodied_clip_tpu.models.clip_text import CLIP_TEXT_CONFIGS
    from embodied_clip_tpu.models.clip_vit import CLIP_VIT_CONFIGS

    CLIP_VIT_CONFIGS["TinyViT"] = dict(patch_size=8, width=32, layers=2, num_heads=2,
                                       output_dim=16, image_size=32)
    CLIP_TEXT_CONFIGS["TinyViT"] = dict(vocab_size=64, context_length=12, width=16,
                                        layers=2, num_heads=2, output_dim=16)
    return clip_mod.build_clip("TinyViT", context_length=12)


@pytest.mark.slow
def test_contrastive_logits_shape_and_symmetry():
    built = _tiny_clip()
    imgs = jnp.asarray(np.random.RandomState(0).rand(3, 32, 32, 3), jnp.float32)
    toks = jnp.asarray(np.random.RandomState(1).randint(1, 60, (4, 12)), jnp.int32)
    li, lt = built.module.apply(built.variables, imgs, toks, train=False)
    assert li.shape == (3, 4) and lt.shape == (4, 3)
    np.testing.assert_allclose(np.asarray(li), np.asarray(lt).T, atol=1e-6)
    # logit scale applied: logits bounded by exp(logit_scale) since embeds normalized
    scale = float(jnp.exp(built.params["logit_scale"]))
    assert np.abs(np.asarray(li)).max() <= scale + 1e-4


def test_encode_text_eot_position_invariance():
    """Features come from the EOT position: appending padding zeros after EOT must
    not change the embedding (tokens are argmax-indexed, clip_text.py)."""
    model = TextTransformer(vocab_size=64, context_length=16, width=16, layers=1,
                            num_heads=2, output_dim=8)
    rng = np.random.RandomState(2)
    toks = np.zeros((1, 16), np.int32)
    toks[0, 0] = 60
    toks[0, 1:4] = rng.randint(1, 50, 3)
    toks[0, 4] = 63  # EOT = max id
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(toks))
    a = model.apply(variables, jnp.asarray(toks))
    # Mutate tokens AFTER the EOT position (keeping ids < EOT so argmax still finds
    # it): the causal mask makes the EOT feature independent of later positions.
    toks2 = toks.copy()
    toks2[0, 5:] = rng.randint(1, 50, 11)
    b = model.apply(variables, jnp.asarray(toks2))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_zeroshot_text_goal_table_with_real_towers():
    """text_goal_table through a real (tiny) CLIP build + tokenizer: normalized rows."""
    from embodied_clip_tpu.models.tokenizer import SimpleTokenizer
    from embodied_clip_tpu.zeroshot import text_goal_table

    built = _tiny_clip()
    # Tiny vocab (64) < byte-fallback ids, so build a tokenizer whose ids fit.
    tok = SimpleTokenizer(merges=[])
    # clamp ids into vocab for the test tower
    import embodied_clip_tpu.zeroshot as zs
    from embodied_clip_tpu.models.tokenizer import tokenize

    texts = ["a photo of a mug.", "a photo of a bed."]
    tokens = tokenize(texts, tok, context_length=12, truncate=True) % 64
    emb = built.module.apply(built.variables, jnp.asarray(tokens), method="encode_text")
    emb = np.asarray(emb, np.float32)
    emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
    assert emb.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)


def test_all_registered_experiments_construct():
    from embodied_clip_tpu.config.experiments import get_experiment, list_experiments

    names = list_experiments()
    assert len(names) >= 25  # 11 probes + 14 RL
    for n in names:
        exp = get_experiment(n)
        assert exp.name == n
    # overrides apply with type coercion
    exp = get_experiment("objectnav_robothor_rgb_clipresnet50gru_ddppo",
                         overrides=["total_env_steps=123", "lr=0.001"])
    assert exp.total_env_steps == 123 and exp.lr == 0.001
