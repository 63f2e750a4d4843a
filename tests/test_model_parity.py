"""Architecture + weight-converter parity vs independent torch oracles.

Strategy (SURVEY.md §4 gap-fill): random-init a torch oracle with authentic state_dict
naming, randomize BN running stats, convert with models/convert.py, and compare flax
outputs — validating both the flax architectures and the converters without network
access to real checkpoints. Tiny configs keep single-core runtime low; the mapping
logic is config-independent.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from embodied_clip_tpu.models import convert as C
from embodied_clip_tpu.models.clip_resnet import AttentionPool2d, ModifiedResNet
from embodied_clip_tpu.models.clip_text import TextTransformer
from embodied_clip_tpu.models.clip_vit import VisionTransformer
from embodied_clip_tpu.models.resnet import ResNet

import torch_oracle as O


def _randomize_bn(model):
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 1.5)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)


def _assert_close(ours, ref, atol=2e-4, rtol=2e-4):
    ours, ref = np.asarray(ours), np.asarray(ref)
    assert ours.shape == ref.shape, (ours.shape, ref.shape)
    np.testing.assert_allclose(ours, ref, atol=atol, rtol=rtol)


@pytest.mark.parametrize("block,stages", [("basic", (1, 1)), ("bottleneck", (1, 1))])
def test_torchvision_resnet_parity(block, stages):
    torch.manual_seed(0)
    oracle = O.TVResNetTrunk(stages, width=8, block=block).eval()
    _randomize_bn(oracle)
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = oracle(x).permute(0, 2, 3, 1).numpy()

    variables = C.convert_torchvision_resnet(oracle.state_dict(), stages, block)
    model = ResNet(stage_sizes=stages, block=block, width=8)
    out = model.apply(variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy()), train=False)
    _assert_close(out, ref)


def test_clip_modified_resnet_parity():
    torch.manual_seed(1)
    stages, width, heads, out_dim, img = (1, 1, 1, 1), 8, 2, 16, 64
    oracle = O.ModifiedResNetOracle(stages, width, heads, out_dim, img).eval()
    _randomize_bn(oracle)
    x = torch.randn(2, 3, img, img)
    with torch.no_grad():
        conv_ref = oracle.trunk(x)
        embed_ref = oracle.attnpool(conv_ref).numpy()
        conv_ref = conv_ref.permute(0, 2, 3, 1).numpy()

    sd = oracle.state_dict()
    trunk_p, trunk_s = C._convert_clip_resnet_trunk(sd, stages)
    attn_sd = {k: v for k, v in sd.items() if k.startswith("attnpool.")}
    attn_p = C._convert_attnpool(attn_sd)

    trunk = ModifiedResNet(stages, width)
    x_j = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
    conv = trunk.apply({"params": trunk_p, "batch_stats": trunk_s}, x_j, train=False)
    _assert_close(conv, conv_ref)

    pool = AttentionPool2d(heads, out_dim)
    embed = pool.apply({"params": attn_p}, conv)
    _assert_close(embed, embed_ref, atol=5e-4, rtol=5e-4)


def test_clip_text_parity():
    torch.manual_seed(2)
    vocab, ctx, width, layers, heads, out = 64, 12, 16, 2, 2, 8
    oracle = O.TextTransformerOracle(vocab, ctx, width, layers, heads, out).eval()
    tokens = torch.randint(0, vocab, (3, ctx))
    with torch.no_grad():
        ref = oracle(tokens).numpy()

    sd = oracle.state_dict()
    params = {
        "token_embedding": {"embedding": C._np(sd["token_embedding.weight"])},
        "positional_embedding": C._np(sd["positional_embedding"]),
        "ln_final": {"scale": C._np(sd["ln_final.weight"]), "bias": C._np(sd["ln_final.bias"])},
        "text_projection": C._np(sd["text_projection"]),
        "transformer": C._convert_transformer(sd, "transformer", layers),
    }
    model = TextTransformer(vocab, ctx, width, layers, heads, out)
    out_j = model.apply({"params": params}, jnp.asarray(tokens.numpy()))
    _assert_close(out_j, ref, atol=5e-4, rtol=5e-4)


def test_clip_vit_parity():
    torch.manual_seed(3)
    img, patch, width, layers, heads, out = 32, 16, 16, 2, 2, 8
    oracle = O.VisionTransformerOracle(img, patch, width, layers, heads, out).eval()
    x = torch.randn(2, 3, img, img)
    with torch.no_grad():
        ref = oracle(x).numpy()

    sd = oracle.state_dict()
    params = {
        "patch_embed": {"kernel": C._conv(sd["conv1.weight"])},
        "class_embedding": C._np(sd["class_embedding"]),
        "positional_embedding": C._np(sd["positional_embedding"]),
        "proj": C._np(sd["proj"]),
        "ln_pre": {"scale": C._np(sd["ln_pre.weight"]), "bias": C._np(sd["ln_pre.bias"])},
        "ln_post": {"scale": C._np(sd["ln_post.weight"]), "bias": C._np(sd["ln_post.bias"])},
        "transformer": C._convert_transformer(sd, "transformer", layers),
    }
    model = VisionTransformer(patch, width, layers, heads, out)
    out_j = model.apply({"params": params}, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
    _assert_close(out_j, ref, atol=5e-4, rtol=5e-4)


def test_frozen_encoder_stop_gradient():
    """Frozen semantics: gradients through stop_gradient'd features are zero
    (the reference's requires_grad=False freeze, thor_image_features.py:26-33)."""
    model = ResNet(stage_sizes=(1,), block="basic", width=8)
    x = jnp.ones((1, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        feats = model.apply({**variables, "params": params}, x, train=False)
        feats = jax.lax.stop_gradient(feats)
        return jnp.sum(feats ** 2)

    grads = jax.grad(loss)(variables["params"])
    total = sum(jnp.abs(g).sum() for g in jax.tree.leaves(grads))
    assert float(total) == 0.0


@pytest.mark.slow
def test_torch_checkpoint_file_roundtrip(tmp_path):
    """A torch .pth state_dict on disk loads through build_encoder(torch_checkpoint=...)
    and reproduces the torch oracle's features (full RN18, file-based path)."""
    torch.manual_seed(7)
    oracle = O.TVResNetTrunk((2, 2, 2, 2), width=64, block="basic").eval()
    _randomize_bn(oracle)
    path = str(tmp_path / "rn18.pth")
    torch.save(oracle.state_dict(), path)

    from embodied_clip_tpu.models.encoders import build_encoder

    enc = build_encoder("imagenet_rn18", torch_checkpoint=path)
    x = torch.randn(1, 3, 224, 224)
    with torch.no_grad():
        ref = oracle(x).permute(0, 2, 3, 1).numpy()
    got = enc.module.apply(enc.variables, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
                           train=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-3, rtol=1e-3)
