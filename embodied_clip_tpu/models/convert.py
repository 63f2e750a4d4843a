"""Torch-checkpoint → flax-variables converters.

The reference obtains weights via `clip.load('RN50')` and
`torchvision.models.resnet50(pretrained=True)` (thor_image_features.py:46,57). This
module converts those checkpoints' state_dicts (torch tensors or numpy arrays; fp16
CLIP weights are upcast to f32) into the variable trees of our flax models, so a user
can bring the exact reference weights to TPU.

Layout rules:
  torch Conv2d (O,I,kh,kw)  → flax kernel (kh,kw,I,O)
  torch Linear (O,I)        → flax kernel (I,O)
  BatchNorm weight/bias     → scale/bias;  running_mean/var → batch_stats mean/var
  nn.MultiheadAttention in_proj_weight (3C,C) → fused in_proj kernel (C,3C)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

__all__ = [
    "convert_torchvision_resnet",
    "convert_clip_visual",
    "convert_clip",
]


def _np(v) -> np.ndarray:
    if hasattr(v, "detach"):
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _conv(v):
    return _np(v).transpose(2, 3, 1, 0)


def _linear(name_prefix: str, sd: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    out = {"kernel": _np(sd[f"{name_prefix}.weight"]).T}
    if f"{name_prefix}.bias" in sd:
        out["bias"] = _np(sd[f"{name_prefix}.bias"])
    return out


def _bn(prefix: str, sd: Mapping[str, Any]):
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    stats = {"mean": _np(sd[f"{prefix}.running_mean"]), "var": _np(sd[f"{prefix}.running_var"])}
    return params, stats


def _convbn(conv_key: str, bn_key: str, sd: Mapping[str, Any]):
    bn_p, bn_s = _bn(bn_key, sd)
    return {"conv": {"kernel": _conv(sd[f"{conv_key}.weight"])}, "bn": bn_p}, {"bn": bn_s}


def convert_torchvision_resnet(sd: Mapping[str, Any], stage_sizes, block: str = "bottleneck"):
    """torchvision resnet{18,50} state_dict → flax ResNet variables (trunk only; the
    reference drops avgpool/fc, thor_image_features.py:47)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["stem"], stats["stem"] = _convbn("conv1", "bn1", sd)
    n_convs = 3 if block == "bottleneck" else 2
    for s, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            t = f"layer{s + 1}.{b}"
            f = f"layer{s + 1}_{b}"
            p: Dict[str, Any] = {}
            st: Dict[str, Any] = {}
            for ci in range(1, n_convs + 1):
                p[f"cb{ci}"], st[f"cb{ci}"] = _convbn(f"{t}.conv{ci}", f"{t}.bn{ci}", sd)
            if f"{t}.downsample.0.weight" in sd:
                p["down"], st["down"] = _convbn(f"{t}.downsample.0", f"{t}.downsample.1", sd)
            params[f] = p
            stats[f] = st
    return {"params": params, "batch_stats": stats}


def _convert_attnpool(sd: Mapping[str, Any], prefix: str = "attnpool"):
    return {
        "positional_embedding": _np(sd[f"{prefix}.positional_embedding"]),
        "q_proj": _linear(f"{prefix}.q_proj", sd),
        "k_proj": _linear(f"{prefix}.k_proj", sd),
        "v_proj": _linear(f"{prefix}.v_proj", sd),
        "c_proj": _linear(f"{prefix}.c_proj", sd),
    }


def _convert_clip_resnet_trunk(sd: Mapping[str, Any], stage_sizes):
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in (1, 2, 3):
        params[f"stem{i}"], stats[f"stem{i}"] = _convbn(f"conv{i}", f"bn{i}", sd)
    for s, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            t = f"layer{s + 1}.{b}"
            f = f"layer{s + 1}_{b}"
            p: Dict[str, Any] = {}
            st: Dict[str, Any] = {}
            for ci in (1, 2, 3):
                p[f"cb{ci}"], st[f"cb{ci}"] = _convbn(f"{t}.conv{ci}", f"{t}.bn{ci}", sd)
            # CLIP's shortcut is Sequential(avgpool, conv, bn) → keys .0 (conv), .1 (bn)
            # after the unnamed pool; pool has no params.
            if f"{t}.downsample.0.weight" in sd:
                p["down"], st["down"] = _convbn(f"{t}.downsample.0", f"{t}.downsample.1", sd)
            params[f] = p
            stats[f] = st
    return params, stats


def _convert_transformer(sd: Mapping[str, Any], prefix: str, layers: int):
    params: Dict[str, Any] = {}
    for i in range(layers):
        t = f"{prefix}.resblocks.{i}"
        params[f"block{i}"] = {
            "ln_1": {"scale": _np(sd[f"{t}.ln_1.weight"]), "bias": _np(sd[f"{t}.ln_1.bias"])},
            "ln_2": {"scale": _np(sd[f"{t}.ln_2.weight"]), "bias": _np(sd[f"{t}.ln_2.bias"])},
            "attn": {
                "in_proj": {
                    "kernel": _np(sd[f"{t}.attn.in_proj_weight"]).T,
                    "bias": _np(sd[f"{t}.attn.in_proj_bias"]),
                },
                "out_proj": _linear(f"{t}.attn.out_proj", sd),
            },
            "mlp_fc": _linear(f"{t}.mlp.c_fc", sd),
            "mlp_proj": _linear(f"{t}.mlp.c_proj", sd),
        }
    return params


def convert_clip_visual(sd: Mapping[str, Any], model_name: str):
    """openai/CLIP `visual.*` state_dict (prefix stripped) → CLIPVisual variables."""
    from embodied_clip_tpu.models.clip_resnet import CLIP_RESNET_CONFIGS
    from embodied_clip_tpu.models.clip_vit import CLIP_VIT_CONFIGS

    if model_name in CLIP_RESNET_CONFIGS:
        cfg = CLIP_RESNET_CONFIGS[model_name]
        trunk_p, trunk_s = _convert_clip_resnet_trunk(sd, cfg["stage_sizes"])
        params = {"trunk": trunk_p, "attnpool": _convert_attnpool(sd)}
        return {"params": params, "batch_stats": {"trunk": trunk_s}}

    cfg = CLIP_VIT_CONFIGS[model_name]
    params = {
        "vit": {
            "patch_embed": {"kernel": _conv(sd["conv1.weight"])},
            "class_embedding": _np(sd["class_embedding"]),
            "positional_embedding": _np(sd["positional_embedding"]),
            "proj": _np(sd["proj"]),
            "ln_pre": {"scale": _np(sd["ln_pre.weight"]), "bias": _np(sd["ln_pre.bias"])},
            "ln_post": {"scale": _np(sd["ln_post.weight"]), "bias": _np(sd["ln_post.bias"])},
            "transformer": _convert_transformer(sd, "transformer", cfg["layers"]),
        }
    }
    return {"params": params}


def convert_clip(sd: Mapping[str, Any], model_name: str):
    """Full openai/CLIP state_dict → CLIP variables (visual + text + logit_scale)."""
    from embodied_clip_tpu.models.clip_text import CLIP_TEXT_CONFIGS

    visual_sd = {k[len("visual."):]: v for k, v in sd.items() if k.startswith("visual.")}
    vis = convert_clip_visual(visual_sd, model_name)
    tcfg = CLIP_TEXT_CONFIGS[model_name]
    text_params = {
        "token_embedding": {"embedding": _np(sd["token_embedding.weight"])},
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": {"scale": _np(sd["ln_final.weight"]), "bias": _np(sd["ln_final.bias"])},
        "text_projection": _np(sd["text_projection"]),
        "transformer": _convert_transformer(sd, "transformer", tcfg["layers"]),
    }
    out = {
        "params": {
            "visual": vis["params"],
            "text": text_params,
            "logit_scale": _np(sd["logit_scale"]),
        }
    }
    if "batch_stats" in vis:
        out["batch_stats"] = {"visual": vis["batch_stats"]}
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pt/.pth checkpoint into a numpy state_dict (CPU torch required).

    Handles both plain state_dicts and torchscript archives (openai CLIP release
    format), mirroring what `clip.load` does before model construction."""
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except Exception:
        sd = torch.load(path, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    return {k: _np(v) for k, v in sd.items()}
