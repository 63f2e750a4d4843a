#!/usr/bin/env python
"""Torch-side half of the real-weight parity harness (see embodied_clip_tpu/parity.py).

Run this where the reference stack lives, with real pretrained weights:

  python tools/capture_reference_activations.py \
      --encoder clip_rn50 --torch-checkpoint RN50.pt --output ref_acts.npz

then on the TPU side:

  python -m embodied_clip_tpu verify-parity --encoder clip_rn50 \
      --torch-checkpoint RN50_state_dict.pt --activations ref_acts.npz

Model loading, in preference order:
  1. the openai `clip` package (`clip.load(arch)`) — the literal reference path
     (generate_data/thor_image_features.py:57); --torch-checkpoint optional.
  2. a torchscript archive (openai's released RN50.pt): torch.jit.load → state_dict.
  3. a plain state_dict (.pt/.pth): torchvision-resnet or CLIP-visual layout.
  Paths 2/3 rebuild the model from tests/torch_oracle.py (same state_dict layout as
  the upstream implementations, verified by the repo's converter parity tests).

Preprocessing replicates the reference exactly (thor_image_features.py:36-44 and the
pinned CLIP preprocess, SURVEY.md §2.2): PIL bicubic resize (shortest side →
image_size) → center crop → scale to [0,1] → normalize.

Activations saved per reference cache key (thor_image_features.py:129-138):
  clip_rn50 / clip_rn50x16 → clip_conv (NCHW), clip_attnpool, clip_avgpool
  imagenet_rn50 / rn18     → imagenet_conv (NCHW), imagenet_avgpool
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))  # torch_oracle (state-dict paths)

from embodied_clip_tpu.constants import (  # noqa: E402  (torch-free module)
    CLIP_MEAN, CLIP_STD, IMAGENET_MEAN, IMAGENET_STD,
)
from embodied_clip_tpu.parity import golden_frames  # noqa: E402

# (family, arch params) per encoder name — mirrors models/encoders.ENCODER_SPECS and
# the upstream full-size configs.
SPECS = {
    "clip_rn50": dict(family="clip", stages=(3, 4, 6, 3), width=64, heads=32,
                      out=1024, image=224),
    "clip_rn50x16": dict(family="clip", stages=(6, 8, 18, 8), width=96, heads=48,
                         out=768, image=384),
    "imagenet_rn50": dict(family="imagenet", stages=(3, 4, 6, 3), block="bottleneck",
                          image=224),
    "imagenet_rn18": dict(family="imagenet", stages=(2, 2, 2, 2), block="basic",
                          image=224),
}
_CLIP_ARCH = {"clip_rn50": "RN50", "clip_rn50x16": "RN50x16"}


def reference_preprocess(frames_u8: np.ndarray, family: str, image_size: int):
    """uint8 NHWC batch → normalized torch NCHW batch, the reference's exact recipe."""
    import torch
    from PIL import Image

    mean = CLIP_MEAN if family == "clip" else IMAGENET_MEAN
    std = CLIP_STD if family == "clip" else IMAGENET_STD
    out = []
    for frame in frames_u8:
        img = Image.fromarray(frame).convert("RGB")
        w, h = img.size
        scale = image_size / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
        left = (img.size[0] - image_size) // 2
        top = (img.size[1] - image_size) // 2
        img = img.crop((left, top, left + image_size, top + image_size))
        x = torch.from_numpy(np.asarray(img, np.float32) / 255.0).permute(2, 0, 1)
        out.append(x)
    x = torch.stack(out)
    mean = torch.tensor(mean, dtype=torch.float32)[None, :, None, None]
    std = torch.tensor(std, dtype=torch.float32)[None, :, None, None]
    return (x - mean) / std


def _freeze(model):
    """The reference freeze recipe (thor_image_features.py:26-33)."""
    import torch.nn as nn

    for p in model.parameters():
        p.requires_grad = False
    for m in model.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.momentum = 0.0
    model.eval()
    return model


def _build_from_state_dict(encoder: str, sd):
    """Rebuild the reference model from a raw state_dict via the repo's torch
    mirrors (tests/torch_oracle.py — same state_dict layout as upstream)."""
    import torch_oracle as O

    spec = SPECS[encoder]
    # a full-CLIP state dict carries the text tower under other keys; keep visual.*
    if any(k.startswith("visual.") for k in sd):
        sd = {k[len("visual."):]: v for k, v in sd.items() if k.startswith("visual.")}
    if spec["family"] == "clip":
        model = O.ModifiedResNetOracle(spec["stages"], spec["width"], spec["heads"],
                                       spec["out"], spec["image"])
    else:
        sd = {k: v for k, v in sd.items() if not k.startswith("fc.")}
        model = O.TVResNetTrunk(spec["stages"], block=spec["block"])
    model.load_state_dict(sd, strict=spec["family"] == "clip")
    return _freeze(model)


def capture(encoder: str, torch_checkpoint: str | None, n_frames: int = 8) -> dict:
    import torch

    spec = SPECS[encoder]
    frames = golden_frames(n=n_frames)
    x = reference_preprocess(frames, spec["family"], spec["image"])

    trunk = attnpool = None
    if spec["family"] == "clip":
        try:  # 1. the literal reference path
            import clip

            model, _ = clip.load(_CLIP_ARCH[encoder], device="cpu")
            visual = _freeze(model.visual.float())
            attnpool, visual.attnpool = visual.attnpool, torch.nn.Identity()
            trunk = visual
        except ImportError:
            pass
    if trunk is None:
        assert torch_checkpoint, "need --torch-checkpoint without the clip package"
        try:  # 2. torchscript archive
            sd = torch.jit.load(torch_checkpoint, map_location="cpu").state_dict()
        except RuntimeError:  # 3. plain state_dict
            sd = torch.load(torch_checkpoint, map_location="cpu", weights_only=True)
            if isinstance(sd, dict) and "state_dict" in sd:
                sd = sd["state_dict"]
        model = _build_from_state_dict(encoder, sd)
        if spec["family"] == "clip":
            attnpool, model.attnpool = model.attnpool, torch.nn.Identity()
            trunk = model.trunk if hasattr(model, "trunk") else model
        else:
            trunk = model

    with torch.no_grad():
        conv = trunk(x).float()
        prefix = "clip" if spec["family"] == "clip" else "imagenet"
        acts = {
            f"{prefix}_conv": conv.numpy(),
            f"{prefix}_avgpool": conv.mean(dim=(2, 3)).numpy(),
        }
        if attnpool is not None:
            acts["clip_attnpool"] = attnpool(conv).float().numpy()
    acts["__frames__"] = frames
    return acts


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--encoder", required=True, choices=sorted(SPECS))
    p.add_argument("--torch-checkpoint", default=None)
    p.add_argument("--output", required=True)
    args = p.parse_args(argv)
    acts = capture(args.encoder, args.torch_checkpoint)
    np.savez_compressed(args.output, **acts)
    shapes = {k: list(v.shape) for k, v in acts.items()}
    print(json.dumps({"output": args.output, "shapes": shapes}))


if __name__ == "__main__":
    main()
