"""Frozen visual encoders: fused uint8-frames → features inference graphs.

This is the TPU replacement for the reference's per-frame host-side inference engine
(thor_image_features.py:91-113: PIL preprocess → .cuda() → encoder → .cpu() per frame,
batch size 1). Here the raw uint8 NHWC frame batch is shipped to the device once and a
single jitted XLA graph runs preprocess (PIL-parity resize matmuls + normalize), the
bf16/f32 trunk, and all pooling heads; only the requested features come back.

Emitted keys match the reference's cache schema (thor_image_features.py:129-138):
  imagenet RN50/RN18 → {<family>_conv, <family>_avgpool}
  CLIP RN50/RN50x16  → {clip_conv, clip_avgpool, clip_attnpool}
  CLIP ViT-B/32      → {clip_embed}
Conv maps are NHWC (TPU-native); loaders convert when reading torch CHW caches.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from embodied_clip_tpu.models import convert as convert_mod
from embodied_clip_tpu.models.clip import CLIPVisual, image_size_of
from embodied_clip_tpu.models.clip_vit import CLIP_VIT_CONFIGS
from embodied_clip_tpu.models.resnet import RESNET_CONFIGS, ResNet
from embodied_clip_tpu.ops.preprocess import make_preprocessor

__all__ = ["EncoderSpec", "FrozenEncoder", "build_encoder", "ENCODER_SPECS"]


@dataclasses.dataclass(frozen=True)
class EncoderSpec:
    family: str  # 'imagenet' | 'clip'
    arch: str    # 'resnet18' | 'resnet50' | 'RN50' | 'RN50x16' | 'ViT-B/32'

    @property
    def key_prefix(self) -> str:
        return "imagenet" if self.family == "imagenet" else "clip"


ENCODER_SPECS = {
    "imagenet_rn50": EncoderSpec("imagenet", "resnet50"),
    "imagenet_rn18": EncoderSpec("imagenet", "resnet18"),
    "clip_rn50": EncoderSpec("clip", "RN50"),
    "clip_rn50x16": EncoderSpec("clip", "RN50x16"),
    "clip_vit_b32": EncoderSpec("clip", "ViT-B/32"),
    # Smoke-scale CLIP resnet/ViT (full code path, CPU-test cost; not paper models).
    "clip_rn_tiny": EncoderSpec("clip", "RNtiny"),
    "clip_vit_tiny": EncoderSpec("clip", "ViTtiny"),
}


def _xla_serving_options() -> Optional[Dict[str, str]]:
    """Per-compile XLA options for the serving graph (jit compiler_options).

    XLA_FLAGS is rejected by the axon tunnel's compile client, but the
    per-compile options API passes through (measured round 4) — this is the
    only route to XLA scheduling/fusion knobs on this runtime. Set
    ECT_XLA_OPTS="key=value,key=value" to experiment; empty/unset compiles
    with XLA defaults. Only applied on TPU (CPU tests keep default options
    and maximal cache reuse)."""
    import os

    raw = os.environ.get("ECT_XLA_OPTS", "")
    if not raw or jax.default_backend() != "tpu":
        return None
    return dict(kv.split("=", 1) for kv in raw.split(",") if "=" in kv)


def _row_major_format(ndim: int):
    """A jit in_shardings entry pinning a parameter to the default row-major
    tiled layout on the local device, or None where the layout API/backend
    doesn't support it (cpu tests, older jax)."""
    try:
        if jax.default_backend() != "tpu":
            return None
        from jax.experimental.layout import Format, Layout

        return Format(Layout(major_to_minor=tuple(range(ndim))),
                      jax.sharding.SingleDeviceSharding(jax.devices()[0]))
    except Exception:
        return None


class FrozenEncoder:
    """A frozen encoder: module + variables + fused preprocess, with a jitted
    `encode(frames_u8)` (features are stop_gradient'd — the reference freeze recipe,
    thor_image_features.py:26-33, expressed functionally)."""

    def __init__(self, spec: EncoderSpec, module, variables, image_size: int,
                 dtype=jnp.float32):
        self.spec = spec
        self.module = module
        self.variables = variables
        self.image_size = image_size
        self.dtype = dtype
        self.preprocess = make_preprocessor(
            "clip" if spec.family == "clip" else "imagenet", image_size, dtype
        )
        if dtype == jnp.bfloat16:
            # Throughput mode: the fused pallas preprocess kernel (1.46x the XLA
            # lowering on v5e; ≤1 LSB pixel diff, absorbed by the uint8-grid
            # quantize). f32 encoders keep the full-precision XLA path.
            self.preprocess = dataclasses.replace(self.preprocess,
                                                  use_pallas=True)
        # jit instances keyed by (flat_layout, kernel-flag snapshot): the
        # ECT_* kernel flags are read at TRACE time, so a cached executable
        # would silently ignore a flag flipped between encode() calls in the
        # same process (the bench tools and flag tests do exactly that).
        self._jits: Dict = {}

    # -- pure function (jit target) ------------------------------------------------

    def _encode_impl(self, variables, frames) -> Dict[str, jnp.ndarray]:
        x = self.preprocess(frames)
        prefix = self.spec.key_prefix
        out: Dict[str, jnp.ndarray] = {}
        if self.spec.family == "imagenet":
            conv = self.module.apply(variables, x, train=False)
            out[f"{prefix}_conv"] = conv
            out[f"{prefix}_avgpool"] = jnp.mean(
                conv.astype(jnp.float32), axis=(1, 2)
            ).astype(conv.dtype)
        else:
            feats = self.module.apply(variables, x, train=False)
            if "conv" in feats:
                out["clip_conv"] = feats["conv"]
                out["clip_avgpool"] = feats["avgpool"]
                out["clip_attnpool"] = feats["embed"]
            else:
                out["clip_embed"] = feats["embed"]
        return {k: jax.lax.stop_gradient(v) for k, v in out.items()}

    # -- public API ------------------------------------------------------------------

    def encode(self, frames) -> Dict[str, jnp.ndarray]:
        """uint8 NHWC frames (any HxW) → feature dict on device.

        Host numpy batches are shipped in the flat-channels (n, h, w*3) layout —
        a free view of a contiguous NHWC buffer — which the fused preprocess
        kernel consumes without the on-device uint8 relayout XLA otherwise
        inserts (ops/preprocess.py). Flat batches additionally run through a jit
        instance whose entry layout is pinned row-major: left to itself, XLA's
        layout assignment picks a batch-minor parameter layout and inserts a
        0.15 ms copy in front of the preprocess kernel (measured, batch 128)."""
        import numpy as np

        if (isinstance(frames, np.ndarray) and frames.ndim == 4
                and frames.shape[-1] == 3 and frames.dtype == np.uint8
                and frames.flags.c_contiguous):
            n, h, w, c = frames.shape
            frames = frames.reshape(n, h, w * c)
        flat = frames.ndim == 3 and frames.shape[-1] != 3
        return self._jit_for(flat)(self.variables, frames)

    def _flag_key(self) -> tuple:
        """Snapshot of the trace-time kernel flags this encoder reads inside
        `_encode_impl`; a change re-traces instead of hitting a stale
        executable. Every graph reads the preprocess grouping / requant-form /
        compiler-option knobs; the quantized subclasses add theirs."""
        import os

        return (os.environ.get("ECT_PP_GROUP", "1"),
                os.environ.get("ECT_RECIP_REQUANT", "0"),
                os.environ.get("ECT_XLA_OPTS", ""))

    def _jit_for(self, flat: bool):
        key = (flat, self._flag_key())
        fn = self._jits.get(key)
        if fn is None:
            fmt = _row_major_format(3) if flat else None
            if flat and fmt is None:
                fn = self._jit_for(False)
            else:
                kw = {"in_shardings": (None, fmt)} if flat else {}
                # A fresh closure per flag key: bound methods of one instance
                # compare EQUAL, so jit wrappers around self._encode_impl
                # would share a single trace cache and the first-traced flag
                # set would shadow every other (the flags are read inside
                # _encode_impl at trace time).
                impl = lambda variables, frames: self._encode_impl(variables, frames)  # noqa: E731
                fn = jax.jit(impl,
                             compiler_options=_xla_serving_options(), **kw)
            self._jits[key] = fn
        return fn

    def encode_fn(self):
        """(variables, frames) → features; for embedding in larger jitted graphs
        (e.g. the RL rollout/update step)."""
        return self._encode_impl

    def fold_bn(self) -> "FrozenEncoder":
        """Return a new encoder with frozen BN folded into conv weights
        (ops/fold_bn.py) — the inference-serving configuration: pure conv+bias+relu
        in the compute dtype, no BN ops or f32 cast islands."""
        from embodied_clip_tpu.ops.fold_bn import fold_conv_bn_tree

        if getattr(self.module, "folded", False):
            return self  # idempotent: already folded (no batch_stats to fold)
        fold = jax.jit(fold_conv_bn_tree)  # one program, stays on device
        if self.spec.family == "imagenet":
            cfg = RESNET_CONFIGS[self.spec.arch]
            module = ResNet(dtype=self.dtype, folded=True, **cfg)
            params = fold(self.variables["params"], self.variables["batch_stats"])
        else:
            if self.spec.arch in CLIP_VIT_CONFIGS:
                return self  # ViT has no BN
            module = CLIPVisual(self.spec.arch, self.dtype, folded=True)
            p = dict(self.variables["params"])
            p["trunk"] = fold(
                self.variables["params"]["trunk"],
                self.variables["batch_stats"]["trunk"],
            )
            params = p
        return FrozenEncoder(
            self.spec, module, {"params": params}, self.image_size, self.dtype
        )

    def quantize(self, calibration_frames) -> "FrozenEncoder":
        """Return an int8-trunk encoder (ops/quantize.py, ops/quantize_vit.py):
        conv/dense traffic halved and MXU rate doubled on the ResNet trunks and
        the ViT transformer blocks; stems, shortcut convs, attnpool, LayerNorms
        and the attention core stay bf16/f32. Fidelity is a measured trade vs
        the bf16 path (STATUS.md).

        Contract: `calibration_frames` must be REPRESENTATIVE uint8 frames (real
        observations, or parity.golden_frames) — never synthetic noise. The
        per-tensor activation scales are maxima over these frames; noise maxima
        sit well inside natural-image activation ranges and clip real inputs."""
        from embodied_clip_tpu.models.clip_resnet import CLIP_RESNET_CONFIGS
        from embodied_clip_tpu.ops.quantize import (
            quantize_resnet_trunk, quantize_trunk,
        )

        if "qtrunk" in self.variables:
            return self  # idempotent: already quantized (f32 params are gone)
        folded = self if getattr(self.module, "folded", False) else self.fold_bn()
        x = folded.preprocess(jnp.asarray(calibration_frames))
        if self.spec.family == "imagenet":
            cfg = RESNET_CONFIGS[self.spec.arch]
            qtrunk = jax.jit(
                lambda p, xx: quantize_resnet_trunk(
                    p, cfg["stage_sizes"], cfg["block"], xx)
            )(folded.variables["params"], x)
            return _QuantizedResNetEncoder(folded, qtrunk, cfg["stage_sizes"],
                                           cfg["block"])
        if self.spec.arch in CLIP_VIT_CONFIGS:
            from embodied_clip_tpu.ops.quantize_vit import quantize_vit

            vcfg = CLIP_VIT_CONFIGS[self.spec.arch]
            nh, nl = vcfg["num_heads"], vcfg["layers"]
            qtower = jax.jit(
                lambda p, xx: quantize_vit(p, xx, num_heads=nh, layers=nl)
            )(folded.variables["params"]["vit"], x)
            return _QuantizedViTEncoder(folded, qtower, nh, nl)
        assert self.spec.arch in CLIP_RESNET_CONFIGS, \
            f"no int8 path for {self.spec.arch}"
        stage_sizes = CLIP_RESNET_CONFIGS[self.spec.arch]["stage_sizes"]
        qtrunk = jax.jit(
            lambda p, xx: quantize_trunk(p, stage_sizes, xx)
        )(folded.variables["params"]["trunk"], x)
        return _QuantizedCLIPEncoder(folded, qtrunk, stage_sizes)

    def load_torch_state_dict(self, sd) -> "FrozenEncoder":
        """Replace random-init weights with a converted reference checkpoint."""
        if self.spec.family == "imagenet":
            cfg = RESNET_CONFIGS[self.spec.arch]
            self.variables = convert_mod.convert_torchvision_resnet(
                sd, cfg["stage_sizes"], cfg["block"]
            )
        else:
            if any(k.startswith("visual.") for k in sd):
                sd = {k[len("visual."):]: v for k, v in sd.items() if k.startswith("visual.")}
            self.variables = convert_mod.convert_clip_visual(sd, self.spec.arch)
        return self


class _QuantizedCLIPEncoder(FrozenEncoder):
    """CLIP ResNet encoder with an int8 trunk (see FrozenEncoder.quantize)."""

    def __init__(self, folded: FrozenEncoder, qtrunk, stage_sizes):
        self.qtrunk = qtrunk
        self.stage_sizes = stage_sizes
        self._attnpool_params = folded.variables["params"]["attnpool"]
        from embodied_clip_tpu.models.clip_resnet import (
            CLIP_RESNET_CONFIGS, AttentionPool2d,
        )

        cfg = CLIP_RESNET_CONFIGS[folded.spec.arch]
        self._attnpool = AttentionPool2d(cfg["num_heads"], cfg["output_dim"],
                                         folded.dtype)
        # variables = the quantized trunk + attnpool (what encode_fn closes over).
        super().__init__(
            folded.spec, folded.module,
            {"qtrunk": qtrunk, "attnpool": self._attnpool_params},
            folded.image_size, folded.dtype,
        )

    @staticmethod
    def _use_pallas_stage1() -> bool:
        """Fused int8 stage-1 Pallas kernel (bit-exact vs the XLA int8 graph;
        tests/test_bottleneck_kernel.py). Default OFF: measured SLOWER than
        XLA's int8 stage 1 on this runtime (4.8 ms vs 3.7 ms standalone at
        batch 128 — the stage's 64-wide channels cap the MXU at ~25-50%
        utilization and int8 Mosaic dots don't reach the MXU int8 rate, so the
        kernel can't buy back what XLA's conv emitter already gets; STATUS.md
        negative-results log). Opt in with ECT_PALLAS_STAGE1=1."""
        import os

        return os.environ.get("ECT_PALLAS_STAGE1", "0") == "1"

    @staticmethod
    def _use_pallas_stem() -> bool:
        """stem3 as one im2col matmul + fused requant + int8 pool
        (ops/pallas/stem_kernel.py): lifts the conv's C_in=32 MXU cap (~30%)
        toward the N=64 lane limit (~50%). Exact up to the stage-1 kernel's
        ±1-step requant-tie contract. Default OFF until measured faster on
        real hardware; opt in with ECT_PALLAS_STEM=1."""
        import os

        return os.environ.get("ECT_PALLAS_STEM", "0") == "1"

    @staticmethod
    def _use_pallas_resblocks() -> bool:
        """Fused wide-channel identity-resblock Pallas kernel for stages 2-4
        (bit-exact vs the XLA int8 graph). Default OFF: measured 2.2x slower
        than XLA's fused int8 graph on this runtime (stage-3 5-block run:
        2.3 ms pallas vs 1.03 ms XLA — the halo slicing and f32 epilogues
        don't pipeline; see STATUS.md). Kept as a measured, bit-exact
        alternative; enable with ECT_PALLAS_RESBLOCKS=1."""
        import os

        return os.environ.get("ECT_PALLAS_RESBLOCKS", "0") == "1"

    @staticmethod
    def _use_fuse_pointwise() -> int:
        """ECT_FUSE_POINTWISE routes block-boundary cb3/cb1 pointwise pairs
        through the cross-block Pallas kernel
        (ops/pallas/bottleneck_kernel.fused_cb3_cb1_int8): 0 = off (default),
        1 = every pair, N > 1 = only pairs whose block output width >= N.
        Measured NEGATIVE in-graph (STATUS.md round-4 log): the lone isolated
        win (stage-4 pairs, 0.139 ms vs XLA's 0.193) inverts to 12,810 vs
        14,488 frames/s end-to-end — XLA pads the 7x7 int8 tiles to 32
        sublanes at the pallas boundary. Kept flag-gated with a bit-exactness
        test so the path isn't re-walked."""
        import os

        return int(os.environ.get("ECT_FUSE_POINTWISE", "0"))

    @staticmethod
    def _use_int8_stem() -> str:
        """ECT_INT8_STEM selects the stem quantization variant: "off" (bf16
        stem — default), "stem3" (stem3 only as an s8×s8→s32 conv), "full"
        (stem2+stem3 s8, stem1 bf16 with an s8-writing epilogue). "full"
        measured SLOWER than the bf16 stem on v5e (13,754 vs 14,393 frames/s
        at batch 128 — STATUS.md round-4 negative results): XLA's int8 conv
        emitter at C_in∈{32} loses more on dot rate than the s8 tensors save
        on HBM. Variants kept with the numbers recorded so the path isn't
        re-walked."""
        import os

        v = os.environ.get("ECT_INT8_STEM", "off")
        return {"0": "off", "1": "full"}.get(v, v)

    @staticmethod
    def _use_int4_stage1() -> int:
        """ECT_INT4_STAGE1 stores stage-1's cross-fusion activations as S4
        (1 = all, 2 = only the 256-wide block-output/shortcut tensors),
        widened to s8 at each consumer. Measured a LARGE NEGATIVE on this
        runtime (STATUS.md round-5 log): XLA TPU scalarizes S4 stores — a
        materialized S4 tensor costs ~20x an s8 one, not half. Kept
        flag-gated with numerics pinned so the path isn't re-walked."""
        import os

        return int(os.environ.get("ECT_INT4_STAGE1", "0"))

    def _flag_key(self) -> tuple:
        return super()._flag_key() + (
            self._use_pallas_stage1(), self._use_pallas_resblocks(),
            self._use_pallas_stem(), self._use_int8_stem(),
            self._use_fuse_pointwise(), self._use_int4_stage1())

    def _encode_impl(self, variables, frames):
        from embodied_clip_tpu.ops.quantize import quantized_trunk_apply

        x = self.preprocess(frames)
        conv = quantized_trunk_apply(variables["qtrunk"], x, self.stage_sizes,
                                     out_dtype=self.dtype,
                                     pallas_stage1=self._use_pallas_stage1(),
                                     pallas_resblocks=self._use_pallas_resblocks(),
                                     pallas_stem=self._use_pallas_stem(),
                                     int8_stem=self._use_int8_stem(),
                                     fuse_pointwise=self._use_fuse_pointwise(),
                                     int4_stage1=self._use_int4_stage1())
        avg = jnp.mean(conv.astype(jnp.float32), axis=(1, 2)).astype(conv.dtype)
        embed = self._attnpool.apply({"params": variables["attnpool"]}, conv)
        out = {"clip_conv": conv, "clip_avgpool": avg, "clip_attnpool": embed}
        return {k: jax.lax.stop_gradient(v) for k, v in out.items()}

    def fold_bn(self) -> "FrozenEncoder":
        return self  # already folded+quantized


class _QuantizedViTEncoder(FrozenEncoder):
    """CLIP ViT encoder with int8 transformer-block dense layers
    (see FrozenEncoder.quantize; scheme in ops/quantize_vit.py)."""

    def __init__(self, folded: FrozenEncoder, qtower, num_heads: int,
                 layers: int):
        self.num_heads = num_heads
        self.layers = layers
        super().__init__(folded.spec, folded.module, {"qtrunk": qtower},
                         folded.image_size, folded.dtype)

    def _flag_key(self) -> tuple:
        import os

        return super()._flag_key() + (
            os.environ.get("ECT_VIT_QUANT_ATTN", "1"),
            os.environ.get("ECT_VIT_CONV_OUT", "0"))

    def _encode_impl(self, variables, frames):
        from embodied_clip_tpu.ops.quantize_vit import quantized_vit_apply

        x = self.preprocess(frames)
        embed = quantized_vit_apply(variables["qtrunk"], x, self.num_heads,
                                    self.layers, out_dtype=self.dtype)
        return {"clip_embed": jax.lax.stop_gradient(embed)}

    def fold_bn(self) -> "FrozenEncoder":
        return self  # ViT has no BN; already quantized


class _QuantizedResNetEncoder(FrozenEncoder):
    """torchvision-family encoder with an int8 trunk (see FrozenEncoder.quantize)."""

    def __init__(self, folded: FrozenEncoder, qtrunk, stage_sizes, block):
        self.qtrunk = qtrunk
        self.stage_sizes = stage_sizes
        self.block = block
        super().__init__(folded.spec, folded.module, {"qtrunk": qtrunk},
                         folded.image_size, folded.dtype)

    def _encode_impl(self, variables, frames):
        from embodied_clip_tpu.ops.quantize import quantized_resnet_apply

        x = self.preprocess(frames)
        conv = quantized_resnet_apply(variables["qtrunk"], x, self.stage_sizes,
                                      self.block, out_dtype=self.dtype)
        avg = jnp.mean(conv.astype(jnp.float32), axis=(1, 2)).astype(conv.dtype)
        out = {"imagenet_conv": conv, "imagenet_avgpool": avg}
        return {k: jax.lax.stop_gradient(v) for k, v in out.items()}

    def fold_bn(self) -> "FrozenEncoder":
        return self  # already folded+quantized


def build_encoder(name: str, dtype=jnp.float32, seed: int = 0,
                  torch_checkpoint: Optional[str] = None) -> FrozenEncoder:
    """name ∈ ENCODER_SPECS. Random-init unless a torch checkpoint path is given."""
    spec = ENCODER_SPECS[name]
    if spec.family == "imagenet":
        cfg = RESNET_CONFIGS[spec.arch]
        module = ResNet(dtype=dtype, **cfg)
        size = 224
    else:
        module = CLIPVisual(spec.arch, dtype)
        size = image_size_of(spec.arch)
    # jit the init: eager init dispatches hundreds of tiny ops (pathological through
    # a remote-compile harness); one compiled program initializes everything.
    init = jax.jit(lambda key, x: module.init(key, x, train=False))
    variables = init(jax.random.PRNGKey(seed), jnp.zeros((1, size, size, 3), dtype))
    enc = FrozenEncoder(spec, module, dict(variables), size, dtype)
    if torch_checkpoint is not None:
        enc.load_torch_state_dict(convert_mod.load_torch_checkpoint(torch_checkpoint))
    return enc
