from embodied_clip_tpu.models.resnet import ResNet, resnet18, resnet50
from embodied_clip_tpu.models.clip_resnet import ModifiedResNet, AttentionPool2d
from embodied_clip_tpu.models.clip_vit import VisionTransformer
from embodied_clip_tpu.models.clip_text import TextTransformer
from embodied_clip_tpu.models import clip
from embodied_clip_tpu.models.encoders import ENCODER_SPECS, FrozenEncoder, build_encoder
from embodied_clip_tpu.models.policy import ActorCritic
from embodied_clip_tpu.models.probes import build_probe
from embodied_clip_tpu.models.tokenizer import SimpleTokenizer, tokenize

__all__ = [
    "ResNet", "resnet18", "resnet50",
    "ModifiedResNet", "AttentionPool2d",
    "VisionTransformer", "TextTransformer",
    "clip",
    "ENCODER_SPECS", "FrozenEncoder", "build_encoder",
    "ActorCritic", "build_probe",
    "SimpleTokenizer", "tokenize",
]
