from embodied_clip_tpu.models.resnet import ResNet, resnet18, resnet50
from embodied_clip_tpu.models.clip_resnet import ModifiedResNet, AttentionPool2d
from embodied_clip_tpu.models.clip_vit import VisionTransformer
from embodied_clip_tpu.models.clip_text import TextTransformer
from embodied_clip_tpu.models import clip

__all__ = [
    "ResNet", "resnet18", "resnet50",
    "ModifiedResNet", "AttentionPool2d",
    "VisionTransformer", "TextTransformer",
    "clip",
]
