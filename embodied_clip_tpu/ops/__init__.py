from embodied_clip_tpu.ops.resize import resample_weights, resize_bicubic
from embodied_clip_tpu.ops.preprocess import (
    Preprocessor,
    make_preprocessor,
)

__all__ = [
    "resample_weights",
    "resize_bicubic",
    "Preprocessor",
    "make_preprocessor",
]
