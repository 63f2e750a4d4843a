from embodied_clip_tpu.utils.seeding import seed_everything
from embodied_clip_tpu.utils.metrics import f1_score, binary_accuracy, argmax_accuracy

__all__ = ["seed_everything", "f1_score", "binary_accuracy", "argmax_accuracy"]
