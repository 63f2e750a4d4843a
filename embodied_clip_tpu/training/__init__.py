from embodied_clip_tpu.training.supervised import ProbeTrainer, ProbeTrainConfig

__all__ = ["ProbeTrainer", "ProbeTrainConfig"]
