from embodied_clip_tpu.data.probing import ProbeDataModule, load_probe_split
from embodied_clip_tpu.data.feature_store import FeatureStoreWriter

__all__ = ["ProbeDataModule", "load_probe_split", "FeatureStoreWriter"]
