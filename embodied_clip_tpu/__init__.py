"""embodied-clip-tpu: a TPU-native framework with the capabilities of allenai/embodied-clip.

Built from scratch for JAX / XLA / Pallas / pjit. The compute path (frozen CLIP and
ImageNet ResNet encoders, probes, actor-critic policies, PPO/DAgger updates) is pure
functional JAX compiled for TPU; simulators remain external CPU-host processes behind a
batched env API; parallelism is expressed as shardings over a `jax.sharding.Mesh`.

Capability surface mirrors the reference (see SURVEY.md):
  - frozen visual encoders + exact preprocessing (reference:
    primitive_probing/generate_data/thor_image_features.py:26-68)
  - primitive probing (reference: primitive_probing/train.py, data.py)
  - DD-PPO / DAgger RL training for ObjectNav / PointNav / Rearrangement
    (reference: readme_files/baselines_*.md)
  - zero-shot ObjectNav via CLIP text goals (reference: readme_files/zeroshot_objectnav.md)
"""

__version__ = "0.1.0"

from embodied_clip_tpu import constants  # noqa: F401
