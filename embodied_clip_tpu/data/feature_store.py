"""Offline feature-store writer: batched TPU encode of simulator frames.

TPU-native replacement for the reference's extraction scripts
(thor_image_features.py:91-140, reachable_image_features.py:77-100), which run
batch-size-1 host↔device ping-pong per frame. Here frames are encoded in large uint8
batches through FrozenEncoder's single fused graph (all encoders, all pooling heads in
one device round-trip per batch), and labels (object presence / 3×3 grid presence /
free space) are computed vectorized on host from semantic frames.

Native output: thor_{split}.npz per split + reachable_image_features.npz /
reachable_{split}.json — the formats data/probing.py reads. Conv maps NHWC.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterable, List, Mapping, Optional, Sequence

import numpy as np

from embodied_clip_tpu.constants import TARGET_OBJECTS

__all__ = ["FeatureStoreWriter", "presence_labels", "grid_presence_labels"]


def class_masks(semantic_frame: np.ndarray, object_id_to_color: Mapping[str, Sequence[int]],
                objects: Sequence[str] = tuple(TARGET_OBJECTS)) -> np.ndarray:
    """(num_objects, H, W) bool masks — vectorized over all classes at once
    (reference computes one class at a time, thor_image_features.py:71-75/115-120)."""
    h, w = semantic_frame.shape[:2]
    colors = np.zeros((len(objects), 3), dtype=np.int32)
    valid = np.zeros(len(objects), dtype=bool)
    for i, o in enumerate(objects):
        c = object_id_to_color.get(o)
        if c is not None:
            colors[i] = np.asarray(c, dtype=np.int32)
            valid[i] = True
    eq = (semantic_frame[None].astype(np.int32) == colors[:, None, None, :]).all(axis=-1)
    return eq & valid[:, None, None]


def presence_labels(masks: np.ndarray) -> np.ndarray:
    """(num_objects,) int — any pixel present (thor_image_features.py:77-78,122)."""
    return (masks.sum(axis=(1, 2)) > 0).astype(np.int64)


def grid_presence_labels(masks: np.ndarray, grid=(3, 3)) -> np.ndarray:
    """(grid_cells, num_objects) int — per-cell presence with the reference's integer
    box edges (thor_image_features.py:80-88,123-127)."""
    h, w = masks.shape[1:3]
    out = []
    for i in range(grid[0]):
        for j in range(grid[1]):
            y1, y2 = int(i * h / grid[0]), int((i + 1) * h / grid[0])
            x1, x2 = int(j * w / grid[1]), int((j + 1) * w / grid[1])
            out.append(presence_labels(masks[:, y1:y2, x1:x2]))
    return np.stack(out)


class FeatureStoreWriter:
    """Encodes frame batches with one or more FrozenEncoders and writes .npz stores."""

    def __init__(self, encoders: Mapping[str, object], batch_size: int = 256):
        # encoders: e.g. {"imagenet": build_encoder("imagenet_rn50"),
        #                 "clip": build_encoder("clip_rn50")}
        self.encoders = dict(encoders)
        self.batch_size = batch_size
        # Two encoders of the same family emit the same output keys
        # (clip_conv/...): silently merging them would misalign or
        # shape-mismatch far from the cause — reject up front.
        prefixes = [getattr(getattr(e, "spec", None), "key_prefix", str(i))
                    for i, e in enumerate(self.encoders.values())]
        assert len(set(prefixes)) == len(prefixes), (
            f"encoders share output key prefixes {prefixes}; "
            "one encoder per family (clip/imagenet) per writer")

    def encode_frames(self, frames_u8: np.ndarray) -> Dict[str, np.ndarray]:
        """uint8 (N,H,W,3) → all feature keys, batched through the fused graphs."""
        import jax.numpy as jnp

        out: Dict[str, List[np.ndarray]] = {}
        n = len(frames_u8)
        for lo in range(0, n, self.batch_size):
            batch = jnp.asarray(frames_u8[lo : lo + self.batch_size])
            for enc in self.encoders.values():
                for key, val in enc.encode(batch).items():
                    # cache in f32 regardless of compute dtype — the reference
                    # .float()s before caching (thor_image_features.py:111-113),
                    # and npz can't round-trip bfloat16
                    out.setdefault(key, []).append(
                        np.asarray(val.astype(jnp.float32)))
        return {k: np.concatenate(v) for k, v in out.items()}

    # ------------------------------------------------------------------ THOR probing

    def write_thor_split(
        self,
        out_dir: str,
        split: str,
        frames: np.ndarray,
        semantic_frames: Optional[np.ndarray] = None,
        object_id_to_colors: Optional[Sequence[Mapping]] = None,
        free_space: Optional[np.ndarray] = None,
        scenes: Optional[Sequence[str]] = None,
        labels: Optional[Dict[str, np.ndarray]] = None,
    ) -> str:
        """Encode `frames` and write thor_{split}.npz with features + labels.

        Labels either precomputed via `labels` (object_presence (N,52),
        object_localization (N,9,52), free_space (N,)) or derived from
        semantic_frames + object_id_to_colors + free_space.
        """
        if labels is None:
            # validate BEFORE the expensive encode
            assert (semantic_frames is not None
                    and object_id_to_colors is not None
                    and free_space is not None), (
                "deriving labels needs semantic_frames, object_id_to_colors "
                "AND free_space (or pass precomputed labels=)")
        store = self.encode_frames(frames)
        if labels is None:
            pres, grid = [], []
            for sem, colors in zip(semantic_frames, object_id_to_colors):
                m = class_masks(sem, colors)
                pres.append(presence_labels(m))
                grid.append(grid_presence_labels(m))
            labels = {
                "object_presence": np.stack(pres),
                "object_localization": np.stack(grid),
                "free_space": np.asarray(free_space, dtype=np.int64),
            }
        store.update(labels)
        if scenes is not None:
            store["scene"] = np.asarray(scenes)
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"thor_{split}.npz")
        np.savez_compressed(path, **store)
        return path

    # ----------------------------------------------------------------- reachability

    def write_reachable_features(self, out_dir: str, images: Mapping[str, np.ndarray]) -> str:
        """{image_name: uint8 HWC} → reachable_image_features.npz (pooled keys only,
        reference reachable_image_features.py:94-98)."""
        names = sorted(images.keys())
        frames = np.stack([images[n] for n in names])
        feats = self.encode_frames(frames)
        pooled = {
            k: v for k, v in feats.items()
            if k in ("imagenet_avgpool", "clip_avgpool", "clip_attnpool", "clip_embed")
        }
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, "reachable_image_features.npz")
        np.savez_compressed(path, image_names=np.asarray(names), **pooled)
        return path

    @staticmethod
    def write_reachable_split(out_dir: str, split: str, triples: Iterable) -> str:
        path = os.path.join(out_dir, f"reachable_{split}.json")
        with open(path, "w") as f:
            json.dump([[t[0], int(t[1]), bool(t[2])] for t in triples], f)
        return path
