"""Feature-store → probing pipeline integration (the reference's C6→C2 hand-off):
frames + semantic masks go in, thor_{split}.npz comes out, the ProbeDataModule reads
it, and a probe trains — with a stub encoder standing in for CLIP (the real encoders
are covered by test_encoders.py / parity tests)."""

import numpy as np
import pytest

from embodied_clip_tpu.data.feature_store import FeatureStoreWriter
from embodied_clip_tpu.data.probing import ProbeDataModule
from embodied_clip_tpu.constants import TARGET_OBJECTS


class StubEncoder:
    """Deterministic frames→features map with the reference key schema."""

    def encode(self, frames):
        import jax.numpy as jnp

        f = frames.astype(jnp.float32) / 255.0
        pooled = f.mean(axis=(1, 2))                      # (N,3)
        emb = jnp.concatenate([pooled, pooled ** 2, -pooled, pooled * 3], -1)  # (N,12)
        conv = jnp.stack([f[:, ::4, ::4, :]] * 2, -1).reshape(
            f.shape[0], f.shape[1] // 4, f.shape[2] // 4, 6)
        return {"clip_conv": conv, "clip_avgpool": emb, "clip_attnpool": emb,
                "imagenet_conv": conv, "imagenet_avgpool": emb}


def test_feature_store_to_probe_training(tmp_path):
    rng = np.random.RandomState(0)
    writer = FeatureStoreWriter({"stub": StubEncoder()}, batch_size=16)

    n = {"train": 48, "val": 16, "test": 16}
    color_map = {o: (i + 1, 2 * i + 1, 3 * i + 1) for i, o in enumerate(TARGET_OBJECTS[:5])}
    for split, count in n.items():
        frames = rng.randint(0, 256, (count, 24, 24, 3), np.uint8)
        sems = np.zeros((count, 24, 24, 3), np.uint8)
        for i in range(count):
            obj = TARGET_OBJECTS[i % 5]
            sems[i, :8, :8] = color_map[obj]  # object in the top-left grid cell
        free = rng.randint(0, 14, count)
        path = writer.write_thor_split(
            str(tmp_path), split, frames=frames, semantic_frames=sems,
            object_id_to_colors=[color_map] * count, free_space=free,
            scenes=[f"FloorPlan{i%4}" for i in range(count)],
        )
        with np.load(path) as z:
            assert z["object_presence"].shape == (count, 52)
            assert z["object_localization"].shape == (count, 9, 52)
            assert z["clip_avgpool"].shape[0] == count
            # the planted object registers in cell 0 and nowhere else
            planted = [TARGET_OBJECTS.index(TARGET_OBJECTS[i % 5]) for i in range(count)]
            assert all(z["object_presence"][i, planted[i]] == 1 for i in range(count))
            assert all(z["object_localization"][i, 0, planted[i]] == 1 for i in range(count))
            assert z["object_localization"][:, 1:, :].sum() == 0

    dm = ProbeDataModule(str(tmp_path), "clip_avgpool", "object_presence",
                         batch_size=16).setup()
    from embodied_clip_tpu.training.supervised import ProbeTrainConfig, ProbeTrainer

    tr = ProbeTrainer(ProbeTrainConfig(
        embedding_type="clip_avgpool", prediction_type="object_presence",
        max_epochs=2))
    tr.fit(dm)
    m = tr.test(dm)
    assert np.isfinite(m["loss"])


@pytest.mark.slow
def test_extract_thor_features_from_scene_files(tmp_path):
    """The extract-features CLI path: reference-format per-scene .npy files
    (thor_frames.py output schema) → thor_{split}.npz stores (real RN18 encoder)."""
    rng = np.random.RandomState(0)
    color_map = {TARGET_OBJECTS[0]: (10, 20, 30)}
    for split, scenes in [("train", ["FloorPlan1"]), ("val", ["FloorPlan21"])]:
        d = tmp_path / "scenes" / split
        d.mkdir(parents=True)
        for scene in scenes:
            records = []
            for _ in range(3):
                sem = np.zeros((48, 48, 3), np.uint8)
                sem[:16, :16] = color_map[TARGET_OBJECTS[0]]
                records.append({
                    "frame": rng.randint(0, 256, (48, 48, 3), np.uint8),
                    "semantic_frame": sem,
                    "object_id_to_color": color_map,
                    "valid_moves_forward": int(rng.randint(0, 12)),
                })
            np.save(str(d / f"{scene}.npy"), records)

    from embodied_clip_tpu.generate_data.extract import extract_thor_features

    out = tmp_path / "out"
    extract_thor_features(str(tmp_path / "scenes"), str(out),
                          encoder_names=["imagenet_rn18"], batch_size=4,
                          splits=("train", "val"))
    with np.load(str(out / "thor_train.npz")) as z:
        assert z["imagenet_avgpool"].shape == (3, 512)
        assert z["imagenet_conv"].shape[0] == 3
        assert z["object_presence"][:, 0].all()
        assert z["object_localization"][:, 0, 0].all()
        assert z["free_space"].shape == (3,)
        assert list(z["scene"]) == ["FloorPlan1"] * 3


@pytest.mark.slow
def test_extract_thor_features_int8(tmp_path):
    """dtype='int8' serves CLIP ResNets through the PTQ trunk (calibrated on the
    split's own frames); store contents stay finite and well-shaped."""
    rng = np.random.RandomState(0)
    color_map = {TARGET_OBJECTS[0]: (10, 20, 30)}
    d = tmp_path / "scenes" / "train"
    d.mkdir(parents=True)
    records = []
    for _ in range(3):
        sem = np.zeros((48, 48, 3), np.uint8)
        sem[:16, :16] = color_map[TARGET_OBJECTS[0]]
        records.append({
            "frame": rng.randint(0, 256, (48, 48, 3), np.uint8),
            "semantic_frame": sem,
            "object_id_to_color": color_map,
            "valid_moves_forward": int(rng.randint(0, 12)),
        })
    np.save(str(d / "FloorPlan1.npy"), records)

    from embodied_clip_tpu.generate_data.extract import extract_thor_features

    out = tmp_path / "features"
    extract_thor_features(str(tmp_path / "scenes"), str(out),
                          encoder_names=["clip_rn_tiny"], batch_size=4,
                          dtype="int8", splits=("train",))
    with np.load(str(out / "thor_train.npz")) as z:
        key = [k for k in z.files if "conv" in k][0]
        assert np.isfinite(np.asarray(z[key], np.float32)).all()
