"""End-to-end probing slice: synthetic feature store → ProbeDataModule → ProbeTrainer
fit/validate/test — exercising config, data, model, losses, metrics, best-ckpt logic
for all four prediction types (reference train.py grid).

Feature dims are shrunk (probes adapt via Dense); label heads keep reference sizes
(52/110/11 classes)."""

import json
import os

import numpy as np
import pytest

from embodied_clip_tpu.data.probing import ProbeDataModule
from embodied_clip_tpu.training.supervised import ProbeTrainConfig, ProbeTrainer

N_TRAIN, N_EVAL, D = 512, 128, 48
RNG = np.random.RandomState(7)
W_PRES = RNG.randn(D, 52) * 1.5
W_LOC = RNG.randn(16, 52) * 1.5
W_FREE = RNG.randn(D, 11) * 1.5
W_REACH = RNG.randn(D, 110) * 1.5


def _split_arrays(rng, n):
    x = rng.randn(n, D).astype(np.float32)
    conv = rng.randn(n, 7, 7, 16).astype(np.float32)
    cells = conv.reshape(n, 7, 7, 16)
    # 3x3 adaptive cells with torch bin edges: [0:3),[2:5),[4:7)
    bins = [(0, 3), (2, 5), (4, 7)]
    cell_feats = np.stack(
        [cells[:, r0:r1, c0:c1].mean(axis=(1, 2)) for r0, r1 in bins for c0, c1 in bins],
        axis=1,
    )  # (n, 9, 16)
    free = np.argmax(x @ W_FREE, axis=1).astype(np.int64)
    free[: n // 16] = 13  # exercise >MAX_FORWARD_STEPS clipping (train.py:64-65)
    return {
        "clip_avgpool": x,
        "clip_attnpool": x,
        "imagenet_avgpool": x,
        "clip_conv": conv,
        "imagenet_conv": conv,
        "object_presence": (x @ W_PRES > 0).astype(np.int64),
        "object_localization": (cell_feats @ W_LOC > 0).astype(np.int64),
        "free_space": free,
    }


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("probe_data")
    rng = np.random.RandomState(0)
    for split, n in [("train", N_TRAIN), ("val", N_EVAL), ("test", N_EVAL)]:
        np.savez(os.path.join(d, f"thor_{split}.npz"), **_split_arrays(rng, n))
    # reachability store
    m = 256
    feats = rng.randn(m, D).astype(np.float32)
    names = [f"img{i:04d}" for i in range(m)]
    np.savez(
        os.path.join(d, "reachable_image_features.npz"),
        image_names=np.asarray(names),
        clip_avgpool=feats, clip_attnpool=feats, imagenet_avgpool=feats,
    )
    reach = feats @ W_REACH > 0
    for split in ("train", "val", "test"):
        # Concentrate on 8 object classes so each per-class binary classifier sees
        # enough samples to be learnable in a quick test.
        triples = []
        idx = rng.randint(0, m, 1000)
        objs = rng.randint(0, 8, 1000)
        for i, o in zip(idx, objs):
            triples.append([names[i], int(o), bool(reach[i, o])])
        with open(os.path.join(d, f"reachable_{split}.json"), "w") as f:
            json.dump(triples, f)
    return str(d)


def _run(data_dir, prediction_type, embedding_type="clip_avgpool", epochs=120):
    dm = ProbeDataModule(data_dir, embedding_type, prediction_type, batch_size=128).setup()
    tr = ProbeTrainer(ProbeTrainConfig(
        embedding_type=embedding_type, prediction_type=prediction_type,
        max_epochs=epochs,
    ))
    first_val = None
    tr.fit(dm)
    test = tr.test(dm)
    return tr, test


def test_object_presence_learns(data_dir):
    tr, test = _run(data_dir, "object_presence")
    assert test["accuracy"] > 0.75, test
    assert tr.best.best_params is not None


def test_free_space_learns(data_dir):
    _, test = _run(data_dir, "free_space")
    assert test["accuracy"] > 0.5, test  # 11-way, chance ≈ 0.09


def test_reachability_learns(data_dir):
    _, test = _run(data_dir, "reachability", epochs=200)
    assert test["accuracy"] > 0.7, test  # binary


def test_object_localization_learns(data_dir):
    _, test = _run(data_dir, "object_localization", epochs=120)
    assert test["accuracy"] > 0.7, test


def test_attnpool_embedding_variant(data_dir):
    _, test = _run(data_dir, "object_presence", embedding_type="clip_attnpool", epochs=5)
    assert test["accuracy"] > 0.5


def test_localization_rejects_attnpool(data_dir):
    with pytest.raises(AssertionError):
        _run(data_dir, "object_localization", embedding_type="clip_attnpool", epochs=1)


def test_pt_compat_loading(data_dir, tmp_path):
    """Reference-format thor_{split}.pt files load identically (CHW→HWC)."""
    torch = pytest.importorskip("torch")
    d = str(tmp_path)
    rng = np.random.RandomState(3)
    arrays = _split_arrays(rng, 8)
    data = {"FloorPlan1": []}
    for i in range(8):
        data["FloorPlan1"].append({
            "clip_avgpool": torch.tensor(arrays["clip_avgpool"][i]),
            "clip_conv": torch.tensor(arrays["clip_conv"][i]).permute(2, 0, 1),
            "object_presence": torch.tensor(arrays["object_presence"][i]),
            "object_localization": torch.tensor(arrays["object_localization"][i]),
            "free_space": int(arrays["free_space"][i]),
        })
    for split in ("train", "val", "test"):
        torch.save(data, os.path.join(d, f"thor_{split}.pt"))

    from embodied_clip_tpu.data.probing import load_probe_split

    x, y = load_probe_split(d, "train", "clip_avgpool", "object_presence")
    np.testing.assert_allclose(x, arrays["clip_avgpool"][:8])
    np.testing.assert_array_equal(y, arrays["object_presence"][:8])
    xc, _ = load_probe_split(d, "train", "clip_avgpool", "object_localization")
    np.testing.assert_allclose(xc, arrays["clip_conv"][:8], atol=1e-6)


def test_probe_checkpoint_roundtrip(data_dir, tmp_path):
    """Best-val checkpoint persists to disk and restores for eval-only runs
    (reference ModelCheckpoint + ckpt_path='best', train.py:160-174)."""
    from embodied_clip_tpu.training.supervised import ProbeTrainConfig, ProbeTrainer

    dm = ProbeDataModule(data_dir, "clip_avgpool", "object_presence", batch_size=128).setup()
    tr = ProbeTrainer(ProbeTrainConfig(
        embedding_type="clip_avgpool", prediction_type="object_presence",
        max_epochs=3, ckpt_dir=str(tmp_path)))
    tr.fit(dm)
    test1 = tr.test(dm)

    tr2 = ProbeTrainer(ProbeTrainConfig(
        embedding_type="clip_avgpool", prediction_type="object_presence"))
    x0, _ = next(dm.batches("train", shuffle=False))
    tr2.load(str(tmp_path / "best"), x0)
    test2 = tr2.evaluate(dm, "test")
    np.testing.assert_allclose(test2["accuracy"], test1["accuracy"], atol=1e-6)


def test_probe_data_parallel_matches_single(data_dir):
    """dp-sharded probe training (8-device mesh) reproduces single-device results."""
    from embodied_clip_tpu.training.supervised import ProbeTrainConfig, ProbeTrainer

    results = []
    for dp in (False, True):
        dm = ProbeDataModule(data_dir, "clip_avgpool", "object_presence",
                             batch_size=128).setup()
        tr = ProbeTrainer(ProbeTrainConfig(
            embedding_type="clip_avgpool", prediction_type="object_presence",
            max_epochs=4, data_parallel=dp))
        tr.fit(dm)
        results.append(tr.test(dm))
    np.testing.assert_allclose(results[0]["accuracy"], results[1]["accuracy"], atol=5e-3)
    np.testing.assert_allclose(results[0]["loss"], results[1]["loss"], atol=5e-3)
