"""Data-generation behavior ports: split rule, label computation, reachability
metadata builder (reference generate_data/* semantics)."""

import json
import os

import numpy as np

from embodied_clip_tpu.data.feature_store import (
    class_masks, grid_presence_labels, presence_labels,
)
from embodied_clip_tpu.generate_data.reachable_metadata import (
    build_object_superset, build_split_triples, main as reachable_main,
    strip_instance_suffix,
)
from embodied_clip_tpu.generate_data.thor_frames import split_of_scene


def test_scene_split_rule():
    # reference thor_frames.py:43-49: id%100 <=20 train, <=25 val, else test
    assert split_of_scene("FloorPlan1_physics") == "train"
    assert split_of_scene("FloorPlan20") == "train"
    assert split_of_scene("FloorPlan21") == "val"
    assert split_of_scene("FloorPlan25") == "val"
    assert split_of_scene("FloorPlan26") == "test"
    assert split_of_scene("FloorPlan201") == "train"
    assert split_of_scene("FloorPlan425") == "val"


def test_semantic_label_computation():
    # 6x6 semantic frame: Mug color at (0,0)-(1,1); Bed color at (5,5)
    sem = np.zeros((6, 6, 3), np.uint8)
    sem[0:2, 0:2] = (10, 20, 30)
    sem[5, 5] = (40, 50, 60)
    colors = {"Mug": (10, 20, 30), "Bed": (40, 50, 60)}
    masks = class_masks(sem, colors, objects=("Mug", "Bed", "Sofa"))
    assert masks.shape == (3, 6, 6)
    np.testing.assert_array_equal(presence_labels(masks), [1, 1, 0])
    grid = grid_presence_labels(masks)
    assert grid.shape == (9, 3)
    np.testing.assert_array_equal(grid[0], [1, 0, 0])   # top-left cell: Mug
    np.testing.assert_array_equal(grid[8], [0, 1, 0])   # bottom-right cell: Bed
    assert grid.sum() == 2


def test_strip_instance_suffix():
    assert strip_instance_suffix("Mug_3f5a") == "Mug"
    assert strip_instance_suffix("Mug") == "Mug"
    assert strip_instance_suffix("Coffee_Machine_2") == "Coffee"


def test_reachable_metadata_builder(tmp_path):
    rng = np.random.RandomState(0)
    # Synthetic CSR-style files across splits with overlapping class sets.
    all_classes = ["Apple", "Bed", "Cup", "Mug"]
    for si, split in enumerate(("train", "val", "test")):
        boxes, pickable = {}, {}
        for i in range(12):
            img = f"{split}_img{i}"
            objs = [f"{all_classes[(i + j + si) % 4]}_{j}" for j in range(2)]
            boxes[img] = {o: [0, 0, 1, 1] for o in objs}
            pickable[img] = [o for o in objs if rng.rand() < 0.5]
        with open(os.path.join(tmp_path, f"{split}_boxes.json"), "w") as f:
            json.dump(boxes, f)
        with open(os.path.join(tmp_path, f"{split}_boxes_pickupable.json"), "w") as f:
            json.dump(pickable, f)

    superset = build_object_superset(str(tmp_path))
    assert superset == sorted(all_classes)

    out = os.path.join(tmp_path, "out")
    reachable_main(str(tmp_path), out, seed=1)
    with open(os.path.join(out, "reachable_train.json")) as f:
        triples = json.load(f)
    assert triples, "no triples emitted"
    # class balance: per class, negatives <= positives
    import collections

    pos = collections.Counter()
    neg = collections.Counter()
    for img, obj_id, reach in triples:
        (pos if reach else neg)[obj_id] += 1
    for obj_id, n_neg in neg.items():
        assert n_neg <= pos.get(obj_id, 0)


def test_stage_timer():
    from embodied_clip_tpu.utils.profiling import StageTimer

    t = StageTimer()
    with t.stage("env"):
        pass
    with t.stage("update"):
        pass
    s = t.summary()
    assert s["env_calls"] == 1 and s["update_calls"] == 1
    assert abs(s["env_frac"] + s["update_frac"] - 1.0) < 1e-6


def test_tensorboard_event_file_format(tmp_path):
    """The dependency-free TB writer emits valid TFRecord framing (length + masked
    crc32c) that a minimal reader can parse back."""
    import struct
    from embodied_clip_tpu.utils.tensorboard import SummaryWriter, _masked_crc

    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train_loss", 0.5, 1)
    w.add_scalar("val_acc", 0.75, 2)
    w.close()
    files = [f for f in os.listdir(tmp_path) if f.startswith("events.out.tfevents")]
    assert len(files) == 1
    data = open(os.path.join(tmp_path, files[0]), "rb").read()
    off, records = 0, []
    while off < len(data):
        (length,) = struct.unpack("<Q", data[off:off + 8])
        (len_crc,) = struct.unpack("<I", data[off + 8:off + 12])
        assert len_crc == _masked_crc(data[off:off + 8])
        payload = data[off + 12:off + 12 + length]
        (pay_crc,) = struct.unpack("<I", data[off + 12 + length:off + 16 + length])
        assert pay_crc == _masked_crc(payload)
        records.append(payload)
        off += 16 + length
    assert len(records) == 3  # header + 2 scalars
    assert b"brain.Event:2" in records[0]
    assert b"train_loss" in records[1] and b"val_acc" in records[2]
