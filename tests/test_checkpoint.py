"""StepCheckpointer resume guard: a reused output dir holding a DIFFERENT
config's checkpoints must fail loudly at restore time, not as a flax shape
error deep inside the first jitted rollout (found by driving the CLI train
resume path against a stale output dir)."""

import numpy as np
import pytest

from embodied_clip_tpu.utils.checkpoint import StepCheckpointer


def _state(width):
    return {"params": {"w": np.zeros((width,), np.float32)},
            "opt_state": {"count": np.zeros((), np.int32)}}


def test_restore_latest_returns_matching_state(tmp_path):
    ck = StepCheckpointer(str(tmp_path), prefix="exp")
    ck.save(128, _state(3))
    step, state = ck.restore_latest(_state(3))
    assert step == 128
    assert state["params"]["w"].shape == (3,)


def test_restore_latest_rejects_shape_mismatch(tmp_path):
    ck = StepCheckpointer(str(tmp_path), prefix="exp")
    ck.save(128, _state(3))
    with pytest.raises(ValueError, match="different experiment config"):
        ck.restore_latest(_state(5))


def test_restore_latest_rejects_different_tree(tmp_path):
    ck = StepCheckpointer(str(tmp_path), prefix="exp")
    ck.save(64, _state(3))
    other = {"params": {"w": np.zeros((3,), np.float32),
                        "b": np.zeros((3,), np.float32)},
             "opt_state": {"count": np.zeros((), np.int32)}}
    with pytest.raises(ValueError, match="different experiment config"):
        ck.restore_latest(other)
