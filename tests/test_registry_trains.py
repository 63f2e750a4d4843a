"""Every registered RL experiment trains end-to-end as registered (tiny
overrides, hermetic fake backend) — the runbook surface of
baselines_robothor_objectnav.md / baselines_habitat.md /
baselines_ithor_rearrangement.md / zeroshot_objectnav.md, exercised name by
name. Encoder-bearing configs swap to the smoke-scale CLIP trunk so the frozen
preprocess→encode→policy path still runs in-rollout at CPU-test cost.
"""

import dataclasses as dc

import numpy as np
import pytest

from embodied_clip_tpu.config import rl_experiments  # noqa: F401  (registers)
from embodied_clip_tpu.config.experiments import _REGISTRY, get_experiment

RL_NAMES = sorted(
    name for name in _REGISTRY
    if not name.startswith("probe_")
)


@pytest.mark.parametrize("name", RL_NAMES)
def test_registered_experiment_trains(name, tmp_path):
    exp = get_experiment(name)
    tiny = dict(total_env_steps=64, rollout_len=4, env_batch=8, hidden=32,
                ckpt_every_steps=10_000)
    if exp.encoder is not None:
        # smoke-scale trunk keeps the encoder-in-rollout path but CPU-cheap
        tiny["encoder"] = "clip_rn_tiny"
        tiny["encoder_dtype"] = "float32"
    exp = dc.replace(exp, **tiny)
    out = exp.train(output_dir=str(tmp_path))
    assert out["env_steps"] >= 64, (name, out)
    assert np.isfinite(out["loss"]), (name, out)
