"""Experiment-config registry: dataclass configs addressable from the single CLI.

Replaces the reference's three config idioms (SURVEY.md §5): argparse probing flags
(train.py:119-134), allenact experiment-classes-by-module-tag
(baselines_robothor_objectnav.md:48-51), habitat YAML grids (baselines_habitat.md:63-75).
Every documented experiment of the paper maps to a registered name here.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Optional

_REGISTRY: Dict[str, Callable[[], "Experiment"]] = {}


def register(name: str):
    def deco(factory):
        _REGISTRY[name] = factory
        return factory
    return deco


def list_experiments() -> List[str]:
    return sorted(_REGISTRY)


def get_experiment(name: str, overrides: Optional[List[str]] = None) -> "Experiment":
    if name not in _REGISTRY:
        raise KeyError(f"unknown experiment {name!r}; run list-configs")
    exp = _REGISTRY[name]()
    for ov in overrides or []:
        key, _, value = ov.partition("=")
        cur = getattr(exp, key)  # raises AttributeError on typo'd keys
        if value.lower() in ("none", "null"):
            setattr(exp, key, None)
            continue
        if cur is not None:
            typ = type(cur)
            setattr(exp, key,
                    typ(value) if typ is not bool else value.lower() in ("1", "true"))
            continue
        # None-default fields carry no type — infer from the literal
        # (int → float → str) so numeric knobs don't arrive as strings.
        for typ in (int, float):
            try:
                setattr(exp, key, typ(value))
                break
            except ValueError:
                continue
        else:
            setattr(exp, key, value)
    return exp


@dataclasses.dataclass
class Experiment:
    name: str = "base"

    def train(self, output_dir: str, ckpt: Optional[str] = None) -> dict:
        raise NotImplementedError

    def evaluate(self, output_dir: str, ckpt: Optional[str] = None) -> dict:
        raise NotImplementedError


# ------------------------------------------------------------------------- probing

@dataclasses.dataclass
class ProbeExperiment(Experiment):
    """Probing grid: 3 embeddings × 4 predictions (reference train.py choices)."""

    embedding_type: str = "clip_avgpool"
    prediction_type: str = "object_presence"
    data_dir: str = "data"
    log_dir: str = "logs/"
    max_epochs: int = 250
    batch_size: int = 128
    lr: float = 1e-3

    def train(self, output_dir: str, ckpt: Optional[str] = None) -> dict:
        from embodied_clip_tpu.data.probing import ProbeDataModule
        from embodied_clip_tpu.training.supervised import ProbeTrainConfig, ProbeTrainer

        dm = ProbeDataModule(
            self.data_dir, self.embedding_type, self.prediction_type, self.batch_size
        ).setup()
        trainer = ProbeTrainer(ProbeTrainConfig(
            embedding_type=self.embedding_type, prediction_type=self.prediction_type,
            lr=self.lr, batch_size=self.batch_size, max_epochs=self.max_epochs,
            log_dir=self.log_dir, ckpt_dir=output_dir,
        ))
        val = trainer.fit(dm)
        test = trainer.test(dm)
        return {"val": val, "test": test}

    def evaluate(self, output_dir: str, ckpt: Optional[str] = None) -> dict:
        """Eval-only pass: restore a checkpoint and score the test split. No
        training step runs (reference eval flow: restore + trainer.test,
        train.py:170-174). `ckpt` defaults to the best-val checkpoint that
        `train` wrote under `output_dir`."""
        import os

        from embodied_clip_tpu.data.probing import ProbeDataModule
        from embodied_clip_tpu.training.supervised import ProbeTrainConfig, ProbeTrainer

        dm = ProbeDataModule(
            self.data_dir, self.embedding_type, self.prediction_type, self.batch_size
        ).setup()
        trainer = ProbeTrainer(ProbeTrainConfig(
            embedding_type=self.embedding_type, prediction_type=self.prediction_type,
            lr=self.lr, batch_size=self.batch_size, max_epochs=self.max_epochs,
            log_dir=None, ckpt_dir=None,
        ))
        if ckpt is None:
            best = os.path.join(output_dir, "best")
            if not os.path.isdir(best):
                raise FileNotFoundError(
                    f"--eval needs a checkpoint: none given and {best!r} absent")
            ckpt = best
        x0, _ = next(dm.batches("test", shuffle=False))
        trainer.load(ckpt, x0)
        return {"test": trainer.test(dm, use_best=False)}


def _register_probe_grid():
    from embodied_clip_tpu.models.probes import PREDICTION_TYPES

    for pred in PREDICTION_TYPES:
        embs = ("imagenet_avgpool", "clip_avgpool") if pred == "object_localization" \
            else ("imagenet_avgpool", "clip_avgpool", "clip_attnpool")
        for emb in embs:
            name = f"probe_{pred}_{emb}"

            def factory(e=emb, p=pred, n=name):
                return ProbeExperiment(name=n, embedding_type=e, prediction_type=p)

            _REGISTRY[name] = factory


_register_probe_grid()


# ------------------------------------------------------------------------------ RL
# ObjectNav / PointNav / Rearrangement experiments are registered by
# embodied_clip_tpu.config.rl_experiments (imported lazily to keep CLI startup light).

def _register_rl():
    try:
        from embodied_clip_tpu.config import rl_experiments  # noqa: F401
    except ImportError:
        pass


_register_rl()
