"""Supervised probe trainer: jitted train/eval steps + the reference's training
contract (train.py:136-174): Adam lr 1e-3, batch 128, up to 250 epochs, validation
twice per epoch, best-val-loss checkpointing, test on the best checkpoint, TensorBoard
scalars train_loss/val_loss/val_acc/test_loss/test_acc.

TPU design: the whole optimizer step is one jitted function (donated state); probes
are tiny so a single chip suffices — data parallelism over a mesh axis is available
via `mesh`/pjit when batch throughput matters.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax

from embodied_clip_tpu.models.probes import build_probe, probe_loss, probe_metrics
from embodied_clip_tpu.utils.checkpoint import BestCheckpointer
from embodied_clip_tpu.utils.prefetch import prefetch_to_device
from embodied_clip_tpu.utils.seeding import seed_everything
from embodied_clip_tpu.utils.tensorboard import SummaryWriter

__all__ = ["ProbeTrainConfig", "ProbeTrainer"]


@dataclasses.dataclass
class ProbeTrainConfig:
    embedding_type: str = "clip_avgpool"
    prediction_type: str = "object_presence"
    lr: float = 1e-3          # train.py:137
    batch_size: int = 128     # train.py:136
    max_epochs: int = 250     # train.py:158
    val_per_epoch: int = 2    # val_check_interval=0.5, train.py:157
    seed: int = 1             # train.py:117
    log_dir: Optional[str] = None
    ckpt_dir: Optional[str] = None
    # Materializing the loss scalar forces a device→host sync; sample it rather than
    # stalling the TPU every step (the reference logs per-step because torch is eager).
    log_every: int = 20
    # Data-parallel training over a mesh 'dp' axis (the reference's pl.Trainer(gpus=N),
    # train.py:132-133,156). Probes are tiny — this is for batch throughput at scale.
    data_parallel: bool = False


class ProbeTrainer:
    def __init__(self, config: ProbeTrainConfig):
        self.cfg = config
        self.module = build_probe(config.embedding_type, config.prediction_type)
        self.tx = optax.adam(config.lr)
        self.params = None
        self.opt_state = None
        self.global_step = 0
        self.writer = None
        if config.log_dir:
            # Reference logger layout: {log_dir}/{prediction_type}/{embedding_type}
            # (train.py:139-143).
            self.writer = SummaryWriter(
                os.path.join(config.log_dir, config.prediction_type, config.embedding_type)
            )
        self.best = BestCheckpointer(config.ckpt_dir)
        pt = config.prediction_type

        def train_step(params, opt_state, x, y):
            def loss_fn(p):
                return probe_loss(pt, self.module.apply({"params": p}, x), y)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        def eval_step(params, x, y):
            logits = self.module.apply({"params": params}, x)
            return probe_loss(pt, logits, y), probe_metrics(pt, logits, y)

        self.mesh = None
        self._batch_sharding = None
        if config.data_parallel:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from embodied_clip_tpu.parallel.mesh import make_mesh

            self.mesh = make_mesh()
            self._batch_sharding = NamedSharding(self.mesh, P("dp"))
        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._eval_step = jax.jit(eval_step)

    def _put_batch(self, batch):
        """Device placement: dp-shard full batches; replicate indivisible remainders
        (their shapes trigger a separate compile anyway, so correctness holds)."""
        import jax

        if self._batch_sharding is None:
            return jax.tree.map(jax.device_put, batch)
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = self.mesh.shape["dp"]
        rep = NamedSharding(self.mesh, P())

        def put(x):
            sh = self._batch_sharding if x.shape[0] % ndev == 0 else rep
            return jax.device_put(x, sh)

        return jax.tree.map(put, batch)

    # ------------------------------------------------------------------ lifecycle

    def init(self, example_x) -> None:
        key = seed_everything(self.cfg.seed)
        self.params = self.module.init(key, jnp.asarray(example_x[:1]))["params"]
        self.opt_state = self.tx.init(self.params)

    def load(self, path: str, example_x) -> None:
        """Restore probe params from a checkpoint (reference `-c ckpt` / eval flow)."""
        from embodied_clip_tpu.utils.checkpoint import restore_pytree

        if self.params is None:
            self.init(example_x)
        restored = restore_pytree(path, self.params)
        if isinstance(restored, dict) and "params" in restored:
            restored = restored["params"]
        self.params = restored

    def _log(self, tag: str, value: float) -> None:
        if self.writer:
            self.writer.add_scalar(tag, value, self.global_step)

    # ----------------------------------------------------------------- train loop

    def fit(self, dm) -> Dict[str, float]:
        if self.params is None:
            x0, _ = next(dm.batches("train", shuffle=False))
            self.init(x0)
        steps = dm.steps_per_epoch("train")
        val_every = max(1, steps // max(1, self.cfg.val_per_epoch))
        last_val: Dict[str, float] = {}
        for _epoch in range(self.cfg.max_epochs):
            batches = prefetch_to_device(dm.batches("train"), sharding=self._put_batch)
            for i, (x, y) in enumerate(batches):
                self.params, self.opt_state, loss = self._train_step(
                    self.params, self.opt_state, x, y
                )
                self.global_step += 1
                if self.writer and self.global_step % self.cfg.log_every == 0:
                    self._log("train_loss", float(loss))
                if (i + 1) % val_every == 0 or i + 1 == steps:
                    last_val = self.validate(dm)
        if self.writer:
            self.writer.flush()
        return last_val

    def evaluate(self, dm, split: str) -> Dict[str, float]:
        tot_loss, tot_acc, n = 0.0, 0.0, 0
        for x, y in prefetch_to_device(dm.batches(split, shuffle=False),
                                       sharding=self._put_batch):
            loss, metrics = self._eval_step(self.params, x, y)
            tot_loss += float(loss)
            tot_acc += float(metrics["accuracy"])
            n += 1
        # PL logs epoch metrics as the unweighted mean over batches.
        return {"loss": tot_loss / max(n, 1), "accuracy": tot_acc / max(n, 1)}

    def validate(self, dm) -> Dict[str, float]:
        m = self.evaluate(dm, "val")
        self._log("val_loss", m["loss"])
        self._log("val_acc", m["accuracy"])
        self.best.update(m["loss"], self.params, tag=f"step{self.global_step}")
        return m

    def test(self, dm, use_best: bool = True) -> Dict[str, float]:
        """Evaluate on test with the best-val params (reference ckpt_path='best',
        train.py:170-174)."""
        saved = self.params
        if use_best and self.best.best_params is not None:
            self.params = self.best.best_params
        m = self.evaluate(dm, "test")
        self._log("test_loss", m["loss"])
        self._log("test_acc", m["accuracy"])
        self.params = saved
        if self.writer:
            self.writer.flush()
        return m
