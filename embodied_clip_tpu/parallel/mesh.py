"""Device mesh + sharding helpers.

The reference's only multi-device mode is data-parallel DD-PPO via
torch.distributed.launch + NCCL allreduce (baselines_habitat.md:63-69; SURVEY.md
§2.4). TPU-natively that is SPMD: one jitted step, env batch sharded over the mesh's
'dp' axis, params replicated — XLA inserts the gradient psum over ICI (and DCN across
slices) on its own. These helpers centralize mesh construction and pytree sharding;
a 'mp' (model-parallel) axis is accepted so tensor sharding is a mesh-axis choice,
not a rewrite (SURVEY.md §2.4 TP note), though RN50-scale models never need it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_spec", "shard_time_major"]


def make_mesh(dp: Optional[int] = None, mp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh with ('dp', 'mp') axes; dp defaults to all devices / mp."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // mp
    if dp * mp > len(devices):
        raise ValueError(
            f"mesh needs dp*mp={dp * mp} devices but only {len(devices)} are "
            f"available (jax.devices()); reduce dp/mp or add chips"
        )
    grid = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, ("dp", "mp"))


def batch_spec(leaf, batch: Optional[int] = None) -> P:
    """Shard the leading (batch) dimension over dp; replicate scalars and leaves
    whose leading dim isn't the batch (e.g. a single PRNG key)."""
    if getattr(leaf, "ndim", 0) == 0:
        return P()
    if batch is not None and leaf.shape[0] != batch:
        return P()
    return P("dp")


def shard_batch(tree, mesh: Mesh, batch: Optional[int] = None):
    """Place a pytree with leading batch dims onto the mesh, sharded over dp."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, batch_spec(x, batch))), tree
    )


def replicate(tree, mesh: Mesh):
    return jax.tree.map(lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_time_major(tree, mesh: Mesh, batch: int):
    """Shard time-major (T, B, ...) rollout leaves over dp along the batch axis.

    Leaves whose second dim is the batch get P(None, 'dp'); leaves whose FIRST dim
    is the batch (e.g. the h0 hidden state or the (B,) bootstrap value) get P('dp');
    everything else replicates. This is how host-collected rollouts are placed for
    the DD-PPO update: XLA then emits the gradient psum over ICI on its own.
    """
    def spec(x):
        shape = getattr(x, "shape", ())
        if len(shape) >= 2 and shape[1] == batch:
            return P(None, "dp")
        if len(shape) >= 1 and shape[0] == batch:
            return P("dp")
        return P()

    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, spec(x))), tree
    )
