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

__all__ = ["make_mesh", "shard_batch", "replicate", "batch_spec",
           "shard_time_major", "is_multiprocess", "local_view", "host_scalar",
           "gather_records"]


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


def is_multiprocess(mesh: Mesh) -> bool:
    """True when the mesh spans more than one JAX process (multi-host DD-PPO:
    per-process env pools feed one global SPMD update; SURVEY.md §2.4 DCN row)."""
    return len({d.process_index for d in mesh.devices.flat}) > 1


def _put(tree, mesh: Mesh, specs):
    """Place a pytree onto the mesh per-leaf specs. Single-process meshes use
    device_put; multi-process meshes convert each process's HOST-LOCAL arrays
    into one global array (concatenated along sharded axes in process order)
    via multihost_utils — device_put cannot build cross-process arrays."""
    if is_multiprocess(mesh):
        from jax.experimental import multihost_utils

        host = jax.tree.map(np.asarray, tree)
        return multihost_utils.host_local_array_to_global_array(
            host, mesh, specs)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree over the mesh. Multi-process: every process must
    pass the SAME host-local values (e.g. params initialized from one seed)."""
    return _put(tree, mesh, jax.tree.map(lambda _: P(), tree))


def shard_time_major(tree, mesh: Mesh, batch: int):
    """Shard time-major (T, B, ...) rollout leaves over dp along the batch axis.

    Leaves whose second dim is the batch get P(None, 'dp'); leaves whose FIRST dim
    is the batch (e.g. the h0 hidden state or the (B,) bootstrap value) get P('dp');
    everything else replicates. This is how host-collected rollouts are placed for
    the DD-PPO update: XLA then emits the gradient psum over ICI (DCN across
    hosts) on its own. On a multi-process mesh, `batch` is the PER-PROCESS env
    count and the resulting global batch is batch × process_count, concatenated
    in process order (the reference's N-learner-processes deployment,
    baselines_habitat.md:63-69).
    """
    def spec(x):
        shape = getattr(x, "shape", ())
        if len(shape) >= 2 and shape[1] == batch:
            return P(None, "dp")
        if len(shape) >= 1 and shape[0] == batch:
            return P("dp")
        return P()

    return _put(tree, mesh, jax.tree.map(spec, tree))


def local_view(tree):
    """Process-local view of a pytree of (possibly global, non-addressable)
    arrays: replicated leaves come back as their local shard — a zero-copy
    jax.Array on the local device. Lets process-local computations (the host
    rollout act step) consume globally replicated params without shipping
    anything over DCN."""
    def f(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            return x.addressable_shards[0].data
        return x

    return jax.tree.map(f, tree)


def gather_records(records: list) -> list:
    """Allgather a process-local list of JSON-serializable records across all
    JAX processes; every process returns the merged list in process order.

    Multi-process checkpoint eval shards episodes across processes (each
    process owns its own simulator pool, like training) and merges the
    per-episode records before the single metrics.json write — the
    torch.distributed gather step of the reference's 8-GPU eval launcher
    (baselines_habitat.md:88-97), expressed as a JAX collective: records are
    JSON bytes, allgathered as padded uint8 arrays (a two-step
    lengths-then-payload allgather, since collectives need equal shapes)."""
    import json

    if jax.process_count() == 1:
        return list(records)
    from jax.experimental import multihost_utils

    payload = np.frombuffer(json.dumps(records).encode("utf-8"), np.uint8)
    n = payload.size
    lengths = np.asarray(multihost_utils.process_allgather(np.int64(n)))
    padded = np.zeros((int(lengths.max()),), np.uint8)
    padded[:n] = payload
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    merged: list = []
    for p in range(gathered.shape[0]):
        merged.extend(json.loads(
            gathered[p, : int(lengths[p])].tobytes().decode("utf-8")))
    return merged


def host_scalar(v) -> float:
    """float() of a possibly-global scalar array (replicated update metrics)."""
    if isinstance(v, jax.Array) and not v.is_fully_addressable:
        return float(np.asarray(v.addressable_shards[0].data))
    return float(v)
