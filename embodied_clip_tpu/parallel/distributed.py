"""Multi-host initialization (DCN scale-out).

The reference's multi-GPU story is torch.distributed.launch + NCCL on one 8-GPU box
(baselines_habitat.md:63-69). The TPU equivalent spans hosts: call
`initialize_distributed()` once per process (pod slice or multi-slice), then build a
global mesh — XLA routes collectives over ICI within a slice and DCN across slices.
Single-process runs are a no-op, so the same entry point works everywhere.
"""

from __future__ import annotations

import os
from typing import Optional

__all__ = ["initialize_distributed", "global_mesh"]


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed from args or standard env vars; returns True if a
    multi-process runtime was set up."""
    import jax

    coordinator_address = coordinator_address or os.environ.get("ECT_COORDINATOR")
    if num_processes is None and "ECT_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["ECT_NUM_PROCESSES"])
    if process_id is None and "ECT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["ECT_PROCESS_ID"])

    if coordinator_address is None and num_processes in (None, 1):
        return False  # single-process: nothing to do
    # Idempotent: the trainer calls this defensively even when the entry point
    # already initialized the cluster. jax raises different errors for the
    # double call depending on whether the backend is live, so consult the
    # runtime's own state instead of matching messages.
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return True
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(dp: Optional[int] = None, mp: int = 1):
    """Mesh over ALL processes' devices (jax.devices() is global post-initialize)."""
    from embodied_clip_tpu.parallel.mesh import make_mesh

    return make_mesh(dp=dp, mp=mp)
