"""Multi-process / multi-host initialization (SURVEY.md §5.8).

The reference is single-process (SURVEY.md §2.3); scale-out here rides
``jax.distributed`` — every host runs the same program, JAX wires the
hosts into one system, and the mesh in parallel/mesh.py spans all chips.
No NCCL/MPI layer: XLA lowers collectives onto ICI (intra-slice) and DCN
(across slices).

Typical flow on each host::

    from han_tpu.parallel import launch, mesh
    launch.init_distributed()              # no-op when single-process
    m = mesh.make_mesh(graph=0, heads=1)   # all global devices
    ... pjit / shard_map as usual ...

Coordinates resolve from explicit arguments, else the standard
JAX/Cloud-TPU environment (``jax.distributed.initialize()`` with no args
auto-detects on TPU pods), else the ``HAN_TPU_*`` variables below.
"""

from __future__ import annotations

import os

import jax

_INITIALIZED = False


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> dict:
    """Join the multi-process JAX system; safe to call when single-process.

    Resolution order per field: explicit argument → ``HAN_TPU_COORDINATOR``
    / ``HAN_TPU_NUM_PROCESSES`` / ``HAN_TPU_PROCESS_ID`` env vars → TPU-pod
    auto-detection (bare ``jax.distributed.initialize()``). With no
    configuration at all (the single-process case) this is a no-op.

    Returns {'process_id', 'num_processes', 'local_devices',
    'global_devices'} for logging.
    """
    global _INITIALIZED
    coordinator_address = coordinator_address or os.environ.get("HAN_TPU_COORDINATOR")
    if num_processes is None and "HAN_TPU_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["HAN_TPU_NUM_PROCESSES"])
    if process_id is None and "HAN_TPU_PROCESS_ID" in os.environ:
        process_id = int(os.environ["HAN_TPU_PROCESS_ID"])

    if not _INITIALIZED:
        if coordinator_address is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id)
            _INITIALIZED = True
        elif os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
                "MEGASCALE_COORDINATOR_ADDRESS"):
            try:
                jax.distributed.initialize()  # TPU pod / multislice auto-detect
                _INITIALIZED = True
            except RuntimeError:
                # backend already initialized (e.g. single-host run where the
                # platform sets pod-style env vars) — proceed single-process
                pass
        # else: single process — nothing to join

    return {
        "process_id": jax.process_index(),
        "num_processes": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_coordinator() -> bool:
    """True on the process that should write checkpoints / logs."""
    return jax.process_index() == 0
