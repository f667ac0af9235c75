"""Multi-process / multi-host initialization (SPMD over pods).

The reference has no distributed backend at all (single process + rayon;
SURVEY §5.8); scaling beyond one host here uses JAX's native runtime:
`jax.distributed.initialize` connects the processes of a pod/slice, after
which `jax.devices()` spans every chip and the mesh helpers in
needle_tpu.parallel shard the episodes/pairs axes across them with XLA
emitting any collectives over ICI/DCN.

Typical multi-host launch (one process per host, e.g. via the TPU VM
runtime or GKE):

    import needle_tpu.parallel.distributed as dist
    dist.initialize()                      # env-driven on TPU VMs
    with needle_tpu.parallel.needle_mesh():  # all chips of the slice
        Analyzer.from_files(my_shard).run(...)   # episodes-axis parallel
        Comparator.from_files(all_videos).run(...)  # pairs-axis parallel

File IO remains per-host: each host analyzes the episodes it can see on
its filesystem (`.needle.dat` next to each video), and search results /
skip files are written by process 0 (`is_coordinator()`).
"""

from __future__ import annotations

from typing import Optional

import jax


_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Connect this process to the distributed runtime (idempotent).

    With no arguments, JAX auto-discovers the topology on TPU VMs/GKE.
    Explicit arguments support manual clusters:
    initialize("10.0.0.1:8476", num_processes=4, process_id=0).
    """
    global _initialized
    if _initialized:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True


def is_initialized() -> bool:
    return _initialized


def is_coordinator() -> bool:
    """True on the process that should perform singleton side effects
    (result display, skip-file writes for shared filesystems)."""
    return jax.process_index() == 0


def process_count() -> int:
    return jax.process_count()


def local_shard(items):
    """Round-robin shard a list of work items (e.g. video paths) across
    processes — the episodes-axis analog of the reference's rayon fan-out,
    at the host level."""
    return list(items)[jax.process_index() :: jax.process_count()]
