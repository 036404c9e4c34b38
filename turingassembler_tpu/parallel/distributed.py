"""Multi-host runtime scaffolding (SURVEY.md §5.8).

The reference has no distributed backend (single host, pthreads,
filesystem hand-off).  Here the scale-out story is:

  - `jax.distributed.initialize` bootstraps the multi-host runtime
    (ICI within a slice, DCN across slices);
  - each host streams its own FASTQ shard through the native loader;
  - the global mesh spans all devices; read batches are placed with
    `make_array_from_process_local_data`, so the k-mer all_to_all in
    parallel/sharded_count.py rides ICI between chips and DCN between
    hosts with no code change;
  - graph construction gathers per-shard unique (k+1)-mer tables to
    host 0 (small relative to reads) for the host-side build.

Single-process meshes (tests, one-chip rigs) skip initialization and
everything degrades to the local device list.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..logging_utils import get_logger

log = get_logger()


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Initialize the JAX multi-host runtime when running under a
    launcher.  No-op for single-process runs.

    Resolution order: explicit args > JAX_COORDINATOR_ADDRESS-style env
    (also set by TPU pod launchers) > no-op.
    """
    import jax

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and num_processes is None:
        return
    kw = {}
    if coordinator:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = num_processes
    if process_id is not None:
        kw["process_id"] = process_id
    jax.distributed.initialize(**kw)
    log.info("distributed: process %d / %d, %d local / %d global devices",
             jax.process_index(), jax.process_count(),
             jax.local_device_count(), jax.device_count())


def shard_files_for_process(files: Sequence[str]) -> List[str]:
    """Static round-robin assignment of input files to this host."""
    import jax

    pid = jax.process_index()
    n = jax.process_count()
    return [f for i, f in enumerate(files) if i % n == pid]


def global_read_batch(bases: np.ndarray, lengths: np.ndarray, mesh):
    """Assemble a global device array from per-process local read
    batches (reads data-parallel over all devices of all hosts)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = mesh.axis_names[0]
    sh2 = NamedSharding(mesh, P(axis, None))
    sh1 = NamedSharding(mesh, P(axis))
    gb = jax.make_array_from_process_local_data(sh2, bases)
    gl = jax.make_array_from_process_local_data(sh1, lengths)
    return gb, gl
