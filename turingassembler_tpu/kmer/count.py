"""Streaming canonical (k+1)-mer counting.

Replaces the external KMC counter (reference include/kmc_skipping.h:8-11,
invoked from src/kmer_build.c:726-737) and the striped-lock kmhash
(src/kmhash.c).  Per device batch: window-extract + canonicalize + sort +
run-length encode entirely on device; per-batch sorted unique runs are
merged on host (the analogue of the reference's external k-way merge,
src/sort_read.c:149-210).  Multi-chip sharding lives in
parallel/sharded_count.py.
"""

from __future__ import annotations

from typing import Iterable, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kmers as km
from ..ops import sortops as so


def _device_batch_count(bases: np.ndarray, lengths: np.ndarray, k1: int):
    """One batch on device: canonical k1-mers -> sorted unique + counts."""
    canon, _, valid = km.extract_canonical_kmers(bases, lengths, k1)
    flat = canon.reshape(-1, canon.shape[-1])
    vflat = valid.reshape(-1)
    uniq, counts, n_unique = so.sort_unique_count(flat, vflat)
    return uniq, counts, n_unique


def count_kedges_from_batches(
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    k: int,
    min_count: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Count canonical (k+1)-mers over an iterable of (bases, lengths)
    batches.  Returns (kedges (n, nl) uint32 sorted unique, counts (n,)
    int64), filtered to count >= min_count."""
    k1 = k + 1
    runs = []
    for bases, lengths in batches:
        uniq, counts, n_unique = _device_batch_count(
            np.ascontiguousarray(bases), np.ascontiguousarray(lengths), k1)
        n = int(n_unique)
        runs.append((np.asarray(uniq[:n]), np.asarray(counts[:n], np.int64)))
    kedges, counts = so.np_merge_count_runs(runs)
    if min_count > 1 and len(counts):
        keep = counts >= min_count
        kedges, counts = kedges[keep], counts[keep]
    return kedges, counts


def count_kedges_from_reads(
    reads: np.ndarray, lengths: np.ndarray, k: int,
    batch_size: int = 65536, min_count: int = 1,
) -> Tuple[np.ndarray, np.ndarray]:
    """Convenience wrapper: chunk a read matrix into batches and count."""
    def gen():
        for i in range(0, len(reads), batch_size):
            yield reads[i : i + batch_size], lengths[i : i + batch_size]
    return count_kedges_from_batches(gen(), k, min_count=min_count)
