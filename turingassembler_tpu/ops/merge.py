"""Device merge of sorted multi-limb runs — the LSM counting engine.

XLA's TPU sort is a comparator network whose cost explodes past ~1M
rows, so the counter never sorts more than one batch-tile at a time.
Larger sorted runs are produced by *merging*: for two sorted arrays A,B
the merged position of A[i] is i + rank(A[i] in B), computed with a
vectorized binary search (pure gathers) and materialized with one
scatter — O(n log m) gather traffic, no comparator network, compiles in
seconds at any size.  Runs carry counts; after interleaving, equal keys
(at most one per side) are collapsed by a run-length pass.

This mirrors the reference's external-memory posture (KMC's k-way disk
merge, src/sort_read.c:149-210) but keeps everything in HBM.

Sentinel convention: padded rows are all-0xFFFFFFFF and sort after every
real key; `n_valid` scalars track logical sizes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SENTINEL = np.uint32(0xFFFFFFFF)


def _lex_lt_rows(a, b):
    lt = jnp.zeros(a.shape[:-1], bool)
    eq = jnp.ones(a.shape[:-1], bool)
    for l in range(a.shape[-1]):
        lt = lt | (eq & (a[..., l] < b[..., l]))
        eq = eq & (a[..., l] == b[..., l])
    return lt


def rank_in(table, queries, side: str):
    """Vectorized multi-limb binary search: number of rows of `table`
    that are < query (side='left') or <= query (side='right')."""
    table = jnp.asarray(table)
    queries = jnp.asarray(queries)
    M = table.shape[0]
    Q = queries.shape[0]
    lo = jnp.zeros(Q, jnp.int32)
    hi = jnp.full(Q, M, jnp.int32)
    n_iter = max(1, int(np.ceil(np.log2(max(M, 2)))) + 1)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        row = table[jnp.clip(mid, 0, M - 1)]
        if side == "left":
            go_right = _lex_lt_rows(row, queries)          # table[mid] < q
        else:
            go_right = ~_lex_lt_rows(queries, row)         # table[mid] <= q
        active = lo < hi  # once converged, the clipped gather must not move lo
        lo = jnp.where(active & go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    return lo


@jax.jit
def merge_runs(a, ca, b, cb):
    """Merge sorted (keys, counts) runs; sentinels stay at the tail.

    a: (n, nl) uint32 sorted (sentinel-padded), ca: (n,) int — counts
    b: (m, nl), cb: (m,)
    Returns (keys (n+m, nl), counts (n+m,), n_unique ()) where equal
    keys are collapsed with counts summed, tail sentinel-padded.
    """
    n, nl = a.shape
    m = b.shape[0]
    total = n + m
    posA = jnp.arange(n, dtype=jnp.int32) + rank_in(b, a, "left")
    posB = jnp.arange(m, dtype=jnp.int32) + rank_in(a, b, "right")
    keys = jnp.full((total, nl), SENTINEL, jnp.uint32)
    counts = jnp.zeros((total,), ca.dtype)
    keys = keys.at[posA].set(a)
    keys = keys.at[posB].set(b)
    counts = counts.at[posA].set(ca)
    counts = counts.at[posB].set(cb)

    # collapse adjacent equal keys (one per side at most)
    valid = jnp.any(keys != SENTINEL, axis=-1)
    neq = jnp.any(keys[1:] != keys[:-1], axis=-1)
    starts = jnp.concatenate([jnp.ones((1,), bool), neq]) & valid
    seg = jnp.maximum(jnp.cumsum(starts.astype(jnp.int32)) - 1, 0)
    out_counts = jax.ops.segment_sum(counts * valid.astype(counts.dtype),
                                     seg, num_segments=total)
    seg_w = jnp.where(valid, seg, total - 1)
    out_keys = jnp.full((total, nl), SENTINEL, jnp.uint32).at[seg_w].set(
        jnp.where(valid[:, None], keys, SENTINEL))
    n_unique = jnp.where(jnp.any(starts), seg[-1] + 1, 0)
    # re-sentinel the tail (slot total-1 may hold trash from invalid rows)
    idx = jnp.arange(total)
    tailmask = (idx >= n_unique)[:, None]
    out_keys = jnp.where(tailmask, SENTINEL, out_keys)
    out_counts = jnp.where(idx >= n_unique, 0, out_counts)
    return out_keys, out_counts, n_unique


class DeviceCountAccumulator:
    """Log-structured accumulator of sorted unique (k-mer, count) runs.

    add_run() pushes one sorted sentinel-padded run (a batch-tile's
    RLE output); equal-capacity runs are merged eagerly so at most
    log2(#tiles) runs are live.  finalize() merges the rest and
    returns host numpy (keys, counts) trimmed to n_unique.
    """

    def __init__(self):
        self.runs = []  # list[(keys_dev, counts_dev)] capacity == shape[0]

    def add_run(self, keys, counts):
        self.runs.append((keys, counts))
        # merge while the two smallest runs share a capacity
        while len(self.runs) >= 2 and self.runs[-1][0].shape[0] == self.runs[-2][0].shape[0]:
            b_keys, b_counts = self.runs.pop()
            a_keys, a_counts = self.runs.pop()
            k, c, _ = merge_runs(a_keys, a_counts, b_keys, b_counts)
            self.runs.append((k, c))

    def finalize(self):
        if not self.runs:
            return np.zeros((0, 0), np.uint32), np.zeros((0,), np.int64)
        while len(self.runs) >= 2:
            b_keys, b_counts = self.runs.pop()
            a_keys, a_counts = self.runs.pop()
            k, c, _ = merge_runs(a_keys, a_counts, b_keys, b_counts)
            self.runs.append((k, c))
        keys, counts = self.runs[0]
        keys = np.asarray(keys)
        counts = np.asarray(counts)
        valid = np.any(keys != SENTINEL, axis=-1)
        n = int(valid.sum())
        # valid rows are a prefix by construction
        return keys[:n], counts[:n].astype(np.int64)
