"""Device sort + segmented reduction — the TPU replacement for hash tables.

Every concurrent hash structure in the reference (kmhash src/kmhash.c,
mini_hash src/minimizers/count_barcodes.c:59-345, radix sort
src/radix_sort.h) becomes: `lax.sort` on multi-limb keys, boundary
detection, and `segment_sum`.  No locks, no CAS — the sort IS the
synchronization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def sort_by_limbs(limbs, *vals):
    """Sort rows of `limbs` (N, nl) lexicographically, carrying `vals`.

    Returns (sorted_limbs, sorted_vals...).  Uses variadic `lax.sort`
    with num_keys = nl — XLA's native multi-key sort.
    """
    nl = limbs.shape[-1]
    operands = tuple(limbs[:, l] for l in range(nl)) + tuple(vals)
    out = jax.lax.sort(operands, dimension=0, num_keys=nl, is_stable=False)
    sorted_limbs = jnp.stack(out[:nl], axis=-1)
    return (sorted_limbs,) + tuple(out[nl:])


def run_starts(sorted_limbs):
    """(N,) bool: True where a new distinct key run begins."""
    neq = jnp.any(sorted_limbs[1:] != sorted_limbs[:-1], axis=-1)
    return jnp.concatenate([jnp.ones((1,), bool), neq])


def unique_counts(sorted_limbs, weights=None, valid=None):
    """Run-length encode sorted keys.

    Returns (unique_limbs (N,nl) padded with the last run repeated,
    counts (N,) zero-padded, n_unique scalar).  Invalid rows (valid ==
    False) must have been sorted to the END (use a sentinel max key) and
    are excluded.  Fixed shapes — jit-safe; callers slice by n_unique on
    host.
    """
    N = sorted_limbs.shape[0]
    if weights is None:
        weights = jnp.ones((N,), jnp.int32)
    if valid is not None:
        weights = jnp.where(valid, weights, 0)
    starts = run_starts(sorted_limbs)
    if valid is not None:
        starts = starts & valid
    seg = jnp.cumsum(starts.astype(jnp.int32)) - 1
    seg = jnp.maximum(seg, 0)
    counts = jax.ops.segment_sum(weights, seg, num_segments=N)
    # invalid rows write to a trash slot (N-1 is beyond n_unique whenever
    # any invalid row exists) so they can't clobber a real run's key
    seg_w = seg if valid is None else jnp.where(valid, seg, N - 1)
    uniq = jnp.zeros_like(sorted_limbs).at[seg_w].set(sorted_limbs)
    n_unique = jnp.where(jnp.any(starts), seg[-1] + 1, 0)
    return uniq, counts, n_unique


@functools.partial(jax.jit, static_argnames=())
def sort_unique_count(limbs_flat, valid_flat):
    """One-shot: sort kmers (with invalids pushed to the end) and RLE.

    limbs_flat: (N, nl) uint32; valid_flat: (N,) bool.
    Invalid keys are replaced by the all-ones sentinel so they sort last.
    Returns (unique (N,nl), counts (N,) int32, n_unique ()).
    """
    sentinel = jnp.where(valid_flat[:, None], limbs_flat, jnp.uint32(0xFFFFFFFF))
    s_limbs, s_valid = sort_by_limbs(sentinel, valid_flat.astype(jnp.int32))
    return unique_counts(s_limbs, weights=s_valid, valid=s_valid.astype(bool))


def searchsorted_limbs(table, queries):
    """Index of each query row in a lexicographically sorted limb table.

    table: (M, nl) sorted unique keys; queries: (Q, nl).
    Returns (idx (Q,) int32, found (Q,) bool).  Replaces kmhash_get
    probing (src/kmhash.c:182-204) with binary search over the sorted
    table — O(log M) random access in HBM, no hash collisions.
    """
    table = jnp.asarray(table)
    queries = jnp.asarray(queries)
    M, nl = table.shape
    lo = jnp.zeros(queries.shape[0], jnp.int32)
    hi = jnp.full(queries.shape[0], M, jnp.int32)
    n_iter = max(1, int(np.ceil(np.log2(max(M, 2)))) + 1)

    def body(_, lohi):
        lo, hi = lohi
        mid = (lo + hi) // 2
        row = table[jnp.clip(mid, 0, M - 1)]  # gather (Q, nl)
        lt = _lex_lt_rows(row, queries)
        active = lo < hi  # converged lanes must not move past M
        lo = jnp.where(active & lt, mid + 1, lo)
        hi = jnp.where(active & ~lt, mid, hi)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, n_iter, body, (lo, hi))
    idx = jnp.clip(lo, 0, M - 1)
    found = jnp.all(table[idx] == queries, axis=-1) & (lo < M)
    return idx, found


def _lex_lt_rows(a, b):
    lt = jnp.zeros(a.shape[:-1], bool)
    eq = jnp.ones(a.shape[:-1], bool)
    for l in range(a.shape[-1]):
        lt = lt | (eq & (a[..., l] < b[..., l]))
        eq = eq & (a[..., l] == b[..., l])
    return lt


# ---------------------------------------------------------------------------
# Host-side merge of per-batch runs (numpy) — external-memory accumulation
# analogous to the reference's spill + k-way merge (src/sort_read.c:149-210),
# but over sorted unique (kmer, count) runs instead of raw reads.
# ---------------------------------------------------------------------------

def np_merge_count_runs(runs):
    """Merge [(limbs (n,nl) uint32, counts (n,))...] -> (limbs, counts) sorted unique."""
    if not runs:
        return np.zeros((0, 0), np.uint32), np.zeros((0,), np.int64)
    limbs = np.concatenate([r[0] for r in runs], axis=0)
    counts = np.concatenate([np.asarray(r[1], np.int64) for r in runs])
    if limbs.shape[0] == 0:
        return limbs, counts
    order = np.lexsort(tuple(limbs[:, l] for l in range(limbs.shape[1] - 1, -1, -1)))
    limbs = limbs[order]
    counts = counts[order]
    starts = np.empty(limbs.shape[0], bool)
    starts[0] = True
    np.any(limbs[1:] != limbs[:-1], axis=1, out=starts[1:])
    idx = np.flatnonzero(starts)
    summed = np.add.reduceat(counts, idx)
    return limbs[idx], summed


def np_external_merge_runs(runs, *, chunk_rows: int = 1 << 22,
                           min_count: int = 1, out_dir=None):
    """Bounded-memory k-way merge of sorted-unique (keys, counts) runs.

    The host analogue of the reference's global k-way spill merge
    (src/sort_read.c:567-658) for COUNT tables: runs may be RAM arrays
    or disk memmaps; the merge proceeds in slices cut at limb0
    boundaries (the lexsort is limb0-major, so `limb0 < pivot`
    partitions every run consistently), touching only ~chunk_rows rows
    per run per slice.  With `out_dir`, output goes to disk memmaps
    (returned as memmap views) so peak RAM stays ~one slice.
    """
    import os as _os
    runs = [r for r in runs if len(r[0])]
    if not runs:
        return np.zeros((0, 0), np.uint32), np.zeros((0,), np.int64)
    if len(runs) == 1 and min_count <= 1 and out_dir is None:
        return np.asarray(runs[0][0]), np.asarray(runs[0][1], np.int64)
    nl = runs[0][0].shape[1]
    total = sum(len(r[0]) for r in runs)

    # pivots from the largest run's limb0 column, deduped
    big = max(runs, key=lambda r: len(r[0]))[0]
    piv_rows = np.arange(chunk_rows, len(big), chunk_rows)
    pivots = np.unique(np.asarray(big[piv_rows, 0])) if len(piv_rows) else \
        np.zeros(0, np.uint32)

    out_k = out_c = None
    if out_dir is not None:
        _os.makedirs(out_dir, exist_ok=True)
        out_k = np.lib.format.open_memmap(
            _os.path.join(out_dir, "merged_keys.npy"), mode="w+",
            dtype=np.uint32, shape=(total, nl))
        out_c = np.lib.format.open_memmap(
            _os.path.join(out_dir, "merged_counts.npy"), mode="w+",
            dtype=np.int64, shape=(total,))
    chunks_k, chunks_c = [], []
    pos = [0] * len(runs)
    n_out = 0
    bounds = list(pivots) + [None]
    for pv in bounds:
        slices = []
        for i, (rk, rc) in enumerate(runs):
            hi = len(rk) if pv is None else \
                int(np.searchsorted(rk[:, 0], pv, side="left"))
            if hi > pos[i]:
                slices.append((np.asarray(rk[pos[i]:hi]),
                               np.asarray(rc[pos[i]:hi], np.int64)))
            pos[i] = hi
        if not slices:
            continue
        mk, mc = np_merge_count_runs(slices)
        if min_count > 1:
            keep = mc >= min_count
            mk, mc = mk[keep], mc[keep]
        if out_k is not None:
            out_k[n_out:n_out + len(mk)] = mk
            out_c[n_out:n_out + len(mk)] = mc
        else:
            chunks_k.append(mk)
            chunks_c.append(mc)
        n_out += len(mk)
    if out_k is not None:
        return out_k[:n_out], out_c[:n_out]
    if not chunks_k:
        return np.zeros((0, nl), np.uint32), np.zeros((0,), np.int64)
    return np.concatenate(chunks_k), np.concatenate(chunks_c)
