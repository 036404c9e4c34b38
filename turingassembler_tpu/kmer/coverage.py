"""Edge-coverage recount at k=31 — rebuild of src/coverage/kmer_count.c.

Semantics mirrored: a table over the distinct *forward* 31-mers of all
edges (index_bin_edge :68-85 — no canonicalization; reads contribute
both their forward and reverse-complement k-mers, get_and_add_kmer
:87-110); each edge's new count is the sum over its k-mer occurrences of
min(count, 999) (MAX_KMER_COUNT, add_cnt_to_graph :113-137), then
symmetrized with max(e, rc).

TPU formulation: sorted unique k-mer table + binary search, scatter-add
for read streaming, segment-sum per edge — no hash table, no atomics.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..graph.structs import AsmGraph
from ..ops import kmers as km
from ..ops import limbs as lb
from ..ops import sortops as so

KMER_SIZE_COVERAGE = 31   # reference kmer_count.c:14
MAX_KMER_COUNT = 999      # :15


def build_edge_kmer_table(g: AsmGraph, k: int = KMER_SIZE_COVERAGE):
    """Returns (table (M, nl) sorted unique fw k-mers, edge_rows
    (R, 2) = (table_idx, edge_id) occurrence list)."""
    rows = []
    occ = []
    for e in range(g.n_e):
        if g.edge_source[e] < 0 or g.edge_len(e) < k + 1:
            continue
        seq = g.get_seq(e)
        n = len(seq) - k + 1
        if n <= 0:
            continue
        packed = lb.np_pack_bases(
            np.lib.stride_tricks.sliding_window_view(seq, k), k)
        rows.append(packed)
        occ.append(np.full(n, e, np.int64))
    if not rows:
        nl = lb.n_limbs(k)
        return np.zeros((0, nl), np.uint32), np.zeros((0, 2), np.int64)
    allk = np.concatenate(rows)
    alle = np.concatenate(occ)
    order = lb.np_lexsort_rows(allk)
    allk, alle = allk[order], alle[order]
    starts = np.ones(len(allk), bool)
    starts[1:] = np.any(allk[1:] != allk[:-1], axis=1)
    table = allk[starts]
    tidx = np.cumsum(starts) - 1
    edge_rows = np.stack([tidx, alle], axis=1)
    return np.ascontiguousarray(table), edge_rows


def count_reads_into_table(table: np.ndarray, reads: np.ndarray,
                           lengths: np.ndarray, k: int = KMER_SIZE_COVERAGE,
                           batch_size: int = 8192) -> np.ndarray:
    """Stream reads, accumulating per-table-entry counts (fw + rc)."""
    M = len(table)
    counts = np.zeros(M, np.int64)
    if M == 0:
        return counts
    tab = jnp.asarray(table)

    @jax.jit
    def step(bases, lens, acc):
        fw = km._pack_windows(bases, k)
        valid = km.window_validity(bases, lens, k)
        rc_read = km.complement_bases(bases[:, ::-1])
        rc = km._pack_windows(rc_read, k)[:, ::-1, :]
        rc_valid = valid
        out = acc
        for kmers, v in ((fw, valid), (rc, rc_valid)):
            flat = kmers.reshape(-1, kmers.shape[-1])
            idx, found = so.searchsorted_limbs(tab, flat)
            add = (found & v.reshape(-1)).astype(jnp.int32)
            out = out.at[idx].add(add)
        return out

    acc = jnp.zeros(M, jnp.int32)
    for i in range(0, len(reads), batch_size):
        rb = reads[i : i + batch_size]
        lns = lengths[i : i + batch_size]
        if len(rb) < batch_size:
            pad = batch_size - len(rb)
            rb = np.concatenate([rb, np.full((pad, rb.shape[1]), 255, np.uint8)])
            lns = np.concatenate([lns, np.zeros(pad, np.int32)])
        acc = step(jnp.asarray(rb), jnp.asarray(lns), acc)
    return np.asarray(acc, np.int64)


def recount_coverage(g: AsmGraph, reads: np.ndarray, lengths: np.ndarray,
                     k: int = KMER_SIZE_COVERAGE) -> AsmGraph:
    """Replace edge counts with the k=31 recount (reference
    build_coverage_process, process.c:823-834)."""
    table, edge_rows = build_edge_kmer_table(g, k)
    counts = count_reads_into_table(table, reads, lengths, k)
    clamped = np.minimum(counts, MAX_KMER_COUNT)
    new_counts = np.zeros(g.n_e, np.int64)
    np.add.at(new_counts, edge_rows[:, 1], clamped[edge_rows[:, 0]])
    # symmetrize (reference add_cnt_to_graph tail)
    rc = g.edge_rc.copy()
    ok = rc >= 0
    sym = new_counts.copy()
    sym[ok] = np.maximum(new_counts[ok], new_counts[rc[ok]])
    g.edge_count = sym
    return g
