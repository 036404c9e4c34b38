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

from ..graph.structs import AsmGraph
from ..ops import limbs as lb

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


def _rows_to_u64(limbs: np.ndarray) -> np.ndarray:
    """(N, 2) uint32 lexicographic rows -> (N,) uint64 preserving order."""
    assert limbs.shape[1] == 2
    return (limbs[:, 0].astype(np.uint64) << np.uint64(32)) | \
        limbs[:, 1].astype(np.uint64)


def count_reads_into_table(table: np.ndarray, reads: np.ndarray,
                           lengths: np.ndarray, k: int = KMER_SIZE_COVERAGE,
                           batch_size: int = 8192) -> np.ndarray:
    """Per-table-entry read-window counts (fw + rc strands).

    A table key's fw+rc window hit count equals the CANONICAL k-mer
    count of canon(key) — the forward and reverse window multisets of a
    read are mutually RC — so the fast count engine (kmer/count.py; the
    megasort path on TPU) does the streaming, and the table join is ONE
    host searchsorted over the unique keys.  The previous formulation
    ran a 20-step device binary search on every window lane (~90M lanes
    x 2 strands on a 500 kb job) and dominated the extend stage."""
    M = len(table)
    counts = np.zeros(M, np.int64)
    if M == 0 or len(reads) == 0:
        return counts
    from .count import count_kedges_from_reads
    # the count engines count (k+1)-mers of their `k` argument
    uniq, ucnt = count_kedges_from_reads(
        reads, np.ascontiguousarray(lengths, np.int32), k - 1,
        batch_size=batch_size)
    return _join_canonical(table, uniq, ucnt, k)


def recount_coverage_from_batches(g: AsmGraph, batches,
                                  k: int = KMER_SIZE_COVERAGE) -> AsmGraph:
    """Streaming recount: same as recount_coverage but over a
    (bases, lengths) batch iterable — the library never materializes in
    RAM (out-of-core posture, SURVEY.md §5.7)."""
    from .count import count_kedges_from_batches
    table, edge_rows = build_edge_kmer_table(g, k)
    counts = np.zeros(len(table), np.int64)
    if len(table):
        uniq, ucnt = count_kedges_from_batches(batches, k - 1)
        counts = _join_canonical(table, uniq, ucnt, k)
    return _apply_counts(g, table, edge_rows, counts)


def recount_coverage(g: AsmGraph, reads: np.ndarray, lengths: np.ndarray,
                     k: int = KMER_SIZE_COVERAGE) -> AsmGraph:
    """Replace edge counts with the k=31 recount (reference
    build_coverage_process, process.c:823-834)."""
    table, edge_rows = build_edge_kmer_table(g, k)
    counts = count_reads_into_table(table, reads, lengths, k)
    return _apply_counts(g, table, edge_rows, counts)


def _join_canonical(table: np.ndarray, uniq: np.ndarray, ucnt: np.ndarray,
                    k: int) -> np.ndarray:
    """Per-table-entry counts from a canonical unique-count run (see
    count_reads_into_table for why the equivalence is exact)."""
    counts = np.zeros(len(table), np.int64)
    if len(uniq) == 0:
        return counts
    rc = lb.np_revcomp_limbs_fast(np.ascontiguousarray(table), k)
    canon = np.where(lb.np_lex_lt(rc, table)[:, None], rc, table)
    u64 = _rows_to_u64(uniq)
    q64 = _rows_to_u64(canon)
    pos = np.searchsorted(u64, q64)
    posc = np.minimum(pos, len(u64) - 1)
    found = u64[posc] == q64
    counts[found] = ucnt[posc[found]]
    return counts


def _apply_counts(g: AsmGraph, table, edge_rows, counts) -> AsmGraph:
    clamped = np.minimum(counts, MAX_KMER_COUNT)
    new_counts = np.zeros(g.n_e, np.int64)
    if len(edge_rows):
        np.add.at(new_counts, edge_rows[:, 1], clamped[edge_rows[:, 0]])
    # symmetrize (reference add_cnt_to_graph tail)
    rc = g.edge_rc.copy()
    ok = rc >= 0
    sym = new_counts.copy()
    sym[ok] = np.maximum(new_counts[ok], new_counts[rc[ok]])
    g.edge_count = sym
    return g
