"""Batched minimizer extraction, edge index, and read->edge voting.

Scheme mirrors the reference (src/minimizers/minimizers.c):
  - k=17, w=17 (src/attribute.h:20-21), forward strand only (edges come
    in rc pairs, so reverse reads vote for the rc edge — same as
    mm_index_bin_str which never canonicalizes);
  - within each window the (leftmost) minimum-hash k-mer is a
    minimizer (mm_index_bin_str :413-460);
  - the edge database keeps, per minimizer, its first (edge, pos) and
    an occurrence count; only count==1 ("singleton") minimizers vote
    (mm_db_edge_insert :543-558, mm_hits_cmp :630-650);
  - a read's hit counts per edge are tallied; the read maps to the
    argmax edge, discarded as ambiguous when tied (mm_align :710-780).

Vectorization: minimizer selection is w shifted vector ops over the
(B, P) hash matrix; database lookup is a multi-limb binary search; the
per-(read, edge) tally is a tile sort + run-length pass — all device
ops with fixed shapes, no hash tables.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.structs import AsmGraph
from ..ops import limbs as lb
from ..ops import sortops as so

MM_K = 17       # MINIMIZERS_KMER (reference src/attribute.h:21)
MM_W = 17       # MINIMIZERS_WINDOW (reference src/attribute.h:20)
NL = lb.n_limbs(MM_K)  # 2 limbs
MM_CAP = 48     # singleton-lookup slots per read after lane compaction
                # (a 150 bp read has ~2L/(w+1) ~ 16 minimizers; 48 is
                # ~3x headroom — overflow lanes are dropped)
LUT_MIN_BITS = 10
LUT_MAX_BITS = 20


@functools.partial(jax.jit, static_argnames=("k", "w"))
def minimizer_mask(bases, lengths, k: int = MM_K, w: int = MM_W):
    """Minimizer positions of each (forward-strand) sequence.

    bases: (B, L) uint8 codes (>=4 invalid), lengths (B,).
    Returns (kmers (B, P, NL) uint32, hashes (B, P) uint32,
    is_mm (B, P) bool) with P = L - k + 1; is_mm marks positions whose
    k-mer is the leftmost window minimum of at least one complete
    window that lies inside the read.
    """
    B, L = bases.shape
    P = L - k + 1
    from ..ops import kmers as kmod
    km = kmod._pack_windows(bases, k)                      # (B, P, NL)
    valid = kmod.window_validity(bases, lengths, k)        # (B, P)
    h = lb.hash_limbs(km.reshape(B * P, NL)).reshape(B, P)
    h = jnp.where(valid, h, jnp.uint32(0xFFFFFFFF))

    W = L - k - w + 2  # number of windows
    if W <= 0:
        return km, h, jnp.zeros((B, P), bool)
    # stack w shifted views: windows[i] covers positions i..i+w-1
    shifts = [jax.lax.dynamic_slice_in_dim(h, j, W, axis=1) for j in range(w)]
    stack = jnp.stack(shifts, axis=-1)                     # (B, W, w)
    amin = jnp.argmin(stack, axis=-1)                      # leftmost min
    wpos = jnp.arange(W, dtype=jnp.int32)[None, :]
    mmpos = wpos + amin.astype(jnp.int32)                  # (B, W)
    # window must fit inside the read: start + w + k - 1 <= length
    w_ok = (wpos + w + k - 1) <= lengths[:, None]
    is_mm = jnp.zeros((B, P), bool)
    bidx = jnp.broadcast_to(jnp.arange(B)[:, None], mmpos.shape)
    safe_pos = jnp.where(w_ok, mmpos, 0)
    is_mm = is_mm.at[bidx.reshape(-1), safe_pos.reshape(-1)].max(
        w_ok.reshape(-1))
    is_mm = is_mm & valid
    return km, h, is_mm


def build_prefix_lut(keys: np.ndarray):
    """Host-side prefix LUT over the sorted key table: lut[b] = first
    row whose limb-0 top `bits` equal b (the same trick as KMC's
    .kmc_pre prefix LUT, reference src/KMC_reader.c:50-149).  Replaces
    the first `bits` binary-search steps of every device lookup with a
    single gather; the residual per-bucket search is `iters` steps."""
    M = len(keys)
    bits = int(np.clip(int(np.ceil(np.log2(max(M, 2)))) + 2,
                       LUT_MIN_BITS, LUT_MAX_BITS))
    top = (keys[:, 0] >> np.uint32(32 - bits)).astype(np.int64)
    lut = np.searchsorted(
        top, np.arange((1 << bits) + 1, dtype=np.int64),
        side="left").astype(np.int32)
    bucket_max = int((lut[1:] - lut[:-1]).max()) if M else 0
    iters = int(np.ceil(np.log2(bucket_max + 1))) + 1 if bucket_max else 1
    return lut, bits, iters


def _lut_search(table, lut, queries, bits: int, iters: int):
    """Two-level table lookup: prefix-LUT gather + short binary search
    inside the bucket.  Returns (idx (Q,) int32, found (Q,) bool)."""
    M = table.shape[0]
    b = (queries[:, 0] >> jnp.uint32(32 - bits)).astype(jnp.int32)
    lo = lut[b]
    hi = lut[b + 1]
    for _ in range(iters):
        mid = (lo + hi) // 2
        row = table[jnp.clip(mid, 0, M - 1)]
        lt = so._lex_lt_rows(row, queries)
        active = lo < hi
        lo = jnp.where(active & lt, mid + 1, lo)
        hi = jnp.where(active & ~lt, mid, hi)
    idx = jnp.clip(lo, 0, M - 1)
    found = jnp.all(table[idx] == queries, axis=-1)
    return idx, found


@dataclass
class EdgeMinimizerIndex:
    """Sorted minimizer table over all live edges of a graph."""
    keys: np.ndarray        # (M, NL) uint32 sorted unique minimizer k-mers
    edge: np.ndarray        # (M,) int32 first edge containing the key
    pos: np.ndarray         # (M,) int32 position on that edge
    count: np.ndarray       # (M,) int32 total occurrences
    k: int = MM_K
    w: int = MM_W
    _lut: Optional[np.ndarray] = None
    _lut_bits: int = 0
    _lut_iters: int = 0
    _padded: Optional[tuple] = None

    @property
    def singleton(self) -> np.ndarray:
        return self.count == 1

    def lookup_tables(self):
        """(lut, bits, iters) for _lut_search, built lazily and cached."""
        if self._lut is None:
            self._lut, self._lut_bits, self._lut_iters = \
                build_prefix_lut(self.keys)
        return self._lut, self._lut_bits, self._lut_iters

    def padded_tables(self):
        """(keys, edge, pos, count, lut, bits, iters) with the table
        rows padded to a pow2 bucket: every distinct device shape pays a
        multi-second program load over the remote-TPU tunnel, and local
        assembly builds one index per gap.  The lut spans only the real
        rows, so sentinel pad rows (count 0) are never probed."""
        if self._padded is None:
            lut, bits, iters = self.lookup_tables()
            M = len(self.keys)
            Mp = 1 << max(int(max(M, 2) - 1).bit_length(), 10)
            keys = np.concatenate([
                self.keys,
                np.full((Mp - M, self.keys.shape[1]), 0xFFFFFFFF,
                        np.uint32)])
            pad1 = lambda a: np.concatenate(
                [a, np.zeros(Mp - M, a.dtype)])
            self._padded = (np.ascontiguousarray(keys), pad1(self.edge),
                            pad1(self.pos), pad1(self.count), lut, bits,
                            iters)
        return self._padded

    @classmethod
    def build(cls, g: AsmGraph, k: int = MM_K, w: int = MM_W,
              batch_bp: int = 2_000_000) -> "EdgeMinimizerIndex":
        """Index every live edge (reference mm_index_edges :605-621).

        Edges are packed into padded batches by length bucket to bound
        recompilation; per-edge minimizers stream into one host table
        that is then sorted + run-length encoded.
        """
        lens = g.edge_len()
        live = [int(e) for e in np.flatnonzero(g.alive_mask())
                if lens[e] >= k + w - 1]
        all_rows = []
        # bucket edges by padded length (powers of two)
        by_bucket = {}
        for e in live:
            L = int(lens[e])
            b = 1 << max(8, int(np.ceil(np.log2(L + 1))))
            by_bucket.setdefault(b, []).append(e)
        for Lpad, edges in sorted(by_bucket.items()):
            bs = max(1, batch_bp // Lpad)
            for i in range(0, len(edges), bs):
                chunk = edges[i : i + bs]
                mat = np.full((len(chunk), Lpad), 255, np.uint8)
                elen = np.zeros(len(chunk), np.int32)
                for j, e in enumerate(chunk):
                    s = g.get_seq(e)
                    mat[j, : len(s)] = s
                    elen[j] = len(s)
                km, h, is_mm = minimizer_mask(mat, elen, k, w)
                km = np.asarray(km)
                is_mm = np.asarray(is_mm)
                jj, pp = np.nonzero(is_mm)
                if len(jj) == 0:
                    continue
                rows = np.empty((len(jj), NL + 2), np.uint32)
                rows[:, :NL] = km[jj, pp]
                rows[:, NL] = np.asarray(chunk, np.uint32)[jj]
                rows[:, NL + 1] = pp
                all_rows.append(rows)
        if not all_rows:
            z = np.zeros((0, NL), np.uint32)
            return cls(z, np.zeros(0, np.int32), np.zeros(0, np.int32),
                       np.zeros(0, np.int32), k, w)
        rows = np.concatenate(all_rows)
        order = lb.np_lexsort_rows(rows[:, :NL])
        rows = rows[order]
        starts = np.ones(len(rows), bool)
        starts[1:] = np.any(rows[1:, :NL] != rows[:-1, :NL], axis=1)
        idx = np.flatnonzero(starts)
        counts = np.diff(np.append(idx, len(rows))).astype(np.int32)
        return cls(
            keys=np.ascontiguousarray(rows[idx, :NL]),
            edge=rows[idx, NL].astype(np.int32),
            pos=rows[idx, NL + 1].astype(np.int32),
            count=counts, k=k, w=w)


@functools.partial(jax.jit, static_argnames=("k", "w"))
def _map_batch_sort(bases, lengths, keys, edge, pos, count, k: int, w: int):
    """Sort-based tally (original formulation; kept as the oracle for
    the sortless path below — lax.sort at B*P rows is the slowest
    primitive on this platform)."""
    B, L = bases.shape
    km, h, is_mm = minimizer_mask(bases, lengths, k, w)
    P = km.shape[1]
    flat = km.reshape(B * P, NL)
    idx, found = so.searchsorted_limbs(keys, flat)
    found = found & is_mm.reshape(-1)
    hit_sing = found & (count[idx] == 1)
    hit_edge = jnp.where(hit_sing, edge[idx], jnp.int32(-1))
    hit_pos = pos[idx]

    # tally per (read, edge): sort (read, edge) pairs and run-length
    read_id = jnp.repeat(jnp.arange(B, dtype=jnp.int32), P)
    key_r = jnp.where(hit_sing, read_id, jnp.int32(B))        # invalid -> end
    key_e = jnp.where(hit_sing, hit_edge, jnp.int32(0x7FFFFFFF))
    p_read = jnp.tile(jnp.arange(P, dtype=jnp.int32), (B,))
    start_est = jnp.maximum(hit_pos - p_read, 0)
    sk_r, sk_e, s_start = jax.lax.sort(
        (key_r, key_e, start_est), dimension=0, num_keys=2, is_stable=False)
    newrun = jnp.concatenate([
        jnp.ones((1,), bool),
        (sk_r[1:] != sk_r[:-1]) | (sk_e[1:] != sk_e[:-1])])
    seg = jnp.cumsum(newrun.astype(jnp.int32)) - 1
    n = B * P
    run_cnt = jax.ops.segment_sum((sk_r < B).astype(jnp.int32), seg,
                                  num_segments=n)
    run_read = jnp.zeros((n,), jnp.int32).at[seg].set(sk_r)
    run_edge = jnp.zeros((n,), jnp.int32).at[seg].set(sk_e)
    run_start = jnp.full((n,), jnp.int32(1 << 30)).at[seg].min(s_start)

    # per read: max count, tie detection
    valid_run = run_cnt > 0
    r = jnp.where(valid_run, run_read, B)
    best = jnp.zeros((B + 1,), jnp.int32).at[r].max(run_cnt)
    n_best = jax.ops.segment_sum(
        (valid_run & (run_cnt == best[r])).astype(jnp.int32), r,
        num_segments=B + 1)
    is_best = valid_run & (run_cnt == best[r]) & (n_best[r] == 1)
    best_edge = jnp.full((B + 1,), jnp.int32(-1)).at[r].max(
        jnp.where(is_best, run_edge, -1))
    best_start = jnp.full((B + 1,), jnp.int32(1 << 30)).at[r].min(
        jnp.where(is_best, run_start, 1 << 30))
    # confidence gate (reference RATIO_OF_CONFIDENT=0.85,
    # MIN_NUMBER_SINGLETON=2, src/minimizers/smart_load.c:193): reject
    # when the best edge holds < 85% of the read's singleton hits and
    # the read has > 2 of them
    tot = jax.ops.segment_sum(run_cnt, r, num_segments=B + 1)[:B]
    conf = (best[:B] * 100 >= 85 * tot) | (tot <= 2)
    be = jnp.where(conf, best_edge[:B], -1)
    return (be, best[:B], jnp.where(be >= 0, best_start[:B], -1))


def _fmix32(x):
    x ^= x >> jnp.uint32(16)
    x *= jnp.uint32(0x85EBCA6B)
    x ^= x >> jnp.uint32(13)
    x *= jnp.uint32(0xC2B2AE35)
    x ^= x >> jnp.uint32(16)
    return x


@functools.partial(jax.jit, static_argnames=("k", "w", "bits", "iters"))
def _map_batch(bases, lengths, keys, edge, pos, count, lut,
               k: int, w: int, bits: int, iters: int):
    """Per-read best-edge vote.  Returns (best_edge (B,) int32 [-1 if
    unmapped/ambiguous], best_hits (B,) int32, est_start (B,) int32).

    Three HBM-traffic optimizations over the naive all-lanes lookup
    (random access is the platform bottleneck, ~60M idx/s):
      1. lane compaction — only the ~16 minimizer positions of each
         read (not all L-k+1 window lanes) are looked up, via a per-read
         rank scatter into MM_CAP slots;
      2. two-level lookup — prefix-LUT gather + ~3-step in-bucket
         binary search instead of the 20-step full binary search;
      3. per-row tally — the (read, edge) vote tally sorts each read's
         MM_CAP lanes along the row axis ((B, 48) sort, trivial) and
         run-lengths in registers — no scatter table at all."""
    B, L = bases.shape
    km, h, is_mm = minimizer_mask(bases, lengths, k, w)
    P = km.shape[1]

    # 1. compact minimizer lanes: slot r of read b = b*MM_CAP + rank
    rank = jnp.cumsum(is_mm.astype(jnp.int32), axis=1) - 1
    keep = is_mm & (rank < MM_CAP)
    Bc = B * MM_CAP
    dflat = jnp.where(
        keep, jnp.arange(B, dtype=jnp.int32)[:, None] * MM_CAP + rank,
        Bc).reshape(-1)
    ck = jnp.full((Bc, NL), 0xFFFFFFFF, jnp.uint32).at[dflat].set(
        km.reshape(-1, NL), mode="drop", unique_indices=True)
    cp = jnp.zeros((Bc,), jnp.int32).at[dflat].set(
        jnp.broadcast_to(jnp.arange(P, dtype=jnp.int32)[None, :],
                         (B, P)).reshape(-1),
        mode="drop", unique_indices=True)
    cvalid = jnp.zeros((Bc,), bool).at[dflat].set(
        jnp.ones((B * P,), bool), mode="drop", unique_indices=True)

    # 2. lookup
    idx, found = _lut_search(keys, lut, ck, bits, iters)
    sing = found & cvalid & (count[idx] == 1)
    SENT = jnp.int32(0x7FFFFFFF)
    ce = jnp.where(sing, edge[idx], SENT).reshape(B, MM_CAP)
    cs = jnp.maximum(pos[idx] - cp, 0)
    cs = jnp.where(sing, cs, jnp.int32(1 << 30)).reshape(B, MM_CAP)

    # 3. per-row tally: sort each row by edge, run-length in lanes
    se, ss = jax.lax.sort((ce, cs), dimension=1, num_keys=1,
                          is_stable=False)
    jjj = jnp.broadcast_to(jnp.arange(MM_CAP, dtype=jnp.int32)[None, :],
                           (B, MM_CAP))
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), se[:, :-1]], axis=1)
    newrun = se != prev
    run_start = jax.lax.cummax(jnp.where(newrun, jjj, -1), axis=1)
    cnt = jjj - run_start + 1
    nxt = jnp.concatenate(
        [se[:, 1:], jnp.full((B, 1), -2, jnp.int32)], axis=1)
    is_end = se != nxt
    validrun = se != SENT
    runlen = jnp.where(is_end & validrun, cnt, 0)
    best = jnp.max(runlen, axis=1)
    n_best = jnp.sum((runlen == best[:, None]) & (runlen > 0), axis=1)
    # run-min of est_start: segmented doubling min within each run
    m = ss
    off = 1
    while off < MM_CAP:
        shifted = jnp.concatenate(
            [jnp.full((B, off), 1 << 30, jnp.int32), m[:, :-off]], axis=1)
        m = jnp.where(jjj - off >= run_start, jnp.minimum(m, shifted), m)
        off <<= 1
    pickmask = is_end & validrun & (runlen == best[:, None]) & \
        (n_best == 1)[:, None] & (best > 0)[:, None]
    best_edge = jnp.max(jnp.where(pickmask, se, -1), axis=1)
    best_start = jnp.min(jnp.where(pickmask, m, 1 << 30), axis=1)
    # confidence gate (RATIO_OF_CONFIDENT=0.85, MIN_NUMBER_SINGLETON=2,
    # reference src/minimizers/smart_load.c:193): same as the sort oracle
    tot = jnp.sum(validrun.astype(jnp.int32), axis=1)
    conf = (best * 100 >= 85 * tot) | (tot <= 2)
    be = jnp.where(conf, best_edge, -1)
    return (be, best, jnp.where(be >= 0, best_start, -1))


RESCORE_PAD = 16   # target-window slack around the voted start


def rescore_hits(seq_data: np.ndarray, seq_off: np.ndarray,
                 edges: np.ndarray, starts: np.ndarray,
                 bases: np.ndarray, lengths: np.ndarray,
                 scoring=None, min_score=None,
                 pad: int = RESCORE_PAD):
    """Verify voted hits with the framework's single alignment DP.

    The reference rescores every BWA hit with a banded global DP before
    trusting it (asm_reg2aln -> ksw_global2, src/barcode_builder.c:
    448-563) and drops reads whose best score is under 50
    (src/barcode_builder.c:790).  Here: the target is the hit edge's
    window [start-pad, start+qlen+pad) clipped to the edge (a hit
    hanging off the edge end gets a short window and the global DP
    penalizes the overhang — the analogue of asm_reg2aln's >=10-base
    clip rejection); score via ops/dp.py with BWA scoring.

    min_score may be a scalar or an (N,) per-lane threshold (the bridge
    path scorer thresholds at read_len - slack).  Acceptance is exact
    either way: a lane whose GAPLESS alignment at the voted offset
    already clears its threshold is accepted without running the DP
    (a gapless alignment is feasible, so its score lower-bounds the DP
    optimum); every other lane gets the full banded DP.  On clean
    libraries the fast path resolves nearly every read, which removes
    the DP from the aux-info/extension wall clock (the DP was ~75% of
    mapping cost on the CPU backend).

    Returns (accept (N,) bool, scores (N,) int32); unmapped lanes are
    False/0.  Fast-path lanes report the gapless lower bound (>= their
    threshold), DP lanes the exact score — every call site thresholds
    at min_score, so the mix is observationally equivalent.
    """
    from ..ops import dp
    if scoring is None:
        scoring = dp.SCORING_BWA
    if min_score is None:
        min_score = dp.MIN_MAP_SCORE
    N, Lq = bases.shape
    accept = np.zeros(N, bool)
    scores = np.zeros(N, np.int32)
    mapped = np.flatnonzero(edges >= 0)
    if len(mapped) == 0:
        return accept, scores
    thr = (np.broadcast_to(np.asarray(min_score), (N,))[mapped]
           if np.ndim(min_score) else
           np.full(len(mapped), min_score))
    e = edges[mapped].astype(np.int64)
    qlen = lengths[mapped].astype(np.int64)
    elen = (seq_off[e + 1] - seq_off[e]).astype(np.int64)
    s0 = np.clip(starts[mapped].astype(np.int64), 0, np.maximum(elen - 1, 0))
    w0 = np.maximum(s0 - pad, 0)
    w1 = np.minimum(s0 + qlen + pad, elen)
    Lt = Lq + 2 * pad
    idx = (seq_off[e] + w0)[:, None] + np.arange(Lt)[None, :]
    inwin = np.arange(Lt)[None, :] < (w1 - w0)[:, None]
    t = np.where(inwin, seq_data[np.minimum(idx, len(seq_data) - 1)],
                 np.uint8(255))
    qm = bases[mapped]

    # gapless fast path at the voted offset d0 = s0 - w0 (feasible when
    # the query fits the window with no indels)
    mt, mm = int(scoring[0]), int(scoring[1])
    d0 = s0 - w0
    feas = (d0 + qlen) <= (w1 - w0)
    gidx = np.minimum(d0[:, None] + np.arange(Lq)[None, :], Lt - 1)
    tsh = np.take_along_axis(t, gidx, axis=1)
    live = np.arange(Lq)[None, :] < qlen[:, None]
    nmatch = ((qm == tsh) & live).sum(axis=1)
    bound = (nmatch * mt + (qlen - nmatch) * mm).astype(np.int64)
    fast = feas & (bound >= thr)
    scores[mapped[fast]] = bound[fast].astype(np.int32)
    accept[mapped[fast]] = True

    rest = np.flatnonzero(~fast)
    if len(rest) == 0:
        return accept, scores
    # full DP on the remainder; pad the lane count to a power-of-two
    # bucket (static compile shapes)
    B = dp.pad_pow2(len(rest), lo=256)
    q = np.full((B, Lq), 255, np.uint8)
    q[: len(rest)] = qm[rest]
    tb = np.full((B, Lt), 255, np.uint8)
    tb[: len(rest)] = t[rest]
    ql = np.zeros(B, np.int32)
    ql[: len(rest)] = qlen[rest]
    tl = np.zeros(B, np.int32)
    tl[: len(rest)] = (w1 - w0)[rest]
    sc = dp.affine_scores(q, ql, tb, tl, scoring, band=128, mode="fit")
    mr = mapped[rest]
    scores[mr] = sc[: len(rest)]
    accept[mr] = scores[mr] >= thr[rest]
    return accept, scores


def map_reads(index: EdgeMinimizerIndex, bases: np.ndarray,
              lengths: np.ndarray, batch_size: int = 8192,
              graph=None, min_score=None, mesh=None):
    """Map a read matrix; returns (edge (N,) int32 [-1 unmapped],
    n_hits (N,), est_start (N,)).

    graph: when given (anything with seq_data + seq_off pools), every
    voted hit is DP-verified with rescore_hits and rejects are demoted
    to unmapped — the production aux-info/bridge configuration.

    mesh: when given (a multi-device jax Mesh), the vote loop runs
    read-data-parallel over the mesh (parallel/sharded_map.py,
    bit-equal to the single-device kernel)."""
    N = len(bases)
    edges = np.full(N, -1, np.int32)
    hits = np.zeros(N, np.int32)
    starts = np.full(N, -1, np.int32)
    if len(index.keys) == 0:
        return edges, hits, starts
    if mesh is not None and int(mesh.devices.size) > 1:
        from ..parallel.sharded_map import map_reads_sharded
        edges, hits, starts = map_reads_sharded(
            index, bases, lengths, mesh, batch_size=batch_size)
    else:
        keys_np, edge_np, pos_np, count_np, lut_np, bits, iters = \
            index.padded_tables()
        keys = jnp.asarray(keys_np)
        edge = jnp.asarray(edge_np)
        pos = jnp.asarray(pos_np)
        count = jnp.asarray(count_np)
        lut = jnp.asarray(lut_np)
        # dispatch every batch before fetching any result: jax dispatch
        # is async, so the device pipelines batches back-to-back while
        # the host only pays one sync at the end (the per-batch fetch
        # round-trip is ~100 ms on this rig's tunnel)
        pending = []
        for i in range(0, N, batch_size):
            rb = bases[i : i + batch_size]
            lb_ = lengths[i : i + batch_size]
            if len(rb) < batch_size:
                pad = batch_size - len(rb)
                rb = np.concatenate(
                    [rb, np.full((pad, rb.shape[1]), 255, np.uint8)])
                lb_ = np.concatenate([lb_, np.zeros(pad, np.int32)])
            pending.append((i, _map_batch(rb, lb_, keys, edge, pos, count,
                                          lut, index.k, index.w, bits,
                                          iters)))
        for i, (be, bh, bs) in pending:
            m = min(batch_size, N - i)
            edges[i : i + m] = np.asarray(be)[:m]
            hits[i : i + m] = np.asarray(bh)[:m]
            starts[i : i + m] = np.asarray(bs)[:m]
    if graph is not None:
        accept, _ = rescore_hits(graph.seq_data, graph.seq_off, edges,
                                 starts, bases, lengths,
                                 min_score=min_score)
        edges = np.where(accept, edges, -1)
        starts = np.where(accept, starts, -1)
    return edges, hits, starts
