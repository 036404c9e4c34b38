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
import os
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
    # scatter-free leftmost-argmin: position p is the leftmost minimum
    # of window i iff every h in [i, p) is strictly greater and every h
    # in (p, i+w) is >=.  With Lrun[p] = capped run of strictly-greater
    # hashes to the left and Rrun[p] = capped run of >= hashes to the
    # right, some complete in-read window elects p iff
    #   max(p - Lrun, 0) <= min(p + Rrun - w + 1, W_len - 1).
    # Runs are built with log2(w) doubling steps of shifted compares —
    # all elementwise, no (B, W, w) stack and no scatter (the scatter
    # was ~0.1 s/32k-read batch, the map stage's largest single op).
    NEG = jnp.uint32(0xFFFFFFFF)
    maxrun = w - 1

    def _runs(hv):
        """(Lrun, Rrun) capped at w-1; left is strict (>), right is >=
        — exactly the leftmost-argmin tie rule.  Unrolled w-1 shifted
        compares (w is 17, so 16 cheap (B, P) elementwise ops)."""
        B_, P_ = hv.shape
        run = jnp.zeros((B_, P_), jnp.int32)
        alive = jnp.ones((B_, P_), bool)
        for d in range(1, maxrun + 1):
            prev = jnp.concatenate(
                [jnp.full((B_, d), NEG, jnp.uint32), hv[:, :P_ - d]], axis=1)
            alive = alive & (prev > hv)
            run = run + alive.astype(jnp.int32)
        lrun = run
        run = jnp.zeros((B_, P_), jnp.int32)
        alive = jnp.ones((B_, P_), bool)
        for d in range(1, maxrun + 1):
            nxt = jnp.concatenate(
                [hv[:, d:], jnp.full((B_, d), NEG, jnp.uint32)], axis=1)
            alive = alive & (nxt >= hv)
            run = run + alive.astype(jnp.int32)
        rrun = run
        return lrun, rrun

    lrun, rrun = _runs(h)
    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    # complete windows inside THIS read: i in [0, W_len), where
    # W_len = length - k - w + 2 (window start + w + k - 1 <= length)
    w_len = lengths[:, None].astype(jnp.int32) - k - w + 2
    lo = jnp.maximum(pos - lrun, 0)
    hi = jnp.minimum(pos + rrun - w + 1, w_len - 1)
    hi = jnp.minimum(hi, pos)            # window must start at or before p
    lo = jnp.maximum(lo, pos - w + 1)    # and cover p
    is_mm = (lo <= hi) & (w_len > 0) & valid
    return km, h, is_mm


# ---------------------------------------------------------------------
# Cuckoo lookup: the voting profile is dominated by the per-lane table
# probes (prefix-LUT + ~4-step binary search + 3 value gathers ~ 9
# random HBM accesses/lane, 119+45 of 300 ms per 65k-read batch).  A
# 4-slot-per-bucket 2-choice cuckoo table resolves a key in at most 2
# bucket-row gathers + 1 value-row gather, with values pre-fused to
# exactly what the vote needs: (edge+1 if singleton else 0, pos).
# Host build and device probe share the same uint32 mixers bit-exactly.
# ---------------------------------------------------------------------
CUCKOO_CAP = 4


def _cuckoo_h(q0, q1, salt, mask, which: int):
    """Bucket hash over both key limbs; `which` selects the table.
    Works identically on numpy and jax uint32 arrays."""
    if which == 0:
        x = (q0 ^ (q1 * np.uint32(0x9E3779B1))) + salt
    else:
        x = (q1 ^ (q0 * np.uint32(0x85EBCA77))) + (
            salt ^ np.uint32(0x5BD1E995))
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> np.uint32(13))
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> np.uint32(16))
    return x & mask


def build_cuckoo_tables(keys: np.ndarray, edge: np.ndarray,
                        pos: np.ndarray, count: np.ndarray):
    """(hkeys (NB, 8) uint32, vals (NB*4, 2) uint32, salt).

    Placement is greedy 2-choice over alternating rounds (load <= 0.5
    at 4 slots/bucket converges in 2-3 rounds); a salt bump and table
    doublings retry the rare pathological layout, and the function
    raises RuntimeError once those retries are exhausted (load 0.03 —
    never observed).  Empty slots hold 0xFFFFFFFF in both limbs — real minimizer
    keys are left-aligned 34-bit packings (ops/limbs.py) whose second
    limb has its low 30 bits zero, so no real key matches a sentinel."""
    M = len(keys)
    if M == 0:
        hkeys = np.full((256, 2 * CUCKOO_CAP), 0xFFFFFFFF, np.uint32)
        return hkeys, np.zeros((256 * CUCKOO_CAP, 2), np.uint32), np.uint32(0)
    k0 = np.ascontiguousarray(keys[:, 0])
    k1 = np.ascontiguousarray(keys[:, 1])
    # start at load ~0.12 (4 slots x 2 choices): greedy kick-free
    # placement succeeds on the first salt with overwhelming odds
    # (load 0.4 failed ~0.1% of keys and burned seconds of retries)
    nb0 = 1 << max(int(np.ceil(np.log2(max(M, 2) * 2))), 8)
    for nb in (nb0, nb0 * 2, nb0 * 4):
        out = _try_build_cuckoo(k0, k1, edge, pos, count, nb)
        if out is not None:
            return out
    raise RuntimeError("cuckoo table build failed at load 0.03")


def _try_build_cuckoo(k0, k1, edge, pos, count, nb: int):
    M = len(k0)
    mask = np.uint32(nb - 1)
    for salt_i in range(4):
        salt = np.uint32((0xA5A5A5A5 + 0x9E3779B9 * salt_i) & 0xFFFFFFFF)
        h1 = _cuckoo_h(k0, k1, salt, mask, 0).astype(np.int64)
        h2 = _cuckoo_h(k0, k1, salt, mask, 1).astype(np.int64)
        fill = np.zeros(nb, np.int64)
        bucket = np.full(M, -1, np.int64)
        slot = np.full(M, -1, np.int64)
        un = np.arange(M)
        for r in range(12):
            if len(un) == 0:
                break
            cand = (h1 if r % 2 == 0 else h2)[un]
            order = np.argsort(cand, kind="stable")
            cs = cand[order]
            newg = np.concatenate([[True], cs[1:] != cs[:-1]])
            gstart_per = np.maximum.accumulate(
                np.where(newg, np.arange(len(cs)), 0))
            rank = np.arange(len(cs)) - gstart_per
            ok = rank < (CUCKOO_CAP - fill[cs])
            pidx = un[order[ok]]
            bucket[pidx] = cs[ok]
            slot[pidx] = fill[cs[ok]] + rank[ok]
            np.add.at(fill, cs[ok], 1)
            un = un[order[~ok]]
        if len(un) == 0:
            hkeys = np.full((nb, 2 * CUCKOO_CAP), 0xFFFFFFFF, np.uint32)
            hkeys[bucket, 2 * slot] = k0
            hkeys[bucket, 2 * slot + 1] = k1
            vals = np.zeros((nb * CUCKOO_CAP, 2), np.uint32)
            fidx = bucket * CUCKOO_CAP + slot
            vals[fidx, 0] = np.where(count == 1, edge + 1, 0).astype(
                np.uint32)
            vals[fidx, 1] = pos.astype(np.uint32)
            return hkeys, vals, salt
    return None


def _cuckoo_probe(hkeys, vals, salt, queries):
    """Device probe: returns (edge_sing (Q,) int32 [-1 when the key is
    absent or non-singleton], pos (Q,) int32, found (Q,) bool)."""
    nb = hkeys.shape[0]
    mask = np.uint32(nb - 1)
    q0, q1 = queries[:, 0], queries[:, 1]
    b1 = _cuckoo_h(q0, q1, salt, mask, 0).astype(jnp.int32)
    b2 = _cuckoo_h(q0, q1, salt, mask, 1).astype(jnp.int32)
    r1 = hkeys[b1]                                    # (Q, 8) row gather
    r2 = hkeys[b2]
    m1 = (r1[:, 0::2] == q0[:, None]) & (r1[:, 1::2] == q1[:, None])
    m2 = (r2[:, 0::2] == q0[:, None]) & (r2[:, 1::2] == q1[:, None])
    m = jnp.concatenate([m1, m2], axis=1)             # (Q, 8)
    found = jnp.any(m, axis=1)
    s = jnp.argmax(m, axis=1).astype(jnp.int32)
    fidx = jnp.where(s < CUCKOO_CAP, b1 * CUCKOO_CAP + s,
                     b2 * CUCKOO_CAP + (s - CUCKOO_CAP))
    v = vals[fidx]                                    # (Q, 2) row gather
    edge_sing = jnp.where(found, v[:, 0].astype(jnp.int32) - 1, -1)
    return edge_sing, v[:, 1].astype(jnp.int32), found


@functools.partial(jax.jit, static_argnames=("k", "w", "cap"))
def _compact_minimizer_rows(mat, elen, k: int, w: int, cap: int):
    """minimizer_mask + ON-DEVICE compaction of the marked positions
    (the sort-based compaction pattern from kmer/megasort._sort_count):
    the index build used to pull the FULL (B, P, NL) kmer tensor per
    segment batch (~9 MB) to np.nonzero on host — ~5x the bytes of the
    ~2/(w+1)-dense minimizer rows, on a 4-45 MB/s tunnel (round 4:
    index build was 3-5 s of the pipeline's aux stage).

    Returns (rows (cap, NL+2) uint32 — the key limbs then the segment
    row then the in-segment position, ONE array so the caller pays one
    slice pull per batch instead of three ~100 ms relay round trips —
    and n ()); n > cap means the cap overflowed and the caller must
    retry wider."""
    km, _h, is_mm = minimizer_mask(mat, elen, k, w)
    B, P, nl = km.shape
    M = B * P
    flat = is_mm.reshape(-1)
    idx = jnp.arange(M, dtype=jnp.uint32)
    key = jnp.where(flat, idx, jnp.uint32(0x80000000) | idx)
    (s2,) = jax.lax.sort((key,), num_keys=1)
    n = jnp.sum(flat.astype(jnp.int32))
    oc = min(cap, M)
    pos = (s2[:oc] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    live = jnp.arange(oc, dtype=jnp.int32) < n
    posc = jnp.where(live, pos, 0)
    rows = jnp.take(km.reshape(M, nl), posc, axis=0)
    rows = jnp.where(live[:, None], rows, jnp.uint32(0xFFFFFFFF))
    jrow = jnp.where(live, posc // P, 0).astype(jnp.uint32)
    ppos = jnp.where(live, posc % P, 0).astype(jnp.uint32)
    packed = jnp.concatenate(
        [rows, jrow[:, None], ppos[:, None]], axis=1)
    return packed, n



@dataclass
class EdgeMinimizerIndex:
    """Sorted minimizer table over all live edges of a graph."""
    keys: np.ndarray        # (M, NL) uint32 sorted unique minimizer k-mers
    edge: np.ndarray        # (M,) int32 first edge containing the key
    pos: np.ndarray         # (M,) int32 position on that edge
    count: np.ndarray       # (M,) int32 total occurrences
    k: int = MM_K
    w: int = MM_W
    _dev: Optional[tuple] = None
    _hash: Optional[tuple] = None

    def device_tables(self):
        """(hkeys, vals, salt) as DEVICE arrays, shipped once and
        cached: aux-info streams the library in dozens of map_reads
        calls against one index, and re-putting the multi-MB tables per
        call paid the tunnel latency each time."""
        if self._dev is None:
            hkeys_np, vals_np, salt = self.hash_tables()
            self._dev = (jnp.asarray(hkeys_np), jnp.asarray(vals_np),
                         jnp.asarray(salt))
        return self._dev

    def hash_tables(self):
        """Host cuckoo tables (hkeys (NB, 8), vals (NB*4, 2), salt),
        built lazily and cached."""
        if self._hash is None:
            self._hash = build_cuckoo_tables(self.keys, self.edge,
                                             self.pos, self.count)
        return self._hash

    @property
    def singleton(self) -> np.ndarray:
        return self.count == 1

    SEG = 4096     # content window positions per device row
    SEG_B = 256    # rows per device batch

    @classmethod
    def build(cls, g: AsmGraph, k: int = MM_K, w: int = MM_W
              ) -> "EdgeMinimizerIndex":
        """Index every live edge (reference mm_index_edges :605-621).

        Edges are chopped into fixed-width overlapping segments so the
        device minimizer kernel compiles for ONE (SEG_B, SEG + k + w - 2)
        shape regardless of contig lengths (per-length bucketing
        compiled a fresh megabyte-wide kernel per contig-size class —
        minutes over the remote-TPU tunnel).  Overlap w+k-2 means every
        window lies in exactly one segment; a minimizer position marked
        from two adjacent segments is an exact duplicate (key, edge,
        pos) row and is deduped before run-length counting.
        """
        SEG, B = cls.SEG, cls.SEG_B
        ov = k + w - 2
        Wd = SEG + ov
        span = k + w - 1  # window footprint
        lens = g.edge_len()
        segs_e, segs_s = [], []
        for e in np.flatnonzero(g.alive_mask()):
            L = int(lens[e])
            if L < span:
                continue
            n_pos = L - span + 1
            for i in range(-(-n_pos // SEG)):
                segs_e.append(int(e))
                segs_s.append(i * SEG)
        # dispatch every segment batch before syncing anything: each
        # int(n) gate costs a full relay round trip, and per-batch syncs
        # serialized the build (~3.8 s for a 4 Mbp pool; the map stage
        # pipelines its batches the same way)
        cap = 1 << 18
        pending = []
        for i in range(0, len(segs_e), B):
            ce = segs_e[i : i + B]
            csta = segs_s[i : i + B]
            mat = np.full((B, Wd), 255, np.uint8)
            elen = np.zeros(B, np.int32)
            for j, (e, s) in enumerate(zip(ce, csta)):
                seq = g.get_seq(e)
                part = seq[s : s + Wd]
                mat[j, : len(part)] = part
                elen[j] = len(part)
            out = _compact_minimizer_rows(mat, elen, k, w, cap)
            pending.append((ce, csta, mat, elen, out))
        if pending:
            ns = np.asarray(jnp.stack([o[1] for (_, _, _, _, o)
                                       in pending]))   # ONE sync
        all_rows = []

        def _pull(bi):
            ce, csta, mat, elen, out = pending[bi]
            n = int(ns[bi])
            if n > cap:   # rare: retry this batch alone, wider
                bcap = 1 << max(int(n - 1).bit_length(), 18)
                out = _compact_minimizer_rows(mat, elen, k, w, bcap)
                n = int(out[1])
            if n == 0:
                return None
            # one slice pull per batch: only the live rows cross
            packed = np.asarray(out[0][:n])
            rows = np.empty((n, NL + 2), np.uint32)
            rows[:, :NL] = packed[:, :NL]
            jj = packed[:, NL].astype(np.int64)
            rows[:, NL] = np.asarray(ce, np.uint32)[jj]
            rows[:, NL + 1] = np.asarray(csta, np.uint32)[jj] \
                + packed[:, NL + 1]
            return rows

        # serial pulls: the relay serializes same-direction transfers,
        # and concurrent np.asarray pulls measured 3x SLOWER (11.7 s vs
        # ~4 s) — round-4 A/B
        for bi in range(len(pending)):
            rows = _pull(bi)
            if rows is not None:
                all_rows.append(rows)
        if not all_rows:
            z = np.zeros((0, NL), np.uint32)
            return cls(z, np.zeros(0, np.int32), np.zeros(0, np.int32),
                       np.zeros(0, np.int32), k, w)
        rows = np.concatenate(all_rows)
        order = np.lexsort(tuple(rows[:, c] for c in
                                 reversed(range(NL + 2))))
        rows = rows[order]
        # drop exact duplicates from segment overlap
        uniq_row = np.ones(len(rows), bool)
        uniq_row[1:] = np.any(rows[1:] != rows[:-1], axis=1)
        rows = rows[uniq_row]
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
    start_est = hit_pos - p_read        # signed, like _vote_core
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


def _vote_core(bases, lengths, hkeys, vals, salt,
               k: int, w: int):
    """Per-read best-edge vote (trace-level body shared by the plain
    and verified kernels).  Returns (best_edge (B,) int32 [-1 if
    unmapped/ambiguous], best_hits (B,) int32, est_start (B,) int32).

    Three HBM-traffic optimizations over the naive all-lanes lookup
    (random access is the platform bottleneck):
      1. lane compaction — only the ~16 minimizer positions of each
         read (not all L-k+1 window lanes) are looked up, via a per-read
         rank scatter into MM_CAP slots;
      2. cuckoo lookup — at most 2 bucket-row gathers + 1 fused-value
         row gather per lane (was prefix-LUT + 4-step binary search +
         3 value gathers: 119+45 of the 300 ms/65k-read batch);
      3. per-row tally — the (read, edge) vote tally sorts each read's
         MM_CAP lanes along the row axis ((B, 48) sort, trivial) and
         run-lengths in registers — no scatter table at all."""
    B, L = bases.shape
    km, h, is_mm = minimizer_mask(bases, lengths, k, w)
    P = km.shape[1]

    # 1. compact minimizer lanes to MM_CAP slots per read by GATHER:
    # row-sort the minimizer positions and take the first MM_CAP —
    # 4.7x faster than the rank-scatter formulation (a 2.3M-lane
    # scatter is random-access bound; the row sort + slot gather is
    # mostly sequential)
    p_or_big = jnp.where(is_mm, jnp.arange(P, dtype=jnp.int32)[None, :],
                         jnp.int32(1 << 30))
    sp = jax.lax.sort(p_or_big, dimension=1)[:, :MM_CAP]
    cval2 = sp < P
    spc = jnp.minimum(sp, P - 1)
    ckg = jnp.take_along_axis(km, spc[:, :, None], axis=1)
    ck = jnp.where(cval2[:, :, None], ckg,
                   jnp.uint32(0xFFFFFFFF)).reshape(-1, NL)
    cp = jnp.where(cval2, spc, 0).reshape(-1)
    cvalid = cval2.reshape(-1)

    # 2. lookup: edge pre-fused with the singleton gate at build time
    edge_sing, pos_v, found = _cuckoo_probe(hkeys, vals, salt, ck)
    sing = cvalid & (edge_sing >= 0)
    SENT = jnp.int32(0x7FFFFFFF)
    ce = jnp.where(sing, edge_sing, SENT).reshape(B, MM_CAP)
    # SIGNED start: negative when the read overhangs the edge head (the
    # verification stage scores only the on-edge overlap, reference
    # asm_reg2aln clip handling src/barcode_builder.c:497-533; callers
    # clamp to >=0 for the BWA-pos-style public value)
    cs = pos_v - cp
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


@functools.partial(jax.jit, static_argnames=("k", "w"))
def _map_batch(bases, lengths, hkeys, vals, salt, k: int, w: int):
    """Vote-only kernel (mesh-sharded path, tests)."""
    return _vote_core(bases, lengths, hkeys, vals, salt, k, w)


def _verified_core(bases, lengths, hkeys, vals, salt,
                   seq_pk, seq_off, thr,
                   k: int, w: int, mt: int, mm: int):
    """Vote + gapless verification in ONE dispatch: the read bases ship
    H2D once and the fast-path acceptance (gapless score at the voted
    start clears the per-lane threshold) is decided on device.  Only
    the rare remainder lanes go through the host DP path.

    Returns (best_edge, best_hits, est_start, bound, fast)."""
    be, best, bs = _vote_core(bases, lengths, hkeys, vals, salt, k, w)
    bound, feas = _gapless_bound_dev(seq_pk, seq_off, be, bs, bases,
                                     lengths, mt, mm, RESCORE_PAD)
    fast = feas & (bound >= thr)
    return be, best, bs, bound, fast


@functools.partial(jax.jit, static_argnames=("k", "w", "mt", "mm"))
def _map_batch_verified(bases, lengths, hkeys, vals, salt,
                        seq_pk, seq_off, thr,
                        k: int, w: int, mt: int, mm: int):
    return _verified_core(bases, lengths, hkeys, vals, salt,
                          seq_pk, seq_off, thr, k, w, mt, mm)


@functools.partial(jax.jit, static_argnames=("L", "k", "w", "mt", "mm"))
def _map_batch_verified_packed(packed, nmask, lengths, hkeys, vals, salt,
                               seq_pk, seq_off, thr, L: int,
                               k: int, w: int, mt: int, mm: int):
    """Packed-wire variant: reads ship at 2.25 bits/base and unpack on
    device (same trick as kmer/megasort._extract_chunk_packed).  The
    host<->device tunnel swings 4-450 MB/s between sessions; on slow
    days the raw uint8 batches were the aux-info stage's wall."""
    from ..kmer.count import device_unpack_reads
    bases = device_unpack_reads(packed, nmask, L)
    return _verified_core(bases, lengths, hkeys, vals, salt,
                          seq_pk, seq_off, thr, k, w, mt, mm)


@functools.partial(jax.jit, static_argnames=("L", "k", "w"))
def _map_batch_packed(packed, nmask, lengths, hkeys, vals, salt,
                      L: int, k: int, w: int):
    """Packed-wire vote-only kernel (see _map_batch_verified_packed)."""
    from ..kmer.count import device_unpack_reads
    bases = device_unpack_reads(packed, nmask, L)
    return _vote_core(bases, lengths, hkeys, vals, salt, k, w)


def _unpack_clean(packed, L: int, read_len: int):
    """2-bit unpack for clean chunks (no Ns, uniform read length) —
    the nmask and lengths never ship (same wire trick as
    kmer/megasort._extract_chunk_packed_clean; 57 -> 38 bytes/150bp
    read, and the tunnel is the map stage's second-largest cost)."""
    B = packed.shape[0]
    shifts2 = jnp.arange(4, dtype=jnp.uint8) * 2
    bases = ((packed[:, :, None] >> shifts2[None, None, :]) & 3
             ).reshape(B, -1)[:, :L].astype(jnp.uint8)
    return bases, jnp.full((B,), read_len, jnp.int32)


@functools.partial(jax.jit, static_argnames=("L", "read_len", "k", "w",
                                             "mt", "mm"))
def _map_batch_verified_packedc(packed, thr, hkeys, vals, salt,
                                seq_pk, seq_off, L: int, read_len: int,
                                k: int, w: int, mt: int, mm: int):
    bases, lengths = _unpack_clean(packed, L, read_len)
    return _verified_core(bases, lengths, hkeys, vals, salt,
                          seq_pk, seq_off, thr, k, w, mt, mm)


@functools.partial(jax.jit, static_argnames=("L", "read_len", "k", "w"))
def _map_batch_packedc(packed, hkeys, vals, salt,
                       L: int, read_len: int, k: int, w: int):
    bases, lengths = _unpack_clean(packed, L, read_len)
    return _vote_core(bases, lengths, hkeys, vals, salt, k, w)


RESCORE_PAD = 16   # target-window slack around the voted start

_POOL_CACHE: dict = {}   # id(np seq pool) -> (weakref, device arrays)


POOL_PAD_W = 32   # front/back sentinel words around the packed pool


def _pack_pool_nibbles(seq_data: np.ndarray) -> np.ndarray:
    """4-bit-pack a base-code pool into uint32 words (8 codes/word,
    lowest nibble first) with POOL_PAD_W sentinel words (0xF nibbles,
    never equal to a read code) on both ends: the gapless verifier
    gathers one word-aligned window per lane, and the front pad keeps
    window starts non-negative for head-overhang (negative voted
    start) lanes."""
    n = len(seq_data)
    nw = -(-n // 8)
    buf = np.full(8 * nw, 0xF, np.uint8)
    buf[:n] = seq_data
    words = (buf.reshape(nw, 8).astype(np.uint32)
             << (4 * np.arange(8, dtype=np.uint32))[None, :]).sum(
                 axis=1, dtype=np.uint32)
    pad = np.full(POOL_PAD_W, 0xFFFFFFFF, np.uint32)
    return np.concatenate([pad, words, pad])


def _device_pool(seq_data: np.ndarray, seq_off: np.ndarray):
    """Device-resident copy of a graph's packed seq pool, cached per
    array identity (rescore runs once per 8k-read batch; re-uploading
    a multi-MB pool each time would dominate)."""
    import weakref
    key = id(seq_data)
    hit = _POOL_CACHE.get(key)
    if hit is not None and hit[0]() is seq_data:
        return hit[1]
    assert len(seq_data) < (1 << 31) - (POOL_PAD_W + 2) * 8
    dev = (jnp.asarray(_pack_pool_nibbles(seq_data)),
           jnp.asarray(np.ascontiguousarray(seq_off, np.int32)))
    if len(_POOL_CACHE) > 8:
        _POOL_CACHE.clear()
    _POOL_CACHE[key] = (weakref.ref(seq_data), dev)
    return dev


@functools.partial(jax.jit, static_argnames=("mt", "mm", "pad"))
def _gapless_bound_ref(seq_data, seq_off, edges, starts, bases, lengths,
                       mt: int, mm: int, pad: int):
    """Oracle formulation of the gapless bound on the UNPACKED pool:
    one scalar gather per (lane, position) — N*Lq random byte gathers,
    which profiled as the verify stage's wall (82 of 300 ms/65k batch).
    Kept for the equivalence test of the packed-window kernel below."""
    N, Lq = bases.shape
    e = jnp.maximum(edges, 0).astype(jnp.int32)
    elen = seq_off[e + 1] - seq_off[e]
    s0 = starts.astype(jnp.int32)
    j = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    tpos = s0[:, None] + j
    on_edge = (tpos >= 0) & (tpos < elen[:, None]) & \
        (j < lengths.astype(jnp.int32)[:, None])
    gidx = seq_off[e][:, None] + jnp.maximum(tpos, 0)
    tch = seq_data[jnp.clip(gidx, 0, seq_data.shape[0] - 1)]
    nmatch = jnp.sum(((bases == tch) & on_edge).astype(jnp.int32), axis=1)
    n_on = jnp.sum(on_edge.astype(jnp.int32), axis=1)
    bound = nmatch * mt + (n_on - nmatch) * mm
    feas = (n_on > 0) & (edges >= 0)
    return bound.astype(jnp.int32), feas


@functools.partial(jax.jit, static_argnames=("mt", "mm", "pad"))
def _gapless_bound_dev(seq_pk, seq_off, edges, starts, bases, lengths,
                       mt: int, mm: int, pad: int):
    """Score of the gapless alignment at the voted (signed) offset over
    the ON-EDGE overlap only — query bases hanging past either contig
    end are clipped, not penalized.  This is the reference's clip
    acceptance: asm_reg2aln extends soft-clips toward the contig ends
    and DP-scores only the on-contig window [qb, qe)
    (src/barcode_builder.c:497-563); an overhanging read keeps its
    on-edge score, while full-length gates (rp counting, a.aligned <
    read_len) exclude it naturally because its max score is the on-edge
    length.

    seq_pk is the 4-bit-packed pool from _pack_pool_nibbles.  Each
    lane's target window is CONTIGUOUS in the pool, so instead of N*Lq
    scalar gathers (the oracle above) this gathers ONE word-aligned
    uint32 window per lane (vmapped dynamic_slice -> one gather of
    slice width W), unpacks it, and aligns it to the read with an
    8-case sub-word shift select — all dense vector ops.

    Returns (bound (N,) int32, feas (N,) bool); feas lanes have a
    non-empty on-edge overlap at the voted offset (a feasible clipped
    gapless alignment, so bound lower-bounds the clipped DP optimum).

    Queries wider than ~8*(POOL_PAD_W-1) bases exceed the sentinel pad
    that keeps the contiguous window in-bounds; those trace the
    per-position nibble-gather fallback below (the _gapless_bound_ref
    formulation on the packed pool — correct for any width, just
    gather-bound)."""
    N, Lq = bases.shape
    W = -(-(Lq + 7) // 8) + 1           # words per window (covers shift 0..7)
    nwords = seq_pk.shape[0]
    e = jnp.maximum(edges, 0).astype(jnp.int32)
    elen = seq_off[e + 1] - seq_off[e]
    s0 = starts.astype(jnp.int32)
    j = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    tpos = s0[:, None] + j
    on_edge = (tpos >= 0) & (tpos < elen[:, None]) & \
        (j < lengths.astype(jnp.int32)[:, None])
    if W > POOL_PAD_W:
        # wide-read fallback: one nibble gather per (lane, position).
        # Out-of-range positions clip into pad/neighbor words whose
        # value never matters: nmatch is gated on on_edge.
        gb = jnp.clip(seq_off[e][:, None] + tpos + jnp.int32(8 * POOL_PAD_W),
                      0, jnp.int32(8 * nwords - 1))
        word = jnp.take(seq_pk, gb >> 3)
        tch = ((word >> (jnp.uint32(4) * (gb & 7).astype(jnp.uint32)))
               & jnp.uint32(0xF)).astype(jnp.uint8)
    else:
        # window start in PADDED pool bases; the POOL_PAD_W front sentinel
        # words keep b >= 0 for any head overhang s0 >= -(Lq-1)
        b = seq_off[e] + s0 + jnp.int32(8 * POOL_PAD_W)
        b = jnp.clip(b, 0, jnp.int32(8 * (nwords - W)))
        wb = b >> 3
        sig = b & 7
        win = jax.vmap(
            lambda s: jax.lax.dynamic_slice(seq_pk, (s,), (W,)))(wb)  # (N, W)
        # funnel-shift the whole window down by `sig` nibbles so the target
        # always starts at nibble 0 — elementwise per-row shifts instead of
        # 8 unaligned minor-dim slices (XLA relayouts each unaligned slice)
        sh = (jnp.uint32(4) * sig.astype(jnp.uint32))[:, None]
        nxt = jnp.concatenate(
            [win[:, 1:], jnp.zeros((N, 1), jnp.uint32)], axis=1)
        wal = jnp.where(sh == 0, win,
                        (win >> sh) | (nxt << (jnp.uint32(32) - sh)))
        nib = ((wal[:, :, None] >> (jnp.uint32(4)
                                    * jnp.arange(8, dtype=jnp.uint32))[None,
                                                                       None, :])
               & jnp.uint32(0xF)).astype(jnp.uint8).reshape(N, 8 * W)
        tch = nib[:, :Lq]
    nmatch = jnp.sum(((bases == tch) & on_edge).astype(jnp.int32), axis=1)
    n_on = jnp.sum(on_edge.astype(jnp.int32), axis=1)
    bound = nmatch * mt + (n_on - nmatch) * mm
    feas = (n_on > 0) & (edges >= 0)
    return bound.astype(jnp.int32), feas


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
    mt, mm = int(scoring[0]), int(scoring[1])

    # gapless fast path at the voted start (feasible when the query
    # fits the edge with no indels) — computed on device with the lane
    # count bucketed to pow2 (bridge calls come in per-gap sizes)
    Np = dp.pad_pow2(N, lo=1024)
    def pad0(a, fill=0):
        return a if Np == N else np.concatenate(
            [a, np.full((Np - N,) + a.shape[1:], fill, a.dtype)])
    sd, sod = _device_pool(seq_data, seq_off)
    bound_d, feas_d = _gapless_bound_dev(
        sd, sod, jnp.asarray(pad0(edges, -1)), jnp.asarray(pad0(starts)),
        jnp.asarray(pad0(bases, 255)), jnp.asarray(pad0(lengths)),
        mt, mm, pad)
    bound = np.asarray(bound_d)[:N].astype(np.int64)
    feas = np.asarray(feas_d)[:N]
    thr_all = (np.broadcast_to(np.asarray(min_score), (N,))
               if np.ndim(min_score) else np.full(N, min_score))
    mapped_m = edges >= 0
    fast = feas & (bound >= thr_all) & mapped_m
    scores[fast] = bound[fast].astype(np.int32)
    accept[fast] = True

    rest = np.flatnonzero(mapped_m & ~fast)
    if len(rest) == 0:
        return accept, scores
    sc = _dp_verify_rest(seq_data, seq_off, edges, starts, bases, lengths,
                         rest, scoring, pad)
    scores[rest] = sc
    accept[rest] = sc >= thr_all[rest]
    return accept, scores


def _dp_verify_rest(seq_data, seq_off, edges, starts, bases, lengths,
                    rest: np.ndarray, scoring, pad: int = RESCORE_PAD
                    ) -> np.ndarray:
    """Full banded DP for the lanes in `rest` (host window build — the
    remainder is small on clean libraries); lanes pow2-bucketed.

    starts are SIGNED voted offsets; query bases overhanging either
    contig end are trimmed before the DP, so only the on-edge part must
    align (reference asm_reg2aln DP-scores [qb, qe) after extending
    clips toward the contig ends, src/barcode_builder.c:497-563).
    Returns (len(rest),) int32 scores."""
    from ..ops import dp
    Lq = bases.shape[1]
    e = edges[rest].astype(np.int64)
    qlen = lengths[rest].astype(np.int64)
    elen = (seq_off[e + 1] - seq_off[e]).astype(np.int64)
    s0s = starts[rest].astype(np.int64)
    qlo = np.maximum(-s0s, 0)                      # head-overhang trim
    qhi = np.maximum(np.minimum(qlen, elen - s0s), qlo)  # tail trim
    ql_t = qhi - qlo
    s0 = np.clip(s0s + qlo, 0, np.maximum(elen - 1, 0))  # on-edge start
    w0 = np.maximum(s0 - pad, 0)
    w1 = np.minimum(s0 + ql_t + pad, elen)
    Lt = Lq + 2 * pad
    idx = (seq_off[e] + w0)[:, None] + np.arange(Lt)[None, :]
    inwin = np.arange(Lt)[None, :] < (w1 - w0)[:, None]
    t = np.where(inwin, seq_data[np.minimum(idx, len(seq_data) - 1)],
                 np.uint8(255))
    B = dp.pad_pow2(len(rest), lo=256)
    q = np.full((B, Lq), 255, np.uint8)
    # per-row left shift by qlo (trim the head overhang off the query)
    qidx = np.minimum(qlo[:, None] + np.arange(Lq)[None, :], Lq - 1)
    q[: len(rest)] = np.take_along_axis(bases[rest], qidx, axis=1)
    tb = np.full((B, Lt), 255, np.uint8)
    tb[: len(rest)] = t
    ql = np.zeros(B, np.int32)
    ql[: len(rest)] = ql_t
    tl = np.zeros(B, np.int32)
    tl[: len(rest)] = (w1 - w0)
    sc = dp.affine_scores(q, ql, tb, tl, scoring, band=128, mode="fit")
    sc = sc[: len(rest)]
    return np.where(ql_t > 0, sc, 0).astype(np.int32)


def map_reads(index: EdgeMinimizerIndex, bases: np.ndarray,
              lengths: np.ndarray, batch_size: int = 65536,
              graph=None, min_score=None, mesh=None, shipped=None,
              with_hits: bool = True):
    """Map a read matrix; returns (edge (N,) int32 [-1 unmapped],
    n_hits (N,), est_start (N,)).

    with_hits=False skips the n_hits D2H pull (returned zeros) — the
    aux-info/rp consumers never read it, and every pulled column costs
    4 bytes/read over the 4-450 MB/s tunnel.

    graph: when given (anything with seq_data + seq_off pools), every
    voted hit is DP-verified with rescore_hits and rejects are demoted
    to unmapped — the production aux-info/bridge configuration.

    mesh: when given (a multi-device jax Mesh), the vote loop runs
    read-data-parallel over the mesh (parallel/sharded_map.py,
    bit-equal to the single-device kernel).

    shipped: a list of device-resident ship records for THESE reads
    (kmer/megasort ship format, e.g. from count_reads_device
    return_chunks=True) — the read matrix then never re-crosses the
    host<->device tunnel; `bases`/`lengths` are still required for the
    host-DP remainder lanes.  Records are sliced on device into
    batch_size dispatches.

    batch_size 65536 measured +28% over 32768 with the scatter-free
    minimizer mask (198k vs 155k reads/s on the v5e tunnel; 131072
    regresses) — per-dispatch relay latency amortizes over wider
    batches until HBM pressure bites."""
    N = len(bases)
    edges = np.full(N, -1, np.int32)
    hits = np.zeros(N, np.int32)
    starts = np.full(N, -1, np.int32)
    if len(index.keys) == 0:
        return edges, hits, starts
    if mesh is not None and int(mesh.devices.size) > 1:
        # verification runs fused ON DEVICE inside the sharded dispatch
        # (parallel/sharded_map.sharded_map_step_verified); only the
        # rare bound-miss lanes reach the host DP
        from ..parallel.sharded_map import map_reads_sharded
        return map_reads_sharded(
            index, bases, lengths, mesh, batch_size=batch_size,
            graph=graph, min_score=min_score, with_hits=with_hits)

    from ..ops import dp
    if min_score is None:
        min_score = dp.MIN_MAP_SCORE
    thr_all = (np.asarray(np.broadcast_to(min_score, (N,)), np.int32)
               if np.ndim(min_score) else np.full(N, min_score, np.int32))
    hkeys, vals, salt = index.device_tables()
    verified = graph is not None
    if verified:
        sd, sod = _device_pool(graph.seq_data, graph.seq_off)
        mt, mm = int(dp.SCORING_BWA[0]), int(dp.SCORING_BWA[1])
    fast = np.zeros(N, bool)
    # dispatch every batch before fetching any result: jax dispatch is
    # async, so the device pipelines batches back-to-back while the host
    # only pays one sync at the end (the per-batch fetch round-trip is
    # ~100 ms on this rig's tunnel).  Reads ship bit-packed by default
    # (TA_SHIP=raw opts out) — the same wire format as the count stage.
    pending = []
    if shipped is not None:
        # device-resident records: slice each record into batch_size
        # dispatches ON DEVICE — the read matrix never re-ships
        i = 0
        for rec in shipped:
            if i >= N:
                break
            kind = rec[0]
            rows = int(rec[1].shape[0])
            step = batch_size if rows % batch_size == 0 else rows
            for j in range(0, rows, step):
                if i >= N:
                    break
                tb_ = thr_all[i : i + step]
                if len(tb_) < step:
                    tb_ = np.concatenate(
                        [tb_, np.full(step - len(tb_), np.int32(1 << 30),
                                      np.int32)])
                if kind == "packedc":
                    _, p, L, rl = rec
                    pk = p[j : j + step] if step < rows else p
                    if verified:
                        out = _map_batch_verified_packedc(
                            pk, tb_, hkeys, vals, salt, sd, sod,
                            L, rl, index.k, index.w, mt, mm)
                    else:
                        out = _map_batch_packedc(
                            pk, hkeys, vals, salt,
                            L, rl, index.k, index.w)
                elif kind == "packed":
                    _, p, m_, lv, L = rec
                    sl = slice(j, j + step)
                    pk, nm, lb_ = ((p[sl], m_[sl], lv[sl]) if step < rows
                                   else (p, m_, lv))
                    if verified:
                        out = _map_batch_verified_packed(
                            pk, nm, lb_, hkeys, vals, salt,
                            sd, sod, tb_, L, index.k, index.w, mt, mm)
                    else:
                        out = _map_batch_packed(
                            pk, nm, lb_, hkeys, vals, salt,
                            L, index.k, index.w)
                else:  # raw
                    _, bd, lv = rec
                    sl = slice(j, j + step)
                    rb, lb_ = (bd[sl], lv[sl]) if step < rows else (bd, lv)
                    if verified:
                        out = _map_batch_verified(
                            rb, lb_, hkeys, vals, salt, sd, sod,
                            tb_, index.k, index.w, mt, mm)
                    else:
                        out = _map_batch(rb, lb_, hkeys, vals, salt,
                                         index.k, index.w)
                pending.append((i, min(step, N - i), out))
                i += step
    else:
        pack_wire = os.environ.get("TA_SHIP", "packed") == "packed"
        if pack_wire:
            from ..kmer.count import host_pack_reads
            from ..kmer.megasort import _clean_chunk_info
        for i in range(0, N, batch_size):
            rb = bases[i : i + batch_size]
            lb_ = lengths[i : i + batch_size]
            tb_ = thr_all[i : i + batch_size]
            if len(rb) < batch_size:
                pad = batch_size - len(rb)
                rb = np.concatenate(
                    [rb, np.full((pad, rb.shape[1]), 255, np.uint8)])
                lb_ = np.concatenate([lb_, np.zeros(pad, np.int32)])
                tb_ = np.concatenate(
                    [tb_, np.full(pad, np.int32(1 << 30), np.int32)])
            if pack_wire:
                clean, rl = _clean_chunk_info(rb, lb_)
                pk, nm = host_pack_reads(np.ascontiguousarray(rb))
                if clean and verified:
                    out = _map_batch_verified_packedc(
                        pk, tb_, hkeys, vals, salt, sd, sod,
                        rb.shape[1], rl, index.k, index.w, mt, mm)
                elif clean:
                    out = _map_batch_packedc(
                        pk, hkeys, vals, salt,
                        rb.shape[1], rl, index.k, index.w)
                elif verified:
                    out = _map_batch_verified_packed(
                        pk, nm, lb_, hkeys, vals, salt, sd, sod,
                        tb_, rb.shape[1], index.k, index.w, mt, mm)
                else:
                    out = _map_batch_packed(
                        pk, nm, lb_, hkeys, vals, salt,
                        rb.shape[1], index.k, index.w)
            elif verified:
                out = _map_batch_verified(
                    rb, lb_, hkeys, vals, salt, sd, sod, tb_,
                    index.k, index.w, mt, mm)
            else:
                out = _map_batch(rb, lb_, hkeys, vals, salt,
                                 index.k, index.w)
            pending.append((i, min(batch_size, N - i), out))
    for i, m, out in pending:
        edges[i : i + m] = np.asarray(out[0])[:m]
        if with_hits:
            hits[i : i + m] = np.asarray(out[1])[:m]
        starts[i : i + m] = np.asarray(out[2])[:m]
        if verified:
            # out[3] (the gapless bound) stays on device — acceptance
            # is the `fast` flag; pulling it cost 4 bytes/read of tunnel
            fast[i : i + m] = np.asarray(out[4])[:m]
    if verified:
        # gapless fast path decided on device; full DP only on the rest
        accept = fast & (edges >= 0)
        rest = np.flatnonzero((edges >= 0) & ~fast)
        if len(rest):
            sc = _dp_verify_rest(graph.seq_data, graph.seq_off, edges,
                                 starts, bases, lengths, rest,
                                 dp.SCORING_BWA)
            accept[rest] = sc >= thr_all[rest]
        edges = np.where(accept, edges, -1)
    # public starts are BWA-pos style: clamped >= 0 on mapped lanes
    starts = np.where(edges >= 0, np.maximum(starts, 0), -1)
    return edges, hits, starts
