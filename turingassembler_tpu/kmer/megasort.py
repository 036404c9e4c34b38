"""Mega-batch sort-based canonical (k+1)-mer counting — the TPU hot path.

Replaces the scatter-probe hash engine (ops/devhash.py) for bulk
counting.  Measured on the v5e rig (round 2): `lax.sort` streams
~160M rows/s on 3-limb keys while random gather/scatter sustains only
~100-130M accesses/s, and the host link runs ~450 MB/s when driven by
2+ concurrent transfer threads — so the fastest exact counter is:

  1. ship bit-packed read chunks H2D (2 bits/base for clean chunks —
     the tunnel swings 4-450 MB/s between sessions, so wire bytes are
     the wall on slow days; TA_SHIP=raw opts out on fast links),
  2. per chunk, one fused dispatch extracts every canonical (k+1)-mer
     window (ops/kmers.py) into flat limb columns,
  3. ONE device sort of all lanes by the limb columns
     (`lax.sort(num_keys=nl)`), then a run-length pass whose
     boundary-compaction is a second single-key sort of
     `(is_boundary, lane_index)` packed into one uint32 — avoiding any
     full-width scatter stream,
  4. unique keys gathered at the boundary positions.

This is the TPU translation of KMC's sort-and-merge posture
(reference include/kmc_skipping.h:8-11; the external counter the
reference shells out to) rather than kmhash's CAS probing
(src/kmhash.c:204-222) — sorting is the faster primitive on this
hardware.  Streams larger than one mega-chunk are handled LSM-style:
each chunk is sorted+deduped on device and unique runs are merged by
concat + re-sort with counts carried as payload (KMC's k-way merge,
src/KMC_reader.c:204-256, collapsed to log2 levels).

Sentinel convention: invalid lanes carry all-0xFFFFFFFF limbs and sort
to the tail.  When 2*(k+1) is a multiple of 32 a real all-T key is
bit-identical to the sentinel, so an explicit validity column joins the
sort keys in exactly that case.
"""

from __future__ import annotations

import functools
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kmers as km
from ..ops import limbs as lb

SENTINEL = np.uint32(0xFFFFFFFF)


def _lane_bucket(n: int) -> int:
    """Pad target for a flush's lane count: pow2 buckets below 4M lanes
    (small jobs — coarse buckets maximize executable reuse across
    local-assembly gaps), sixteenth-octave buckets above (big
    mega-chunks — <=6.25%% pad)."""
    if n <= 0:
        return 1024
    p2 = 1 << max(int(n - 1).bit_length(), 10)
    if n < (4 << 20):
        return p2
    h = p2 >> 4
    return -(-n // h) * h


def _needs_validity_key(k1: int) -> bool:
    """True when the all-T (k+1)-mer is bit-identical to the sentinel."""
    return (2 * k1) % 32 == 0


@functools.partial(jax.jit, static_argnames=("k1",))
def _extract_chunk(bases, lengths, k1: int):
    """One read chunk -> flat limb columns with invalid lanes sentinelled.

    bases: (B, L) uint8 codes; lengths: (B,) int32.
    Returns (cols tuple of nl (B*(L-k1+1),) uint32, n_valid ())."""
    canon, _, valid = km.extract_canonical_kmers(bases, lengths, k1)
    v = valid.reshape(-1)
    cols = tuple(jnp.where(v, canon[..., l].reshape(-1), SENTINEL)
                 for l in range(canon.shape[-1]))
    return cols, jnp.sum(v.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("L", "k1"))
def _extract_chunk_packed(packed, nmask, lengths, L: int, k1: int):
    """Packed-transfer variant: unpack (2.25 bits/base, kmer/count.py
    host_pack_reads) then extract — one fused dispatch."""
    from .count import device_unpack_reads
    bases = device_unpack_reads(packed, nmask, L)
    return _extract_chunk(bases, lengths, k1)


@functools.partial(jax.jit, static_argnames=("L", "read_len", "k1"))
def _extract_chunk_packed_clean(packed, L: int, read_len: int, k1: int):
    """Clean-chunk variant: no Ns and one uniform read length, so the
    nmask and per-read length vector never ship — 2 bits/base on the
    wire (the tunnel runs 30-450 MB/s depending on the day, so bytes
    are the count stage's wall on bad days)."""
    B = packed.shape[0]
    shifts2 = jnp.arange(4, dtype=jnp.uint8) * 2
    bases = ((packed[:, :, None] >> shifts2[None, None, :]) & 3
             ).reshape(B, -1)[:, :L].astype(jnp.uint8)
    lengths = jnp.full((B,), read_len, jnp.int32)
    return _extract_chunk(bases, lengths, k1)


@functools.partial(jax.jit,
                   static_argnames=("L", "read_len", "k1", "out_cap"))
def _extract_sort_count_clean(packed_tuple, L: int, read_len: int, k1: int,
                              out_cap: int):
    """Fused flush for clean chunks: extract every chunk, concat, sort,
    RLE — ONE dispatch per flush window instead of one per chunk plus
    one per sort.  Measured NEUTRAL on chip (round 4: dispatches are
    async and cost nothing observable; eager per-chunk extraction also
    overlaps the tunnel better), so this stays behind TA_FUSE_FLUSH=1
    as a measured dead end — do not re-derive it."""
    cols_acc = []
    n_valid = jnp.zeros((), jnp.int32)
    for p in packed_tuple:
        cols, nv = _extract_chunk_packed_clean(p, L, read_len, k1)
        cols_acc.append(cols)
        n_valid = n_valid + nv
    nl = len(cols_acc[0])
    catted = tuple(jnp.concatenate([c[l] for c in cols_acc])
                   for l in range(nl))
    return _sort_count(catted, n_valid, out_cap, k1)


def _clean_chunk_info(rb: np.ndarray, lv: np.ndarray):
    """(is_clean, read_len) — clean = no N codes and uniform lengths."""
    if len(lv) == 0:
        return False, 0
    rl = int(lv[0])
    if rl <= 0 or not (lv == rl).all():
        return False, 0
    if (rb[:, :rl] >= 4).any():
        return False, 0
    return True, rl


def _clean_chunk_info_packed(nmask: np.ndarray, lv: np.ndarray):
    """_clean_chunk_info from the pack's validity bitmask: bit j of
    nmask row set iff base j < 4.  Scans ~L/8 bytes per read instead of
    materializing a (B, L) bool temp — the bool form cost ~120 ms/chunk
    of first-touch page faults ON THE SHIP THREAD's critical path
    (round-4 measurement: the count pipeline lost ~0.6 s to it)."""
    if len(lv) == 0:
        return False, 0
    rl = int(lv[0])
    if rl <= 0 or not (lv == rl).all():
        return False, 0
    full, rem = divmod(rl, 8)
    if full and (nmask[:, :full] != 0xFF).any():
        return False, 0
    if rem:
        want = np.uint8((1 << rem) - 1)
        if ((nmask[:, full] & want) != want).any():
            return False, 0
    return True, rl


@functools.partial(jax.jit, static_argnames=("out_cap", "k1"),
                   donate_argnums=(0,))
def _sort_count(cols, n_valid, out_cap: int, k1: int):
    """Sort flat limb columns and run-length count the unique keys.

    cols: tuple of nl (M,) uint32 (invalid lanes = sentinel limbs);
    n_valid: () int32 — number of valid lanes.
    Returns (uniq (out_cap, nl) uint32 sentinel-padded, counts (out_cap,)
    int32, n_unique ()).  n_unique > out_cap means overflow: the tail was
    dropped and the caller must re-run with a larger out_cap.
    """
    nl = len(cols)
    M = cols[0].shape[0]
    if _needs_validity_key(k1):
        # all-T key == sentinel: an explicit validity column breaks the tie
        # (valid lanes first among equal limbs, so lanes [0, n_valid) are
        # exactly the valid ones)
        inval = (cols[0] == SENTINEL)
        for l in range(1, nl):
            inval = inval & (cols[l] == SENTINEL)
        # NOTE: a valid all-T lane also matches; recompute validity the
        # honest way costs nothing — callers pass n_valid from extraction
        # and the sort key only needs *some* total order with valid-first.
        s = jax.lax.sort(tuple(cols) + (inval.astype(jnp.uint32),),
                         num_keys=nl + 1)
        slimbs = s[:-1]
    else:
        slimbs = jax.lax.sort(tuple(cols), num_keys=nl)
    idx = jnp.arange(M, dtype=jnp.int32)
    neq = jnp.zeros((M - 1,), bool)
    for l in range(nl):
        neq = neq | (slimbs[l][1:] != slimbs[l][:-1])
    new = jnp.concatenate([jnp.ones((1,), bool), neq]) & (idx < n_valid)
    n_unique = jnp.sum(new.astype(jnp.int32))
    # boundary compaction WITHOUT a full-width scatter: one single-key
    # sort of (~new, lane index) packed in a uint32 puts boundary lane
    # indices, ascending, at the front.  Requires M < 2^31.
    key2 = jnp.where(new, idx.astype(jnp.uint32),
                     jnp.uint32(0x80000000) | idx.astype(jnp.uint32))
    (s2,) = jax.lax.sort((key2,), num_keys=1)
    oc = min(out_cap, M)                     # lanes bound uniques
    oidx = jnp.arange(oc, dtype=jnp.int32)
    live = oidx < n_unique
    pos = jnp.where(live, (s2[:oc] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32),
                    n_valid)
    pos_ext = jnp.concatenate([pos, n_valid[None]])
    nxt = jnp.where(oidx + 1 < n_unique, pos_ext[1:], n_valid)
    counts = nxt - pos
    gpos = jnp.minimum(pos, M - 1)
    uniq = jnp.stack([jnp.where(live, jnp.take(slimbs[l], gpos), SENTINEL)
                      for l in range(nl)], axis=1)
    counts = jnp.where(live, counts, 0)
    if oc < out_cap:
        uniq = jnp.concatenate(
            [uniq, jnp.full((out_cap - oc, nl), SENTINEL, jnp.uint32)])
        counts = jnp.concatenate(
            [counts, jnp.zeros((out_cap - oc,), counts.dtype)])
    return uniq, counts, n_unique


@functools.partial(jax.jit, static_argnames=("out_cap",),
                   donate_argnums=(0, 1, 2, 3))
def _merge_unique_runs(ka, ca, kb, cb, out_cap: int):
    """Merge two sorted unique (keys, counts) runs by concat + re-sort.

    ka: (A, nl) uint32 sentinel-padded, ca: (A,) int32; kb/cb likewise.
    Sentinel rows sort to the tail (counts 0).  Equal keys appear at most
    twice; counts are summed with a shifted-equality pass (no scatter).
    Returns (keys (out_cap, nl), counts (out_cap,), n_unique ()).
    """
    nl = ka.shape[1]
    cols = tuple(jnp.concatenate([ka[:, l], kb[:, l]]) for l in range(nl))
    w = jnp.concatenate([ca, cb])
    s = jax.lax.sort(cols + (w,), num_keys=nl)
    slimbs, sw = s[:-1], s[-1]
    M = sw.shape[0]
    idx = jnp.arange(M, dtype=jnp.int32)
    eq_prev = jnp.ones((M - 1,), bool)
    for l in range(nl):
        eq_prev = eq_prev & (slimbs[l][1:] == slimbs[l][:-1])
    live_row = slimbs[0] != SENTINEL
    for l in range(1, nl):
        live_row = live_row | (slimbs[l] != SENTINEL)
    # NOTE: all-T == sentinel ambiguity: counts of a real sentinel-valued
    # key survive because live_row uses counts too
    live_row = live_row | (sw > 0)
    new = jnp.concatenate([jnp.ones((1,), bool), ~eq_prev]) & live_row
    n_unique = jnp.sum(new.astype(jnp.int32))
    # each unique key spans at most 2 rows; sum = own + next row if equal
    w_next = jnp.concatenate([sw[1:], jnp.zeros((1,), sw.dtype)])
    eq_next = jnp.concatenate([eq_prev, jnp.zeros((1,), bool)])
    csum = sw + jnp.where(eq_next, w_next, 0)
    key2 = jnp.where(new, idx.astype(jnp.uint32),
                     jnp.uint32(0x80000000) | idx.astype(jnp.uint32))
    (s2,) = jax.lax.sort((key2,), num_keys=1)
    oc = min(out_cap, M)
    oidx = jnp.arange(oc, dtype=jnp.int32)
    live = oidx < n_unique
    pos = jnp.minimum((s2[:oc] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32),
                      M - 1)
    uniq = jnp.stack([jnp.where(live, jnp.take(slimbs[l], pos), SENTINEL)
                      for l in range(nl)], axis=1)
    counts = jnp.where(live, jnp.take(csum, pos), 0)
    if oc < out_cap:
        uniq = jnp.concatenate(
            [uniq, jnp.full((out_cap - oc, nl), SENTINEL, jnp.uint32)])
        counts = jnp.concatenate(
            [counts, jnp.zeros((out_cap - oc,), counts.dtype)])
    return uniq, counts, n_unique


def _coalesce_batches(batches, target_reads: int):
    """Merge a stream of (bases, lengths) host batches into records of
    exactly `target_reads` rows (width = max width in the group, padded
    with 255; the tail record is padded to full size too) so ship +
    extract executables are reused and dispatch counts stay low."""
    buf: List[tuple] = []
    nb = 0

    def _cat():
        nonlocal buf, nb
        W = max(b.shape[1] for b, _ in buf)
        rows = []
        for b, _ in buf:
            if b.shape[1] < W:
                b = np.concatenate(
                    [b, np.full((len(b), W - b.shape[1]), 255, np.uint8)], 1)
            rows.append(b)
        n = sum(len(b) for b in rows)
        if n < target_reads:
            rows.append(np.full((target_reads - n, W), 255, np.uint8))
        bases = np.concatenate(rows)
        lens = np.concatenate([l for _, l in buf] +
                              ([np.zeros(target_reads - n, np.int32)]
                               if n < target_reads else []))
        buf, nb = [], 0
        return bases, lens.astype(np.int32)

    for b, l in batches:
        while len(b):
            take = min(len(b), target_reads - nb)
            buf.append((b[:take], l[:take]))
            nb += take
            b, l = b[take:], l[take:]
            if nb >= target_reads:
                yield _cat()
    if nb:
        yield _cat()


def ship_chunks(reads: np.ndarray, lengths: np.ndarray, chunk: int,
                threads: int = 8, mode: str | None = None) -> List[tuple]:
    """Threaded H2D of read chunks, tail zero-padded.

    mode "packed" bit-packs to ~2.25 bits/base in the transfer threads
    (numpy releases the GIL); mode "raw" ships uint8 bases.  The tunnel's
    throughput swings 30-450 MB/s between sessions, so packed is the
    safe default — raw only wins when the link is fast AND host CPU is
    scarce (TA_SHIP=raw)."""
    if mode is None:
        mode = os.environ.get("TA_SHIP", "packed")
    n = len(reads)
    n_chunks = max(1, (n + chunk - 1) // chunk)
    L = reads.shape[1]

    def put(i):
        rb = reads[i * chunk:(i + 1) * chunk]
        lv = lengths[i * chunk:(i + 1) * chunk]
        if len(rb) < chunk:
            pad = chunk - len(rb)
            rb = np.concatenate([rb, np.full((pad, L), 255, np.uint8)])
            lv = np.concatenate([lv, np.zeros(pad, np.int32)])
        return _ship_record(rb, lv, L, mode)

    with ThreadPoolExecutor(min(threads, n_chunks)) as ex:
        return list(ex.map(put, range(n_chunks)))


def _ship_record(rb: np.ndarray, lv: np.ndarray, L: int, mode: str):
    """H2D one chunk; picks the cheapest wire format for its content."""
    if mode == "packed":
        from .count import host_pack_reads
        p, m = host_pack_reads(np.ascontiguousarray(rb))
        clean, rl = _clean_chunk_info_packed(m, lv)
        if clean:
            return ("packedc", jax.device_put(p), L, rl)
        lv_d = jax.device_put(np.ascontiguousarray(lv.astype(np.int32)))
        return ("packed", jax.device_put(p), jax.device_put(m), lv_d, L)
    lv_d = jax.device_put(np.ascontiguousarray(lv.astype(np.int32)))
    return ("raw", jax.device_put(np.ascontiguousarray(rb)), lv_d)


def extract_shipped(chunk_rec, k1: int):
    """Dispatch the extraction matching a ship_chunks record."""
    if chunk_rec[0] == "packed":
        _, p, m, lv, L = chunk_rec
        return _extract_chunk_packed(p, m, lv, L, k1)
    if chunk_rec[0] == "packedc":
        _, p, L, rl = chunk_rec
        return _extract_chunk_packed_clean(p, L, rl, k1)
    _, bases_d, lens_d = chunk_rec
    return _extract_chunk(bases_d, lens_d, k1)


def count_reads_device(
    reads: np.ndarray, lengths: np.ndarray, k: int, *,
    chunk_reads: int | None = None, threads: int = 1,
    out_cap_log2: int | None = None, flush_lanes: int | None = None,
    shipped: List[tuple] | None = None, return_chunks: bool = False,
):
    """Count canonical (k+1)-mers of a read matrix, results staying on
    device.  Returns (uniq (cap, nl) uint32 sorted unique sentinel-
    padded, counts (cap,) int32, n_unique int).

    shipped: reuse a list of device-resident ship records from an
    earlier pass (e.g. the k0 count feeding the k=31 coverage recount)
    instead of re-crossing the host<->device tunnel.  return_chunks:
    also return this pass's ship records so LATER stages (mapper
    aux-info, coverage recount) consume the device-resident reads —
    the reads then ship exactly once per pipeline, where the reference
    re-streams the FASTQ from disk per stage (src/process.c:585-701).

    Pipelined: background threads pack+ship chunks over the tunnel (the
    relay serializes the network writes themselves — 8 threads move the
    same bytes as 1 — but 2 threads let chunk i+1's host-side pack
    overlap chunk i's wire) while the main thread dispatches extraction
    and,
    every `flush_lanes` window lanes, a sort+RLE flush whose unique run
    is LSM-merged into the running table — so nearly all device sort
    work hides under the transfer wall.  Nothing syncs until the end:
    per-flush overflow flags are pulled once, and the whole pass retries
    with doubled capacity in the (rare) overflow case.

    The whole matrix must fit HBM; larger-than-HBM streams use
    count_kedges_megasort."""
    k1 = k + 1
    nl = lb.n_limbs(k1)
    if out_cap_log2 is None:
        out_cap_log2 = int(os.environ.get("TA_SORT_OUT_LOG2", 22))
    if chunk_reads is None:
        # measured A/B on chip (1M-read bench point): 131k-read chunks /
        # 56M-lane flushes run 2.9-3.6 s where 524k-read chunks with one
        # 112M-lane sort run 5.0-6.7 s — smaller units keep the H2D
        # stream and the sort overlapped; one mega-sort serializes them
        chunk_reads = int(os.environ.get("TA_COUNT_CHUNK", 131072))
    if flush_lanes is None:
        # 44M steady-state windows + the 24M head window = a (2,3,3)
        # chunk plan at the 1M-read bench point: measured best pipelined
        # (2.62-2.68 s vs 2.75-2.96 for the old (4,4) plan); (2,4,2)
        # measured 2.46 s preshipped but 3.1+ pipelined — round-4 A/Bs
        flush_lanes = int(os.environ.get("TA_FLUSH_LANES", 44 << 20))
    # the FIRST window flushes early: until the first sort is dispatched
    # the device sits idle while chunks cross the ~40 MB/s tunnel, so a
    # small head window starts compute ~2 chunks sooner; steady-state
    # windows stay big (fewer RLE+merge passes).  Round-4 overlap probe:
    # put-under-sort fully hides (total = max), so the head start is
    # pure win on slow-tunnel days and ~neutral on fast ones.
    first_flush = int(os.environ.get("TA_FLUSH_FIRST_LANES", 24 << 20))

    n = len(reads)
    n_chunks = max(1, (n + chunk_reads - 1) // chunk_reads)
    L = reads.shape[1]
    mode = os.environ.get("TA_SHIP", "packed")

    def ship_one(i):
        rb = reads[i * chunk_reads:(i + 1) * chunk_reads]
        lv = lengths[i * chunk_reads:(i + 1) * chunk_reads]
        if len(rb) < chunk_reads:
            pad = chunk_reads - len(rb)
            rb = np.concatenate([rb, np.full((pad, L), 255, np.uint8)])
            lv = np.concatenate([lv, np.zeros(pad, np.int32)])
        return _ship_record(rb, lv, L, mode)

    # retained for the overflow retry (and for return_chunks reuse).
    # 2 ship threads: the relay serializes same-direction transfers (8
    # threads move no more bytes than 1, NOTES_ROUND3), but chunk i+1's
    # host-side pack+clean-check overlaps chunk i's network write
    ship_threads = int(os.environ.get("TA_SHIP_THREADS", 2))
    chunks: List[tuple] = list(shipped) if shipped is not None else []
    with ThreadPoolExecutor(ship_threads) as ex:
        futs = ([] if chunks else
                [ex.submit(ship_one, i) for i in range(n_chunks)])

        # fused extract+sort flush measured NEUTRAL on chip (dispatches
        # are async; the relay does not tax them) and eager per-chunk
        # extraction overlaps the tunnel better — keep the fused path
        # available but off (NOTES_ROUND4)
        fuse = os.environ.get("TA_FUSE_FLUSH", "0") == "1"

        def attempt(cap_log2: int) -> Tuple[jax.Array, jax.Array, int, bool]:
            out_cap = 1 << cap_log2
            cols_acc: List[List[jax.Array]] = [[] for _ in range(nl)]
            recs_win: List[tuple] = []   # deferred clean records (fused path)
            n_valid = jnp.zeros((), jnp.int32)
            lanes = 0
            table = None              # (keys, counts) running unique run
            checks: List[Tuple[jax.Array, int]] = []   # (n_unique, cap)

            def flush():
                nonlocal cols_acc, recs_win, n_valid, lanes, table
                if lanes == 0:
                    return
                cap = min(out_cap, 1 << max(int(lanes - 1).bit_length(), 10))
                if recs_win and not any(len(c) for c in cols_acc):
                    # all-clean window: extract+concat+sort+RLE fused
                    # into ONE dispatch (one relay round trip per flush)
                    uniq, counts, n_u = _extract_sort_count_clean(
                        tuple(r[1] for r in recs_win),
                        recs_win[0][2], recs_win[0][3], k1, cap)
                else:
                    for rec in recs_win:
                        cols, nv = extract_shipped(rec, k1)
                        for l, c in enumerate(cols):
                            cols_acc[l].append(c)
                        n_valid = n_valid + nv
                    catted = tuple(jnp.concatenate(c) if len(c) > 1 else c[0]
                                   for c in cols_acc)
                    uniq, counts, n_u = _sort_count(catted, n_valid, cap, k1)
                checks.append((n_u, cap))
                if table is None:
                    table = (uniq, counts)
                else:
                    mcap = min(out_cap, 1 << (table[0].shape[0]
                                              + uniq.shape[0] - 1).bit_length())
                    mk, mc, mn = _merge_unique_runs(
                        table[0], table[1], uniq, counts, mcap)
                    checks.append((mn, mcap))
                    table = (mk, mc)
                cols_acc = [[] for _ in range(nl)]
                recs_win = []
                n_valid = jnp.zeros((), jnp.int32)
                lanes = 0

            def feed(rec):
                nonlocal lanes, n_valid
                if fuse and rec[0] == "packedc" and (
                        not recs_win
                        or (recs_win[0][2], recs_win[0][3]) == (rec[2], rec[3])):
                    # defer extraction into the fused flush dispatch
                    recs_win.append(rec)
                    B = rec[1].shape[0]
                    lanes += B * (rec[2] - k1 + 1)
                else:
                    cols, nv = extract_shipped(rec, k1)
                    for l, c in enumerate(cols):
                        cols_acc[l].append(c)
                    n_valid = n_valid + nv
                    lanes += cols[0].shape[0]
                if lanes >= (first_flush if table is None else flush_lanes):
                    flush()

            if chunks:                # retry pass: everything already here
                for rec in chunks:
                    feed(rec)
            else:
                for f in futs:
                    rec = f.result()
                    chunks.append(rec)
                    feed(rec)
            flush()
            # ONE sync for every deferred scalar
            ns = np.asarray(jnp.stack([c[0] for c in checks]))
            ok = all(int(nu) <= cap for nu, (_, cap) in zip(ns, checks))
            return table[0], table[1], int(ns[-1]), ok

        while True:
            uniq, counts, n_u, ok = attempt(out_cap_log2)
            if ok:
                if return_chunks:
                    return uniq, counts, n_u, chunks
                return uniq, counts, n_u
            out_cap_log2 += 1


def pull_rows(arr: jax.Array, n: int, threads: int = 4) -> np.ndarray:
    """D2H of arr[:n] using parallel slice pulls (the link parallelizes)."""
    if n == 0:
        return np.asarray(arr[:0])
    n_t = min(threads, max(1, n // 262144))
    if n_t <= 1:
        return np.asarray(arr[:n])
    bounds = np.linspace(0, n, n_t + 1).astype(np.int64)
    views = [arr[bounds[i]:bounds[i + 1]] for i in range(n_t)]
    for v in views:
        jax.block_until_ready(v)
    out = [None] * n_t
    def pull(i):
        out[i] = np.asarray(views[i])
    with ThreadPoolExecutor(n_t) as ex:
        list(ex.map(pull, range(n_t)))
    return np.concatenate(out, axis=0)


@functools.partial(jax.jit, static_argnames=("min_count",),
                   donate_argnums=(0, 1))
def _filter_min_count_device(keys, counts, n, min_count: int):
    """Drop rows with count < min_count, keeping sorted order and
    sentinel padding (the -mc filter, applied before the level-0 build
    so the table never round-trips to host)."""
    cap = keys.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    live = (idx < n) & (counts >= min_count)
    n2 = jnp.sum(live.astype(jnp.int32))
    key2 = jnp.where(live, idx.astype(jnp.uint32),
                     jnp.uint32(0x80000000) | idx.astype(jnp.uint32))
    (s2,) = jax.lax.sort((key2,), num_keys=1)
    pos = (s2 & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    live2 = idx < n2
    posc = jnp.where(live2, pos, 0)
    keys2 = jnp.where(live2[:, None], jnp.take(keys, posc, axis=0), SENTINEL)
    counts2 = jnp.where(live2, jnp.take(counts, posc), 0)
    return keys2, counts2, n2


def count_kedges_megasort_device(
    batches: Iterable[Tuple[np.ndarray, np.ndarray]], k: int,
    min_count: int = 1, **kw):
    """Like count_kedges_megasort but returns the DEVICE table
    (uniq (cap, nl) uint32 sentinel-padded, counts (cap,) int32, n int)
    so the level-0 build can run on device without pulling the table.
    Falls back to host arrays (2-tuple) when the -sm budget forced a
    host/disk spill."""
    res = count_kedges_megasort(batches, k, min_count=1,
                                _return_device=True, **kw)
    if len(res) == 2:            # spilled: host arrays
        kedges, counts = res
        if min_count > 1 and len(counts):
            keep = counts >= min_count
            kedges, counts = kedges[keep], counts[keep]
        return kedges, counts
    uniq, counts, n = res
    if min_count > 1 and n:
        uniq, counts, n_d = _filter_min_count_device(uniq, counts,
                                                     jnp.asarray(n, jnp.int32),
                                                     min_count)
        n = int(n_d)
    return uniq, counts, n


def count_kedges_megasort(
    batches: Iterable[Tuple[np.ndarray, np.ndarray]], k: int,
    min_count: int = 1, *, max_lanes: int | None = None,
    out_cap_log2: int | None = None, threads: int = 8,
    _return_device: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Streaming host API over (bases, lengths) batches: mega-chunks are
    sorted+deduped on device; unique runs merge LSM-style.  Returns host
    (kedges (n, nl) uint32 sorted unique, counts (n,) int64) with
    count >= min_count."""
    k1 = k + 1
    nl = lb.n_limbs(k1)
    if out_cap_log2 is None:
        out_cap_log2 = int(os.environ.get("TA_SORT_OUT_LOG2", 22))
    if max_lanes is None:
        max_lanes = int(os.environ.get("TA_SORT_MAX_LANES", 64 << 20))
    # early head window, same rationale as count_reads_device: start the
    # first sort while the tunnel is still streaming the library
    first_lanes = int(os.environ.get("TA_FLUSH_FIRST_LANES", 24 << 20))
    out_cap = 1 << out_cap_log2

    # out-of-core knobs (the -sm posture, reference src/main.c:234-236):
    # TA_SORT_DEVICE_LANES caps the DEVICE table — beyond it the merged
    # run is pulled to host; TA_SORT_HOST_MB caps host RAM — beyond it
    # runs spill to disk under TA_SPILL_DIR and the final merge is the
    # bounded-memory external k-way (ops/sortops.np_external_merge_runs)
    device_lanes = int(os.environ.get("TA_SORT_DEVICE_LANES", 0))
    host_mb = float(os.environ.get("TA_SORT_HOST_MB", 0))
    spill_dir = os.environ.get("TA_SPILL_DIR") or None
    host_runs: List[tuple] = []
    host_bytes = 0
    any_disk = False

    table = None  # (keys, counts) merged unique run
    table_n = 0
    cols_acc: List[List[jax.Array]] = [[] for _ in range(nl)]
    n_valid = jnp.zeros((), jnp.int32)
    lanes = 0
    window_recs: List[tuple] = []  # ship records of the current flush
    # window, retained (~5 MB/chunk packed) so a capacity overflow can
    # re-extract and re-sort: _sort_count donates its inputs, so the
    # flat columns themselves are unrecoverable after a truncated sort
    cap_hint = 0  # sticky: once a flush overflows, later flushes start
    # at the capacity that worked — error-laden libraries (unique-dense)
    # pay the re-extract retry once, not per flush

    def spill_table():
        nonlocal table, table_n, host_bytes, any_disk
        if table is None or table_n == 0:
            table = None
            table_n = 0
            return
        k_h = pull_rows(table[0], table_n, threads=4)
        c_h = pull_rows(table[1], table_n, threads=4).astype(np.int64)
        table = None
        table_n = 0
        nb = k_h.nbytes + c_h.nbytes
        if host_mb and spill_dir and (host_bytes + nb) > host_mb * 1e6:
            os.makedirs(spill_dir, exist_ok=True)
            i = len(host_runs)
            kp = os.path.join(spill_dir, f"count_run{i}_keys.npy")
            cp = os.path.join(spill_dir, f"count_run{i}_counts.npy")
            np.save(kp, k_h)
            np.save(cp, c_h)
            del k_h, c_h
            host_runs.append((np.load(kp, mmap_mode="r"),
                              np.load(cp, mmap_mode="r")))
            any_disk = True
        else:
            host_runs.append((k_h, c_h))
            host_bytes += nb

    def _cat_and_pad(acc):
        """Concat accumulated columns and pad lanes to a bucketed size so
        _sort_count executables are reused across jobs (each distinct
        shape pays a multi-second program load over the remote-TPU
        tunnel; local assemblies run one small flush per gap): pow2
        below 4M lanes, sixteenth-octave above (<=6% pad)."""
        catted = tuple(jnp.concatenate(c) if len(c) > 1 else c[0]
                       for c in acc)
        M = catted[0].shape[0]
        tgt = _lane_bucket(M)
        if tgt > M:
            pad = jnp.full((tgt - M,), SENTINEL, jnp.uint32)
            catted = tuple(jnp.concatenate([c, pad]) for c in catted)
        return catted

    def flush():
        nonlocal table, table_n, cols_acc, n_valid, lanes, cap_hint
        if lanes == 0:
            window_recs.clear()
            return
        catted = _cat_and_pad(cols_acc)
        # uniques never exceed the lane count — small jobs get small buffers
        lane_pow2 = 1 << max(int(lanes - 1).bit_length(), 10)
        cap = min(max(out_cap, cap_hint), lane_pow2)
        uniq, counts, n_unique = _sort_count(catted, n_valid, cap, k1)
        n_u = int(n_unique)
        cols_acc = [[] for _ in range(nl)]   # donated to _sort_count
        while n_u > cap:
            # capacity overflow: the sorted tail was dropped, and the
            # donated columns are gone with it — re-extract the window
            # from its retained ship records and re-sort wider
            cap = min(2 * cap, lane_pow2)
            acc2: List[List[jax.Array]] = [[] for _ in range(nl)]
            nv2 = jnp.zeros((), jnp.int32)
            for rec in window_recs:
                cols, nv = extract_shipped(rec, k1)
                for l, c in enumerate(cols):
                    acc2[l].append(c)
                nv2 = nv2 + nv
            uniq, counts, n_unique = _sort_count(
                _cat_and_pad(acc2), nv2, cap, k1)
            n_u = int(n_unique)
            cap_hint = max(cap_hint, cap)
        window_recs.clear()
        if table is None:
            table = (uniq, counts)
            table_n = n_u
        elif device_lanes and table_n + n_u > device_lanes:
            # the -sm device budget would truncate the merge (and
            # _merge_unique_runs donates both runs, losing them) — spill
            # the device table to a host run first; the final k-way
            # merge sums duplicate keys across runs
            spill_table()
            table = (uniq, counts)
            table_n = n_u
        else:
            # pow2 of the true size never truncates; out_cap bounds only
            # the per-flush sort output, not the running table (that is
            # TA_SORT_DEVICE_LANES' job)
            mcap = 1 << max(int(table_n + n_u - 1).bit_length(), 10)
            mk, mc, mn = _merge_unique_runs(table[0], table[1], uniq, counts,
                                            mcap)
            table = (mk, mc)
            table_n = int(mn)
        n_valid = jnp.zeros((), jnp.int32)
        lanes = 0
        if device_lanes and table_n >= device_lanes:
            spill_table()

    mode = os.environ.get("TA_SHIP", "packed")

    def ship(b, l):
        return _ship_record(np.ascontiguousarray(b),
                            np.ascontiguousarray(l.astype(np.int32)),
                            b.shape[1], mode)

    # coalesce small loader batches into full-size ship records: every
    # record costs a fixed multi-ms relay round trip per device_put and
    # per extract dispatch, so 4096-read parser batches would pay ~30x
    # the dispatch tax of the 131072-read records the bench path uses
    batches = _coalesce_batches(
        batches, int(os.environ.get("TA_COUNT_CHUNK", 131072)))

    from collections import deque
    with ThreadPoolExecutor(threads) as ex:
        futs: deque = deque()
        it = iter(batches)
        done = False
        while futs or not done:
            while not done and len(futs) < 2 * threads:
                try:
                    bases, lengths = next(it)
                except StopIteration:
                    done = True
                    break
                futs.append(ex.submit(ship, bases, lengths))
            if not futs:
                break
            rec = futs.popleft().result()
            window_recs.append(rec)
            cols, nv = extract_shipped(rec, k1)
            for l, c in enumerate(cols):
                cols_acc[l].append(c)
            n_valid = n_valid + nv
            lanes += cols[0].shape[0]
            if lanes >= (first_lanes if table is None and not host_runs
                         else max_lanes):
                flush()
    flush()
    if host_runs:
        # spilled mode: fold the final device table in and k-way merge
        spill_table()
        from ..ops.sortops import np_external_merge_runs
        return np_external_merge_runs(
            host_runs, min_count=min_count,
            out_dir=spill_dir if any_disk else None)
    if table is None:
        return np.zeros((0, nl), np.uint32), np.zeros(0, np.int64)
    if _return_device:
        return table[0], table[1], table_n
    keys_d, counts_d = table
    n = table_n
    keys = pull_rows(keys_d, n, threads=4)
    counts = pull_rows(counts_d, n, threads=4).astype(np.int64)
    if min_count > 1 and len(counts):
        keep = counts >= min_count
        keys, counts = keys[keep], counts[keep]
    return keys, counts
