"""Device hash-table k-mer counter — the speed-of-light TPU path.

Replaces the sort+RLE tile engine for the hot counting loop.  Measured
on the v5e rig: `lax.sort` moves ~0.03M rows/ms, while XLA gather /
scatter sustains ~60M random accesses/s — so exact counting becomes a
vectorized open-addressing table (the TPU translation of the
reference's kmhash, src/kmhash.c, with its CAS loop replaced by
scatter-claim / gather-verify rounds), engineered to minimize random
accesses per lane:

  - identity is EXACT: a lane merges into a slot only when the slot's
    full payload (every k-mer limb) equals its own key; the 64-bit
    fingerprint (2 x uint32 independent hashes) is a fast pre-filter
    written at claim time.  Verifying the payload (not just the
    fingerprint) also makes concurrent claims sound: when two
    *different* keys claim one empty slot in the same round, each
    fp/payload limb is written by an independent scatter with
    duplicate indices (UB — the slot can come up a per-limb chimera),
    but a chimeric slot matches no key's full payload, so every lane
    simply probes on and the slot is dead weight (counts stay 0; the
    finalize compaction drops it).  Exactness is *stronger* than the
    reference's 64-bit-hash tables (src/build_hash_table.c:78-101).
  - after the first probe round (which resolves ~90%+ of lanes at
    sane load), unresolved lanes are dense-packed into a small buffer
    and the remaining rounds run on that buffer only.
  - probe rounds are python-unrolled: on this rig every device-loop
    iteration costs a host round-trip through the relay (~100 ms), so
    lax.scan/while_loop are off the table in hot paths.

Lanes unresolved after all rounds (or overflowing the compaction
buffer) are counted; the caller grows capacity and re-runs — the
observable analogue of kmhash's stop-the-world resize
(src/kmhash.c:376-409).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as lb

SENTINEL = np.uint32(0xFFFFFFFF)
MAX_PROBES = 8
COMPACT_FRACTION = 4  # small-buffer capacity = N // COMPACT_FRACTION


def _probe_round(state):
    """One scatter-claim / gather-verify round over the lanes in `state`.

    state: ((fp0, fp1, payload), slot, stride, fpA, fpB, cols, resolved,
    res_slot).  Claim writes use unique_indices=True to keep XLA from
    lowering the scatter into a sort-based combiner (~30 ms/scatter
    otherwise); two different keys claiming one slot in the same round
    are UB per limb (possible chimeric slot), which is sound because
    verification below requires FULL payload equality — a chimera
    matches nobody and the colliding lanes keep probing (module doc).
    Counts are NOT updated here — each lane records the slot it
    resolved at (res_slot) and one deferred scatter-add per lane set
    accumulates them.
    """
    (fp0, fp1, payload), slot, stride, fpA, fpB, cols, resolved, res_slot = state
    C = fp0.shape[0]
    mask = jnp.uint32(C - 1)
    sl = slot.astype(jnp.int32)
    cur0 = jnp.take(fp0, sl)
    emp = cur0 == SENTINEL
    wslot = jnp.where(~resolved & emp, sl, C)
    fp0 = fp0.at[wslot].set(fpA, mode="drop", unique_indices=True)
    fp1 = fp1.at[wslot].set(fpB, mode="drop", unique_indices=True)
    payload = [payload[l].at[wslot].set(cols[l], mode="drop",
                                        unique_indices=True)
               for l in range(len(payload))]
    # verify (also detects the winner among colliding claims): fps are
    # the cheap filter, full payload equality is the actual identity
    cur0 = jnp.take(fp0, sl)
    cur1 = jnp.take(fp1, sl)
    mine = (cur0 == fpA) & (cur1 == fpB) & ~resolved
    for l in range(len(payload)):
        mine = mine & (jnp.take(payload[l], sl) == cols[l])
    res_slot = jnp.where(mine, sl, res_slot)
    resolved = resolved | mine
    slot = (slot + stride) & mask
    return (fp0, fp1, payload), slot, stride, fpA, fpB, cols, resolved, res_slot


def _hashes(kmers, mask):
    h = lb.hash_limbs(kmers)
    h2 = lb.hash_limbs(kmers, seed=0xC2B2AE35)
    h3 = lb.hash_limbs(kmers, seed=0x27D4EB2F)
    slot = (h & mask).astype(jnp.uint32)
    stride = (h2 | jnp.uint32(1)) & mask
    fpA = jnp.where(h2 == SENTINEL, jnp.uint32(0xFFFFFFFE), h2)
    fpB = h3
    return slot, stride, fpA, fpB


def _insert_body(keys, counts, kmers, valid, cap_frac: int):
    """One batch insert.  keys = (fp0, fp1, k0..k_{nl-1}) tuple of (C,)
    uint32 arrays (donated); counts (C,) int32 (donated); kmers (N, nl);
    valid (N,).  Returns (keys, counts, n_overflow).

    Cost model: a masked scatter pays for every index it streams, so
    the structure minimizes full-batch operations:
      fast path (all N lanes): two fingerprint gathers + one count add —
        at steady state most k-mer occurrences hit an existing entry;
      slow path: missing lanes are dense-packed (payload limbs only;
        hashes are recomputed) into a buffer of N // cap_frac lanes and
        all claiming/probing happens there.
    cap_frac is static: the engine uses cap_frac=1 executables while
    the table is filling (most lanes miss) and cap_frac=4 at steady
    state; buffer overflow is counted and raises at finalize.
    """
    fp0, fp1 = keys[0], keys[1]
    payload = list(keys[2:])
    nl = len(payload)
    C = fp0.shape[0]
    N = kmers.shape[0]
    mask = jnp.uint32(C - 1)

    slot, _, fpA, fpB = _hashes(kmers, mask)
    sl = slot.astype(jnp.int32)
    cur0 = jnp.take(fp0, sl)
    cur1 = jnp.take(fp1, sl)
    mine0 = (cur0 == fpA) & (cur1 == fpB) & valid
    for l in range(nl):
        mine0 = mine0 & (jnp.take(payload[l], sl) == kmers[:, l])
    counts = counts.at[jnp.where(mine0, sl, C)].add(1, mode="drop")

    # compact the misses: payload limbs only
    miss = valid & ~mine0
    cap = max(N // cap_frac, 1024)
    pos = jnp.cumsum(miss.astype(jnp.int32)) - 1
    dst = jnp.where(miss & (pos < cap), pos, cap)
    n_miss = jnp.sum(miss.astype(jnp.int32))
    n_dropped = jnp.maximum(n_miss - cap, 0)
    s_kmers = jnp.stack(
        [jnp.zeros((cap,), jnp.uint32).at[dst].set(kmers[:, l], mode="drop")
         for l in range(nl)], axis=1)
    s_live = jnp.full((cap,), False).at[dst].set(miss, mode="drop")

    s_slot, s_stride, s_fpA, s_fpB = _hashes(s_kmers, mask)
    s_cols = [s_kmers[:, l] for l in range(nl)]
    s_resolved = ~s_live
    s_res_slot = jnp.full((cap,), C, jnp.int32)
    table = (fp0, fp1, payload)
    sub = (table, s_slot, s_stride, s_fpA, s_fpB, s_cols, s_resolved, s_res_slot)
    for _ in range(MAX_PROBES):
        sub = _probe_round(sub)
    (fp0, fp1, payload), _, _, _, _, _, s_resolved, s_res_slot = sub

    counts = counts.at[s_res_slot].add(1, mode="drop")
    n_overflow = (n_dropped + jnp.sum((~s_resolved).astype(jnp.int32))).astype(jnp.int32)
    return (fp0, fp1, *payload), counts, n_overflow


_insert = jax.jit(_insert_body, donate_argnums=(0, 1),
                  static_argnames=("cap_frac",))


@functools.partial(jax.jit, static_argnames=("out_cap",))
def _compact(keys, counts, out_cap: int):
    """Dense-pack live payload entries into per-limb (out_cap,) buffers."""
    payload = keys[2:]
    live = counts > 0
    pos = jnp.cumsum(live.astype(jnp.int32)) - 1
    slot = jnp.where(live, jnp.minimum(pos, out_cap - 1), out_cap)
    out_keys = tuple(
        jnp.zeros((out_cap,), jnp.uint32).at[slot].set(k, mode="drop")
        for k in payload)
    out_counts = jnp.zeros((out_cap,), counts.dtype).at[slot].set(counts, mode="drop")
    n_unique = jnp.sum(live.astype(jnp.int32))
    return out_keys, out_counts, n_unique


class DeviceHashCounter:
    """Fixed-capacity device hash counter for multi-limb keys."""

    def __init__(self, capacity_log2: int, nl: int):
        self.C = 1 << capacity_log2
        self.nl = nl
        # (fp0, fp1, payload limbs...) — one flat array each; see module doc
        self.keys = tuple(jnp.full((self.C,), SENTINEL, jnp.uint32)
                          for _ in range(2 + nl))
        self.counts = jnp.zeros((self.C,), jnp.int32)
        self._ovf = jnp.zeros((), jnp.int32)  # device-side, no sync per batch

    def insert(self, kmers, valid, cap_frac: int = 1) -> None:
        self.keys, self.counts, ovf = _insert(self.keys, self.counts,
                                              kmers, valid,
                                              cap_frac=cap_frac)
        self._ovf = self._ovf + ovf

    def finalize(self, sort: bool = True,
                 out_cap_log2: int | None = None) -> Tuple[np.ndarray, np.ndarray]:
        """Extract (unique keys, counts) to host.

        Device-compacts live entries first (host transfers through this
        rig's relay run ~10 MB/s).  out_cap bounds the compacted shape
        (static); raises if exceeded or if any insert overflowed.
        sort=False skips the host lexsort."""
        ovf = int(self._ovf)
        if ovf:
            raise RuntimeError(
                f"DeviceHashCounter overflow ({ovf} lanes); "
                f"increase capacity (current {self.C})")
        use_compact = os.environ.get("TA_HASH_COMPACT", "1") == "1"
        if use_compact:
            if out_cap_log2 is None:
                out_cap_log2 = max(self.C.bit_length() - 3, 10)
            out_keys, out_counts, n_unique = _compact(self.keys, self.counts,
                                                      1 << out_cap_log2)
            n = int(n_unique)
            if n > (1 << out_cap_log2):
                raise RuntimeError(
                    f"DeviceHashCounter compaction overflow: {n} unique > "
                    f"capacity {1 << out_cap_log2}; raise out_cap_log2")
            k = np.stack([np.asarray(ok[:n]) for ok in out_keys], axis=1)
            c = np.asarray(out_counts[:n], np.int64)
        else:
            keys = np.stack([np.asarray(kk) for kk in self.keys[2:]], axis=1)
            counts = np.asarray(self.counts)
            live = counts > 0
            k = keys[live]
            c = counts[live].astype(np.int64)
        if sort:
            order = lb.np_lexsort_rows(k)
            return np.ascontiguousarray(k[order]), c[order]
        return k, c
