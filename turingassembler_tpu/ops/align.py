"""Batched sequence-alignment DPs on device.

Replaces two native DP users of the reference (SURVEY.md §2.13.7):
  - the bubble NW check (src/basic_resolve.c:929-953: match +1,
    mismatch -1, linear gap -3),
  - BWA's banded global rescoring ksw_global2 (called via asm_get_score,
    src/barcode_builder.c:448-563: match 1, mismatch -2, gap open 3,
    gap extend 1).

Formulation: one pair per batch lane, sequential scan over query rows,
full vectorization over (batch, target) on the VPU.  The in-row
dependency (gap chains) is folded into an associative running max:
  row[j] = max_t<=j ( b[t] - gap*(j-t) )  =  cummax(b + gap*j) - gap*j
so each row is two vector ops + one scan — no per-cell loop.  This is
the TPU-native shape of the DP; the same recurrence can later drop into
a Pallas kernel with double-buffered rows if XLA fusion leaves
bandwidth on the table.

All shapes static: sequences padded with 255 (never matches), lengths
carried separately; scores read out at (qlen, tlen) via gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG = jnp.int32(-(1 << 20))


def _row_scan_max(b, gap):
    """row[j] = max_{t<=j}(b[t] - gap*(j-t)) along last axis."""
    n = b.shape[-1]
    j = jnp.arange(n, dtype=b.dtype)
    t = b + gap * j
    m = jax.lax.associative_scan(jnp.maximum, t, axis=-1)
    return m - gap * j


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap"))
def nw_score_batch(q, qlen, t, tlen, match: int = 1, mismatch: int = -1,
                   gap: int = 3):
    """Global (NW) score for each pair, linear gap penalty.

    q: (B, Lq) uint8 codes (255 pad); t: (B, Lt).
    Matches the reference bubble DP exactly on unpadded lengths.
    """
    B, Lq = q.shape
    Lt = t.shape[1]
    j = jnp.arange(Lt + 1, dtype=jnp.int32)

    init = -gap * j[None, :].astype(jnp.int32) * jnp.ones((B, 1), jnp.int32)

    def step(prev, qi):
        # qi: (B,) query char at row i (i>=1); prev: (B, Lt+1)
        sc = jnp.where((t == qi[:, None]) & (t < 4) & (qi[:, None] < 4),
                       match, mismatch).astype(jnp.int32)
        b = jnp.concatenate([
            prev[:, :1] - gap,
            jnp.maximum(prev[:, 1:] - gap, prev[:, :-1] + sc),
        ], axis=1)
        row = _row_scan_max(b, jnp.int32(gap))
        return row, row

    qT = q.T.astype(jnp.int32)  # (Lq, B)
    last, rows = jax.lax.scan(step, init, qT)
    # rows: (Lq, B, Lt+1); score at (qlen, tlen); qlen>=1 assumed
    all_rows = jnp.concatenate([init[None], rows], axis=0)  # (Lq+1, B, Lt+1)
    bidx = jnp.arange(B)
    return all_rows[qlen, bidx, tlen]


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap_open", "gap_ext"))
def affine_global_score_batch(q, qlen, t, tlen, match: int = 1,
                              mismatch: int = -2, gap_open: int = 3,
                              gap_ext: int = 1):
    """Affine-gap (Gotoh) global alignment score per pair.

    Gap of length L costs gap_open + gap_ext*L (ksw_global2-compatible
    scoring used by asm_get_score, reference src/barcode_builder.c:38-75).

    In-row horizontal-gap dependency is closed in O(scan): because a
    second gap-open inside a gap is always dominated by extending the
    first, F[j] = max_{t<j}(b[t]) - go - ge*(j-t), a cummax with linear
    decay over the pre-horizontal candidates b.
    """
    B, Lq = q.shape
    Lt = t.shape[1]
    jj = jnp.arange(Lt + 1, dtype=jnp.int32)
    go, ge = jnp.int32(gap_open), jnp.int32(gap_ext)

    h0 = jnp.where(jj == 0, 0, -(go + ge * jj)).astype(jnp.int32)
    h0 = jnp.broadcast_to(h0, (B, Lt + 1))
    e0 = jnp.full((B, Lt + 1), NEG, jnp.int32)

    def step(carry, qi):
        h_prev, e_prev, i = carry  # row i-1 values; producing row i (1-based)
        sc = jnp.where((t == qi[:, None]) & (t < 4) & (qi[:, None] < 4),
                       match, mismatch).astype(jnp.int32)
        # E (vertical gap, consumes query): from previous row
        e = jnp.maximum(e_prev - ge, h_prev - go - ge)
        # pre-horizontal candidates: diagonal or vertical; b[0] = boundary
        b = jnp.concatenate([
            (-(go + ge * (i + 1))) * jnp.ones((B, 1), jnp.int32),
            jnp.maximum(e[:, 1:], h_prev[:, :-1] + sc),
        ], axis=1)
        # F (horizontal gap): one open from the best earlier b
        c = jax.lax.associative_scan(jnp.maximum, b + ge * jj, axis=-1)
        f = jnp.concatenate([jnp.full((B, 1), NEG, jnp.int32), c[:, :-1]],
                            axis=1) - go - ge * jj
        h = jnp.maximum(b, f)
        return (h, e, i + 1), h

    qT = q.T.astype(jnp.int32)
    (_, _, _), hs = jax.lax.scan(step, (h0, e0, jnp.int32(0)), qT)
    all_rows = jnp.concatenate([h0[None], hs], axis=0)
    bidx = jnp.arange(B)
    return all_rows[qlen, bidx, tlen]
