"""Full-width scan lowering of the framework's single alignment DP.

Do not call directly — go through ops/dp.py (affine_scores), which
dispatches between this lowering (CPU backend) and the Pallas banded
kernel (ops/pallas_align.py, TPU backend).  Both lower the same
affine-gap recurrence; linear gaps are the go=0 degenerate case (the
reference bubble DP, src/basic_resolve.c:929-953) and BWA's
ksw_global2 scoring is (1, -2, 3, 1) (src/barcode_builder.c:38-75).

Formulation: one pair per batch lane, sequential scan over query rows,
full vectorization over (batch, target) on the VPU.  The in-row
dependency (gap chains) is folded into an associative running max:
  row[j] = max_t<=j ( b[t] - gap*(j-t) )  =  cummax(b + gap*j) - gap*j
so each row is two vector ops + one scan — no per-cell loop.

All shapes static: sequences padded with 255 (never matches), lengths
carried separately; scores read out at (qlen, tlen) via gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG = jnp.int32(-(1 << 20))


@functools.partial(jax.jit, static_argnames=("match", "mismatch", "gap_open",
                                             "gap_ext", "mode"))
def affine_global_score_batch(q, qlen, t, tlen, match: int = 1,
                              mismatch: int = -2, gap_open: int = 3,
                              gap_ext: int = 1, mode: str = "global"):
    """Affine-gap (Gotoh) alignment score per pair.

    Gap of length L costs gap_open + gap_ext*L (ksw_global2-compatible
    scoring used by asm_get_score, reference src/barcode_builder.c:38-75).

    mode "global": end-to-end on both sequences (score at (qlen, tlen)).
    mode "fit":    query global, target-end gaps free — the alignment may
                   start/end anywhere on the target (score = max over the
                   qlen row).  This is the read-vs-contig-window shape:
                   the reference aligns against BWA's exact [rb, re)
                   extents, which we don't know; a free-slack window is
                   the equivalent formulation.

    In-row horizontal-gap dependency is closed in O(scan): because a
    second gap-open inside a gap is always dominated by extending the
    first, F[j] = max_{t<j}(b[t]) - go - ge*(j-t), a cummax with linear
    decay over the pre-horizontal candidates b.
    """
    B, Lq = q.shape
    Lt = t.shape[1]
    jj = jnp.arange(Lt + 1, dtype=jnp.int32)
    go, ge = jnp.int32(gap_open), jnp.int32(gap_ext)

    if mode == "fit":
        h0 = jnp.zeros((Lt + 1,), jnp.int32)
    else:
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
    if mode == "fit":
        row = all_rows[qlen, bidx]                       # (B, Lt+1)
        return jnp.max(jnp.where(jj[None, :] <= tlen[:, None], row, NEG),
                       axis=1)
    return all_rows[qlen, bidx, tlen]
