"""Pallas banded affine-gap alignment kernel.

The single DP kernel the rebuild plan names for both alignment users
(SURVEY.md §2.13.7): BWA's ksw_global2 rescoring (barcode aux info,
path scoring) and the bubble NW check.  One grid step = one sequence
pair; the band (static width W, padded to the 128-lane VPU) marches
down the anti-diagonal with the whole band updated per query row:

  band coords: j = column - row + W/2  (diagonal stays at the same j)
  H[i][j] = max(H[i-1][j] + subst, E[i][j], F[i][j])
  E[i][j] = max(H[i-1][j+1], E[i-1][j+1] + go') - go'/ge  (vertical)
  F[i][j] = max_{t<j}(pre[t]) - go - ge*(j-t)             (horizontal)

The in-row F chain is closed with the same one-gap-open dominance
cummax used by ops/align.py, so each row is pure vector work — no
per-cell loop, no MXU, VPU-resident band in VMEM scratch.

Inputs are padded uint8 code batches; scores are read out at
(qlen, tlen), which the caller must keep inside the band
(|tlen - qlen| < W/2).  `interpret=True` is used on CPU (tests); on
TPU the kernel compiles once per (B, Lq, Lt, W) shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

NEG = -(1 << 20)  # plain int: pallas kernels must not capture Array constants


def _band_kernel(q_ref, t_ref, qlen_ref, tlen_ref, out_ref, *, W: int,
                 match: int, mismatch: int, go: int, ge: int, Lq: int, Lt: int,
                 mode: str):
    half = W // 2
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)[0]
    goge = jnp.int32(go + ge)

    qlen = qlen_ref[0]
    tlen = tlen_ref[0]

    # row 0: H[0][j] = gap cost of column (j - half), valid for col >= 0;
    # fit mode: free target-start gap, H[0][col] = 0 for every column
    col0 = jj - half
    if mode == "fit":
        h0 = jnp.where(col0 >= 0, 0, NEG).astype(jnp.int32)
    else:
        h0 = jnp.where(col0 == 0, 0,
                       jnp.where(col0 > 0, -(go + ge * col0), NEG)
                       ).astype(jnp.int32)
    e0 = jnp.full((W,), NEG, jnp.int32)

    t_all = t_ref[0, :]
    q_all = q_ref[0, :]

    def row(i, carry):
        h_prev, e_prev, best = carry
        # qi: query char of row i (1-based row => q[i-1])
        qi = q_all[i - 1].astype(jnp.int32)
        # band j covers column c = i + j - half; target char t[c-1]
        cols = i + jj - half
        tc = jnp.where((cols >= 1) & (cols <= Lt),
                       jnp.take(t_all, jnp.clip(cols - 1, 0, Lt - 1)),
                       jnp.uint8(255)).astype(jnp.int32)
        sub = jnp.where((tc == qi) & (tc < 4) & (qi < 4), match, mismatch)
        # E: vertical — previous row, band index j+1
        h_up = jnp.concatenate([h_prev[1:], jnp.full((1,), NEG, jnp.int32)])
        e_up = jnp.concatenate([e_prev[1:], jnp.full((1,), NEG, jnp.int32)])
        e = jnp.maximum(e_up - ge, h_up - goge)
        # candidates before horizontal gaps: diagonal + vertical
        diag = h_prev + sub
        b = jnp.maximum(diag, e)
        # boundary: column 0 at row i (band idx half - i)
        b = jnp.where(cols == 0, -(go + ge * i), b)
        b = jnp.where((cols < 0) | (cols > Lt), NEG, b)
        # F: horizontal via cummax with decay along the band
        cm = jax.lax.associative_scan(jnp.maximum, b + ge * jj)
        f = jnp.concatenate([jnp.full((1,), NEG, jnp.int32), cm[:-1]]) \
            - go - ge * jj
        h = jnp.maximum(b, f)
        h = jnp.where((cols < 0) | (cols > Lt), NEG, h)
        # capture score: global reads (qlen, tlen); fit takes the best
        # cell of the qlen row at any column <= tlen (free target tail)
        if mode == "fit":
            at = (i == qlen) & (cols <= tlen)
        else:
            at = (i == qlen) & (jj == (tlen - i + half))
        best = jnp.maximum(best, jnp.max(jnp.where(at, h, NEG)))
        return h, e, best

    if mode == "fit":
        best0 = jnp.max(jnp.where((qlen == 0) & (col0 <= tlen), h0, NEG))
    else:
        best0 = jnp.max(jnp.where((jj == (tlen + half)) & (qlen == 0), h0, NEG))
    h, e, best = jax.lax.fori_loop(
        1, Lq + 1,
        lambda i, c: jax.lax.cond(i <= qlen, lambda cc: row(i, cc),
                                  lambda cc: cc, c),
        (h0, e0, best0))
    out_ref[0] = best


@functools.partial(jax.jit,
                   static_argnames=("W", "match", "mismatch", "go", "ge",
                                    "interpret", "mode"))
def banded_affine_score(q, qlen, t, tlen, W: int = 128, match: int = 1,
                        mismatch: int = -2, go: int = 3, ge: int = 1,
                        interpret: bool = False, mode: str = "global"):
    """Banded affine-gap score per pair ("global" or "fit" — see
    ops/align.py for the mode semantics).

    q (B, Lq) uint8, t (B, Lt) uint8, qlen/tlen (B,) int32.
    Requires |tlen - qlen| < W//2 per pair (caller-checked); returns -inf
    sentinel scores otherwise.
    """
    B, Lq = q.shape
    Lt = t.shape[1]
    kernel = functools.partial(_band_kernel, W=W, match=match,
                               mismatch=mismatch, go=go, ge=ge, Lq=Lq, Lt=Lt,
                               mode=mode)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Lq), lambda b: (b, 0)),
            pl.BlockSpec((1, Lt), lambda b: (b, 0)),
            pl.BlockSpec((1,), lambda b: (b,)),
            pl.BlockSpec((1,), lambda b: (b,)),
        ],
        out_specs=pl.BlockSpec((1,), lambda b: (b,)),
        out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
        interpret=interpret,
    )(q.reshape(B, Lq), t.reshape(B, Lt), qlen, tlen)
    return out
