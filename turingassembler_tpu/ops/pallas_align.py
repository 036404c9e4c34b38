"""Pallas affine-gap alignment kernel (TPU production DP).

The single DP kernel the rebuild plan names for both alignment users
(SURVEY.md §2.13.7): BWA's ksw_global2 rescoring (barcode aux info,
path scoring) and the bubble NW check.  One grid step = G=8 sequence
pairs (the 8-sublane x 128-lane VPU tile).

Layout is COLUMN-coordinate full-width NW rather than a sliding band:
Mosaic requires dynamic lane offsets to be 128-aligned, so a band that
slides one lane per row cannot be loaded from VMEM — instead the
target stays fixed in lanes (padded to a 128 multiple) and the DP
state shifts by static one-lane steps:

  H[i][c] = max(H[i-1][c-1] + subst(q_i, t_c), E[i][c], F[i][c])
  E[i][c] = max(H[i-1][c] - go - ge, E[i-1][c] - ge)   (vertical)
  F[i][c] = max_{u<c}(pre[u] + ge*u) - go - ge*c       (horizontal)

The in-row F chain is closed with the same one-gap-open dominance
cummax used by ops/align.py (a Hillis-Steele shift-max, log2(C) vector
steps), so each row is pure vector work.  The row's query char is
extracted with a one-hot lane reduction (dynamic gather is not
lowerable; the reduction is).  Full width means the result is exact
for ANY divergence — the `W` parameter is kept for API compatibility
and as the scan/pallas switch but no longer bounds the search.

Inputs are padded uint8 code batches (255 = sentinel); scores are read
at (qlen, tlen).  `interpret=True` is used on CPU (tests); on TPU the
kernel compiles once per (B, Lq, Lt) shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(1 << 20)  # plain int: pallas kernels must not capture Array constants
G = 8             # pairs per grid step (VPU sublanes)


def _nw_kernel(q_ref, t_ref, qlen_ref, tlen_ref, out_ref,
               h_ref, e_ref, best_ref, *,
               match: int, mismatch: int, go: int, ge: int, Lq: int, Lt: int,
               C: int, mode: str):
    cc = jax.lax.broadcasted_iota(jnp.int32, (G, C), 1)
    goge = jnp.int32(go + ge)

    qlen = qlen_ref[:, 0:1]        # (G, 1)
    tlen = tlen_ref[:, 0:1]
    q_all = q_ref[...]             # (G, Lq) int32, 255-padded
    tch = t_ref[...]               # (G, C) int32; tch[:, c] = t[c-1], 255 pad

    # row 0: H[0][c] = cost of a target-prefix gap of c;
    # fit mode: free target-start gap, H[0][c] = 0 for every column
    if mode == "fit":
        h0 = jnp.where(cc <= Lt, 0, NEG).astype(jnp.int32)
    else:
        h0 = jnp.where(cc == 0, 0,
                       jnp.where(cc <= Lt, -(go + ge * cc), NEG)
                       ).astype(jnp.int32)
    e0 = jnp.full((G, C), NEG, jnp.int32)
    neg_col = jnp.full((G, 1), NEG, jnp.int32)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (G, Lq), 1)

    # DP state lives in VMEM scratch refs, not fori_loop carries: the
    # inits are iota/constant expressions whose (replicated) vector
    # layouts cannot unify with the body outputs' concrete layouts
    def row(i, _):
        h_prev = h_ref[...]
        e_prev = e_ref[...]
        # query char of row i (1-based => q[i-1]) via one-hot reduction
        qi = jnp.sum(jnp.where(qpos == i - 1, q_all, 0), axis=1,
                     keepdims=True)                       # (G, 1)
        sub = jnp.where((tch == qi) & (tch < 4) & (qi < 4), match, mismatch)
        # E: vertical gap — same column, previous row
        e = jnp.maximum(e_prev - ge, h_prev - goge)
        # diagonal: previous row, previous column (static one-lane shift)
        hd = jnp.concatenate([neg_col, h_prev[:, :-1]], axis=1)
        b = jnp.maximum(hd + sub, e)
        # boundary: column 0 at row i = query-prefix gap
        b = jnp.where(cc == 0, -(go + ge * i), b)
        b = jnp.where(cc > Lt, NEG, b)
        # F: horizontal via cummax with decay along the row
        # (Hillis-Steele shift-max: log2(C) static lane shifts)
        cm = b + ge * cc
        off = 1
        while off < C:
            cm = jnp.maximum(
                cm, jnp.concatenate(
                    [jnp.full((G, off), NEG, jnp.int32), cm[:, :-off]],
                    axis=1))
            off <<= 1
        f = jnp.concatenate([neg_col, cm[:, :-1]], axis=1) - go - ge * cc
        h = jnp.maximum(b, f)
        h = jnp.where(cc > Lt, NEG, h)
        # capture: global reads (qlen, tlen); fit takes the best cell of
        # the qlen row at any column <= tlen (free target tail)
        if mode == "fit":
            at = (i == qlen) & (cc <= tlen)
        else:
            at = (i == qlen) & (cc == tlen)
        h_ref[...] = h
        e_ref[...] = e
        best_ref[...] = jnp.maximum(
            best_ref[...], jnp.max(jnp.where(at, h, NEG), axis=1,
                                   keepdims=True))
        return 0

    if mode == "fit":
        best0 = jnp.max(jnp.where((qlen == 0) & (cc <= tlen), h0, NEG),
                        axis=1, keepdims=True)
    else:
        best0 = jnp.max(jnp.where((qlen == 0) & (cc == tlen), h0, NEG),
                        axis=1, keepdims=True)
    h_ref[...] = h0
    e_ref[...] = e0
    best_ref[...] = best0
    jax.lax.fori_loop(1, Lq + 1, row, 0)
    out_ref[...] = best_ref[...]


@functools.partial(jax.jit,
                   static_argnames=("W", "match", "mismatch", "go", "ge",
                                    "interpret", "mode"))
def banded_affine_score(q, qlen, t, tlen, W: int = 128, match: int = 1,
                        mismatch: int = -2, go: int = 3, ge: int = 1,
                        interpret: bool = False, mode: str = "global"):
    """Affine-gap score per pair ("global" or "fit" — see ops/align.py
    for the mode semantics).

    q (B, Lq) uint8, t (B, Lt) uint8, qlen/tlen (B,) int32; returns (B,)
    int32.  B is padded up to a multiple of 8 internally (TPU sublane
    tile); the target axis is padded to a 128-lane multiple.  Exact for
    any divergence (full-width DP; `W` kept for API compatibility)."""
    B, Lq = q.shape
    Lt = t.shape[1]
    Bp = -(-B // G) * G
    if Bp != B:
        q = jnp.concatenate(
            [q, jnp.full((Bp - B, Lq), 255, jnp.uint8)], axis=0)
        t = jnp.concatenate(
            [t, jnp.full((Bp - B, Lt), 255, jnp.uint8)], axis=0)
        qlen = jnp.concatenate([qlen, jnp.full(Bp - B, 1, jnp.int32)])
        tlen = jnp.concatenate([tlen, jnp.full(Bp - B, 1, jnp.int32)])
    # column-coordinate target: tch[:, c] = t[c-1] for c in 1..Lt,
    # sentinel elsewhere; lanes padded to a 128 multiple
    C = -(-(Lt + 1) // 128) * 128
    tch = jnp.concatenate([
        jnp.full((Bp, 1), 255, jnp.uint8),
        t.astype(jnp.uint8),
        jnp.full((Bp, C - Lt - 1), 255, jnp.uint8)], axis=1).astype(jnp.int32)
    q32 = q.astype(jnp.int32)
    kernel = functools.partial(_nw_kernel, match=match, mismatch=mismatch,
                               go=go, ge=ge, Lq=Lq, Lt=Lt, C=C, mode=mode)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // G,),
        in_specs=[
            pl.BlockSpec((G, Lq), lambda b: (b, 0)),
            pl.BlockSpec((G, C), lambda b: (b, 0)),
            pl.BlockSpec((G, 1), lambda b: (b, 0)),
            pl.BlockSpec((G, 1), lambda b: (b, 0)),
        ],
        out_specs=pl.BlockSpec((G, 1), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((G, C), jnp.int32),
                        pltpu.VMEM((G, C), jnp.int32),
                        pltpu.VMEM((G, 1), jnp.int32)],
        interpret=interpret,
    )(q32, tch, qlen.reshape(Bp, 1).astype(jnp.int32),
      tlen.reshape(Bp, 1).astype(jnp.int32))
    return out[:B, 0]
