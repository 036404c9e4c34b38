"""Pallas banded DP (interpret mode) vs the dense affine DP."""

import numpy as np
import pytest

from turingassembler_tpu.ops.align import affine_global_score_batch
from turingassembler_tpu.ops.pallas_align import banded_affine_score

rng = np.random.default_rng(0)


def make_inband_batch(B, Lq, Lt, W):
    q = np.full((B, Lq), 255, np.uint8)
    t = np.full((B, Lt), 255, np.uint8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for i in range(B):
        ql = int(rng.integers(10, Lq + 1))
        dmax = W // 2 - 1
        tl = int(np.clip(ql + rng.integers(-dmax, dmax + 1), 1, Lt))
        qlen[i], tlen[i] = ql, tl
        base = rng.integers(0, 4, max(ql, tl)).astype(np.uint8)
        qq = base[:ql].copy()
        tt = base[:tl].copy()
        for _ in range(int(rng.integers(0, 4))):  # few mutations
            p = rng.integers(0, tl)
            tt[p] = (tt[p] + rng.integers(1, 4)) % 4
        q[i, :ql] = qq
        t[i, :tl] = tt
    return q, qlen, t, tlen


@pytest.mark.parametrize("W", [32, 64])
def test_banded_matches_dense_for_similar_pairs(W):
    B, Lq, Lt = 8, 60, 70
    q, qlen, t, tlen = make_inband_batch(B, Lq, Lt, W)
    dense = np.asarray(affine_global_score_batch(q, qlen, t, tlen))
    band = np.asarray(banded_affine_score(q, qlen, t, tlen, W=W,
                                          interpret=True))
    # for near-identical pairs the optimal path stays inside the band
    np.testing.assert_array_equal(band, dense)


def test_banded_identical():
    B, L = 4, 40
    q = np.tile(rng.integers(0, 4, L).astype(np.uint8), (B, 1))
    ql = np.full(B, L, np.int32)
    out = np.asarray(banded_affine_score(q, ql, q, ql, W=32, interpret=True))
    np.testing.assert_array_equal(out, np.full(B, L))


@pytest.mark.parametrize("W", [64])
def test_banded_fit_matches_dense_fit(W):
    from turingassembler_tpu.ops.align import affine_global_score_batch
    B, Lq, Lt = 8, 40, 80
    r = np.random.default_rng(3)
    q = np.full((B, Lq), 255, np.uint8)
    t = np.full((B, Lt), 255, np.uint8)
    qlen = np.zeros(B, np.int32)
    tlen = np.zeros(B, np.int32)
    for i in range(B):
        ql = int(r.integers(15, Lq + 1))
        tl = int(r.integers(ql, Lt + 1))
        off = int(r.integers(0, min(tl - ql + 1, W // 2 - 2)))
        qlen[i], tlen[i] = ql, tl
        tt = r.integers(0, 4, tl).astype(np.uint8)
        qq = tt[off : off + ql].copy()
        for _ in range(int(r.integers(0, 3))):
            p = r.integers(0, ql)
            qq[p] = (qq[p] + r.integers(1, 4)) % 4
        q[i, :ql] = qq
        t[i, :tl] = tt
    dense = np.asarray(affine_global_score_batch(q, qlen, t, tlen,
                                                 mode="fit"))
    band = np.asarray(banded_affine_score(q, qlen, t, tlen, W=W,
                                          interpret=True, mode="fit"))
    np.testing.assert_array_equal(band, dense)
