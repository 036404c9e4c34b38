"""The single alignment DP (ops/dp.py) vs brute-force oracles."""

import numpy as np
import pytest

from turingassembler_tpu.ops.align import affine_global_score_batch
from turingassembler_tpu.ops import dp
from turingassembler_tpu.resolve.basic import nw_align_scores_batch

rng = np.random.default_rng(0)


def brute_nw(s1, s2, match=1, mismatch=-1, gap=3):
    m, n = len(s1), len(s2)
    A = np.zeros((m + 1, n + 1), np.int64)
    A[:, 0] = -gap * np.arange(m + 1)
    A[0, :] = -gap * np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            s = match if s1[i - 1] == s2[j - 1] else mismatch
            A[i, j] = max(A[i, j - 1] - gap, A[i - 1, j] - gap, A[i - 1, j - 1] + s)
    return A[m, n]


def brute_affine(s1, s2, match=1, mismatch=-2, go=3, ge=1):
    m, n = len(s1), len(s2)
    NEG = -(1 << 20)
    H = np.full((m + 1, n + 1), NEG, np.int64)
    E = np.full((m + 1, n + 1), NEG, np.int64)
    F = np.full((m + 1, n + 1), NEG, np.int64)
    H[0, 0] = 0
    for j in range(1, n + 1):
        H[0, j] = -(go + ge * j)
    for i in range(1, m + 1):
        H[i, 0] = -(go + ge * i)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            s = match if s1[i - 1] == s2[j - 1] else mismatch
            E[i, j] = max(E[i - 1, j] - ge, H[i - 1, j] - go - ge)
            F[i, j] = max(F[i, j - 1] - ge, H[i, j - 1] - go - ge)
            H[i, j] = max(H[i - 1, j - 1] + s, E[i, j], F[i, j])
    return H[m, n]


def make_batch(B, Lq, Lt, seed=1):
    r = np.random.default_rng(seed)
    qlen = r.integers(5, Lq + 1, B).astype(np.int32)
    tlen = r.integers(5, Lt + 1, B).astype(np.int32)
    q = np.full((B, Lq), 255, np.uint8)
    t = np.full((B, Lt), 255, np.uint8)
    for i in range(B):
        q[i, : qlen[i]] = r.integers(0, 4, qlen[i])
        # make some pairs similar (mutated copies)
        if i % 2 == 0 and tlen[i] >= qlen[i]:
            tlen[i] = qlen[i]
            t[i, : tlen[i]] = q[i, : qlen[i]]
            nmut = r.integers(0, 4)
            for _ in range(nmut):
                p = r.integers(0, tlen[i])
                t[i, p] = (t[i, p] + r.integers(1, 4)) % 4
        else:
            t[i, : tlen[i]] = r.integers(0, 4, tlen[i])
    return q, qlen, t, tlen


def test_linear_gap_is_go0_affine():
    """The bubble scoring (linear gap -3) is the go=0 degenerate case."""
    q, qlen, t, tlen = make_batch(12, 40, 45)
    got = dp.affine_scores(q, qlen, t, tlen, dp.SCORING_BUBBLE,
                           backend="scan")
    for i in range(12):
        want = brute_nw(q[i, : qlen[i]], t[i, : tlen[i]])
        assert got[i] == want, i


def test_bubble_batch_matches_bruteforce():
    pairs = []
    for _ in range(8):
        s1 = rng.integers(0, 4, rng.integers(10, 60)).astype(np.uint8)
        s2 = rng.integers(0, 4, rng.integers(10, 60)).astype(np.uint8)
        pairs.append((s1, s2))
    got = nw_align_scores_batch(pairs)
    for i, (s1, s2) in enumerate(pairs):
        assert got[i] == brute_nw(s1, s2), i


def test_affine_matches_bruteforce():
    q, qlen, t, tlen = make_batch(12, 30, 35, seed=3)
    got = np.asarray(affine_global_score_batch(q, qlen, t, tlen))
    for i in range(12):
        want = brute_affine(q[i, : qlen[i]], t[i, : tlen[i]])
        assert got[i] == want, i


def test_dp_entry_bwa_scoring():
    q, qlen, t, tlen = make_batch(10, 30, 35, seed=5)
    got = dp.affine_scores(q, qlen, t, tlen, dp.SCORING_BWA, backend="scan")
    for i in range(10):
        want = brute_affine(q[i, : qlen[i]], t[i, : tlen[i]])
        assert got[i] == want, i


def test_identical_sequences_score():
    B, L = 4, 30
    q = np.tile(rng.integers(0, 4, L).astype(np.uint8), (B, 1))
    qlen = np.full(B, L, np.int32)
    got = dp.affine_scores(q, qlen, q, qlen, dp.SCORING_BUBBLE,
                           backend="scan")
    np.testing.assert_array_equal(got, np.full(B, L))
    got_a = np.asarray(affine_global_score_batch(q, qlen, q, qlen))
    np.testing.assert_array_equal(got_a, np.full(B, L))


def brute_fit(s1, s2, match=1, mismatch=-2, go=3, ge=1):
    """Query-global / target-free-ends alignment (fit)."""
    m, n = len(s1), len(s2)
    NEG = -(1 << 20)
    H = np.full((m + 1, n + 1), NEG, np.int64)
    E = np.full((m + 1, n + 1), NEG, np.int64)
    F = np.full((m + 1, n + 1), NEG, np.int64)
    H[0, :] = 0
    for i in range(1, m + 1):
        H[i, 0] = -(go + ge * i)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            s = match if s1[i - 1] == s2[j - 1] else mismatch
            E[i, j] = max(E[i - 1, j] - ge, H[i - 1, j] - go - ge)
            F[i, j] = max(F[i, j - 1] - ge, H[i, j - 1] - go - ge)
            H[i, j] = max(H[i - 1, j - 1] + s, E[i, j], F[i, j])
    return H[m].max()


def test_fit_mode_matches_bruteforce():
    q, qlen, t, tlen = make_batch(10, 25, 60, seed=7)
    got = dp.affine_scores(q, qlen, t, tlen, dp.SCORING_BWA, backend="scan",
                           mode="fit")
    for i in range(10):
        want = brute_fit(q[i, : qlen[i]], t[i, : tlen[i]])
        assert got[i] == want, i


def test_fit_mode_window_slack_is_free():
    """A read inside a larger window scores full length in fit mode."""
    r = np.random.default_rng(11)
    read = r.integers(0, 4, 100).astype(np.uint8)
    win = np.concatenate([r.integers(0, 4, 16), read,
                          r.integers(0, 4, 16)]).astype(np.uint8)
    got = dp.affine_scores(read[None], np.array([100], np.int32),
                           win[None], np.array([132], np.int32),
                           dp.SCORING_BWA, backend="scan", mode="fit")
    assert got[0] == 100
