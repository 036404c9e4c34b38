"""Unit tests for the limb codec and k-mer window extraction.

Reference behaviors mirrored: canonical = min(kmer, revcomp) under
A0 C1 G2 T3 with complement 3-x (src/kmer.h:115-127); (k+1)-mer split
into left/right k-mers (src/kmer.h:81-101, kmer_build.c:78-129).
"""

import numpy as np
import pytest

from turingassembler_tpu.ops import limbs as lb
from turingassembler_tpu.ops import kmers as km
from turingassembler_tpu.ops import sortops as so

rng = np.random.default_rng(0)

ACGT = np.array(list("ACGT"))


def seq_str(codes):
    return "".join(ACGT[c] for c in codes)


def ref_revcomp(codes):
    return (3 - codes)[::-1]


def ref_pack_value(codes):
    """Interpret base string as big int, first base most significant."""
    v = 0
    for c in codes:
        v = (v << 2) | int(c)
    return v


def limbs_to_value(row, k):
    """Convert limb row -> big int for comparison with ref_pack_value."""
    nl = lb.n_limbs(k)
    v = 0
    for l in range(nl):
        v = (v << 32) | int(row[l])
    # drop pad bits
    return v >> (32 * nl - 2 * k)


@pytest.mark.parametrize("k", [15, 16, 17, 31, 32, 45, 46, 63])
def test_pack_unpack_roundtrip(k):
    bases = rng.integers(0, 4, size=(20, k)).astype(np.uint8)
    packed = np.asarray(lb.pack_bases(bases, k))
    un = np.asarray(lb.unpack_limbs(packed, k))
    np.testing.assert_array_equal(bases, un)
    # numeric value matches big-int packing
    for i in range(5):
        assert limbs_to_value(packed[i], k) == ref_pack_value(bases[i])


@pytest.mark.parametrize("k", [15, 16, 31, 45, 46, 63])
def test_revcomp(k):
    bases = rng.integers(0, 4, size=(50, k)).astype(np.uint8)
    packed = np.asarray(lb.pack_bases(bases, k))
    rc = np.asarray(lb.revcomp_limbs(packed, k))
    expect = np.asarray(lb.pack_bases(np.stack([ref_revcomp(b) for b in bases]), k))
    np.testing.assert_array_equal(rc, expect)
    # numpy twin agrees
    np.testing.assert_array_equal(lb.np_revcomp_limbs(packed, k), expect)


@pytest.mark.parametrize("k", [15, 31, 45, 46])
def test_lex_order_matches_string_order(k):
    bases = rng.integers(0, 4, size=(100, k)).astype(np.uint8)
    packed = np.asarray(lb.pack_bases(bases, k))
    strs = [seq_str(b) for b in bases]
    ii = np.arange(0, 100, 7)
    jj = np.arange(1, 100, 13)
    a = np.repeat(packed[ii], len(jj), axis=0)
    b = np.tile(packed[jj], (len(ii), 1))
    want = np.array([strs[i] < strs[j] for i in ii for j in jj])
    got = np.asarray(lb.lex_lt(a, b))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(lb.np_lex_lt(a, b), want)


@pytest.mark.parametrize("k", [21, 45, 46])
def test_extract_canonical_kmers(k):
    B, L = 8, 80
    bases = rng.integers(0, 4, size=(B, L)).astype(np.uint8)
    lengths = rng.integers(k, L + 1, size=(B,)).astype(np.int32)
    # sprinkle Ns
    bases[0, 10] = 4
    canon, is_rc, valid = km.extract_canonical_kmers(bases, lengths, k)
    canon, is_rc, valid = map(np.asarray, (canon, is_rc, valid))
    P = L - k + 1
    assert canon.shape == (B, P, lb.n_limbs(k))
    decoded = lb.np_unpack_limbs(canon, k)  # (B, P, k)
    for b in range(B):
        for p in range(P):
            window = bases[b, p : p + k]
            want_valid = (p + k <= lengths[b]) and (window < 4).all()
            assert valid[b, p] == want_valid
            if not want_valid:
                continue
            fw = seq_str(window)
            rc = seq_str(ref_revcomp(window))
            want = min(fw, rc)
            got = seq_str(decoded[b, p])
            assert got == want
            assert bool(is_rc[b, p]) == (rc < fw)


@pytest.mark.parametrize("k", [31, 45])
def test_split_kedge(k):
    bases = rng.integers(0, 4, size=(30, k + 1)).astype(np.uint8)
    kedges = np.asarray(lb.pack_bases(bases, k + 1))
    pre, suf = km.split_kedge(kedges, k)
    np.testing.assert_array_equal(np.asarray(pre), np.asarray(lb.pack_bases(bases[:, :k], k)))
    np.testing.assert_array_equal(np.asarray(suf), np.asarray(lb.pack_bases(bases[:, 1:], k)))
    np.testing.assert_array_equal(np.asarray(km.kedge_first_base(kedges)), bases[:, 0])
    np.testing.assert_array_equal(np.asarray(km.kedge_last_base(kedges, k)), bases[:, k])


def test_sort_unique_count():
    k = 31
    n = 1000
    pool = rng.integers(0, 4, size=(17, k)).astype(np.uint8)
    picks = rng.integers(0, 17, size=n)
    bases = pool[picks]
    packed = np.asarray(lb.pack_bases(bases, k))
    valid = rng.random(n) < 0.9
    uniq, counts, n_unique = so.sort_unique_count(packed, valid)
    uniq, counts, n_unique = np.asarray(uniq), np.asarray(counts), int(n_unique)
    # ground truth via python dict on tuples
    want = {}
    for i in range(n):
        if valid[i]:
            want[tuple(packed[i])] = want.get(tuple(packed[i]), 0) + 1
    assert n_unique == len(want)
    got = {tuple(uniq[i]): int(counts[i]) for i in range(n_unique)}
    assert got == want
    # sorted order
    for i in range(1, n_unique):
        assert tuple(uniq[i - 1]) < tuple(uniq[i])


def test_searchsorted_limbs():
    k = 45
    table_bases = rng.integers(0, 4, size=(200, k)).astype(np.uint8)
    packed = np.asarray(lb.pack_bases(table_bases, k))
    order = lb.np_lexsort_rows(packed)
    table = packed[order]
    # dedupe
    keep = np.ones(len(table), bool)
    keep[1:] = np.any(table[1:] != table[:-1], axis=1)
    table = table[keep]
    queries = np.concatenate([table[::3], np.asarray(lb.pack_bases(rng.integers(0, 4, size=(50, k)).astype(np.uint8), k))])
    idx, found = so.searchsorted_limbs(table, queries)
    idx, found = np.asarray(idx), np.asarray(found)
    tset = {tuple(r): i for i, r in enumerate(table)}
    for q in range(len(queries)):
        key = tuple(queries[q])
        if key in tset:
            assert found[q] and idx[q] == tset[key]
        else:
            assert not found[q]


def test_np_merge_count_runs():
    k = 31
    a = np.asarray(lb.pack_bases(rng.integers(0, 4, size=(40, k)).astype(np.uint8), k))
    runs = []
    want = {}
    for _ in range(3):
        picks = rng.integers(0, 40, size=100)
        sub = a[picks]
        order = lb.np_lexsort_rows(sub)
        sub = sub[order]
        starts = np.ones(len(sub), bool)
        starts[1:] = np.any(sub[1:] != sub[:-1], axis=1)
        idx = np.flatnonzero(starts)
        cnts = np.add.reduceat(np.ones(len(sub), np.int64), idx)
        runs.append((sub[idx], cnts))
        for p in picks:
            want[tuple(a[p])] = want.get(tuple(a[p]), 0) + 1
    ml, mc = so.np_merge_count_runs(runs)
    got = {tuple(ml[i]): int(mc[i]) for i in range(len(ml))}
    assert got == want
