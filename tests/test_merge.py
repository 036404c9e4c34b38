"""Device LSM merge vs dict oracle."""

import numpy as np

from turingassembler_tpu.ops import limbs as lb
from turingassembler_tpu.ops.merge import (
    SENTINEL,
    DeviceCountAccumulator,
    merge_runs,
    rank_in,
)

rng = np.random.default_rng(0)


def make_run(keys_pool, n, cap, nl):
    picks = keys_pool[rng.integers(0, len(keys_pool), n)]
    order = lb.np_lexsort_rows(picks)
    picks = picks[order]
    starts = np.ones(n, bool)
    starts[1:] = np.any(picks[1:] != picks[:-1], axis=1)
    idx = np.flatnonzero(starts)
    cnts = np.add.reduceat(np.ones(n, np.int32), idx)
    u = picks[idx]
    keys = np.full((cap, nl), SENTINEL, np.uint32)
    counts = np.zeros(cap, np.int32)
    keys[: len(u)] = u
    counts[: len(u)] = cnts
    return keys, counts, {tuple(r): int(c) for r, c in zip(u, cnts)}


def test_rank_in():
    nl = 2
    pool = np.unique(rng.integers(0, 50, (40, nl)).astype(np.uint32), axis=0)
    order = lb.np_lexsort_rows(pool)
    table = pool[order]
    q = rng.integers(0, 50, (30, nl)).astype(np.uint32)
    left = np.asarray(rank_in(table, q, "left"))
    right = np.asarray(rank_in(table, q, "right"))
    tl = [tuple(r) for r in table]
    for i in range(len(q)):
        key = tuple(q[i])
        assert left[i] == sum(1 for r in tl if r < key)
        assert right[i] == sum(1 for r in tl if r <= key)


def test_merge_runs_oracle():
    nl = 3
    pool = rng.integers(0, 2**32, (60, nl), dtype=np.uint32)
    a, ca, da = make_run(pool, 150, 256, nl)
    b, cb, db = make_run(pool, 90, 128, nl)
    keys, counts, n_unique = merge_runs(a, ca, b, cb)
    keys, counts, n = np.asarray(keys), np.asarray(counts), int(n_unique)
    want = dict(da)
    for k, v in db.items():
        want[k] = want.get(k, 0) + v
    got = {tuple(keys[i]): int(counts[i]) for i in range(n)}
    assert got == want
    # sorted + sentinel tail
    for i in range(1, n):
        assert tuple(keys[i - 1]) < tuple(keys[i])
    assert np.all(keys[n:] == np.uint32(SENTINEL))
    assert np.all(counts[n:] == 0)


def test_accumulator_many_runs():
    nl = 2
    pool = rng.integers(0, 2**32, (500, nl), dtype=np.uint32)
    acc = DeviceCountAccumulator()
    want = {}
    for _ in range(7):
        keys, counts, d = make_run(pool, 200, 256, nl)
        for k, v in d.items():
            want[k] = want.get(k, 0) + v
        acc.add_run(keys, counts)
    keys, counts = acc.finalize()
    got = {tuple(keys[i]): int(counts[i]) for i in range(len(keys))}
    assert got == want
