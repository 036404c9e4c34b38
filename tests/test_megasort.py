"""Megasort count engine + device graph build vs the oracle paths."""

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.kmer import count as kc
from turingassembler_tpu.kmer.megasort import (
    count_kedges_megasort, count_reads_device, pull_rows)
from turingassembler_tpu.graph.build import build_graph_from_kedges
from turingassembler_tpu.graph.device_build import build_graph_on_device
from turingassembler_tpu.graph.invariants import check_graph


def _batches(reads, lengths, bs):
    for i in range(0, len(reads), bs):
        yield reads[i:i + bs], lengths[i:i + bs]


@pytest.mark.parametrize("k", [45, 31, 21])
def test_megasort_matches_np_engine(k):
    genome = tt.random_genome(20_000, seed=3)
    reads, lengths = tt.sim_reads(genome, coverage=8, read_len=100, seed=4,
                                  error_rate=0.01)
    kn, cn = kc.count_kedges_from_reads(reads, lengths, k, engine="np")
    km_, cm = count_kedges_megasort(_batches(reads, lengths, 512), k)
    assert len(kn) == len(km_)
    assert np.array_equal(kn, km_)
    assert np.array_equal(cn.astype(np.int64), cm.astype(np.int64))


def test_megasort_k31_all_t_sentinel_tie():
    """k=31 -> (k+1)=32: a real all-T 32-mer is bit-identical to the
    sentinel; the validity sort column must keep them apart."""
    k = 31
    # reads of pure T produce the all-T kedge; plus pad/invalid lanes
    reads = np.full((8, 64), 3, np.uint8)
    reads[4:, 40:] = 255                      # truncated reads
    lengths = np.array([64] * 4 + [40] * 4, np.int32)
    kn, cn = kc.count_kedges_from_reads(reads, lengths, k, engine="np")
    km_, cm = count_kedges_megasort(_batches(reads, lengths, 4), k)
    assert np.array_equal(kn, km_)
    assert np.array_equal(cn.astype(np.int64), cm.astype(np.int64))


def test_megasort_streaming_flushes_merge():
    """Force several LSM flushes + merges with a tiny lane budget."""
    genome = tt.random_genome(8_000, seed=7)
    reads, lengths = tt.sim_reads(genome, coverage=10, read_len=80, seed=8)
    kn, cn = kc.count_kedges_from_reads(reads, lengths, 45, engine="np")
    km_, cm = count_kedges_megasort(_batches(reads, lengths, 64), 45,
                                    max_lanes=2_000)
    assert np.array_equal(kn, km_)
    assert np.array_equal(cn.astype(np.int64), cm.astype(np.int64))


def test_megasort_spill_byte_identical(tmp_path, monkeypatch):
    """Tiny device/host budgets force device->host run spills AND
    host->disk spills with the external k-way merge; results must be
    byte-identical to the all-in-memory path (the -sm posture,
    reference src/main.c:234-236 + sort_read.c:567-658)."""
    import os
    genome = tt.random_genome(20_000, seed=9)
    reads, lengths = tt.sim_reads(genome, coverage=8, read_len=100, seed=10,
                                  error_rate=0.005)
    k = 31
    ref_k, ref_c = count_kedges_megasort(_batches(reads, lengths, 512), k,
                                         max_lanes=1 << 15, min_count=2)
    spill = tmp_path / "spill"
    monkeypatch.setenv("TA_SORT_DEVICE_LANES", "4096")
    monkeypatch.setenv("TA_SORT_HOST_MB", "0.05")     # ~50 KB -> disk
    monkeypatch.setenv("TA_SPILL_DIR", str(spill))
    got_k, got_c = count_kedges_megasort(_batches(reads, lengths, 512), k,
                                         max_lanes=1 << 15, min_count=2)
    assert any(f.startswith("count_run") for f in os.listdir(spill)), \
        "expected disk-spilled runs"
    np.testing.assert_array_equal(np.asarray(got_k), ref_k)
    np.testing.assert_array_equal(np.asarray(got_c, np.int64), ref_c)


def test_megasort_out_cap_overflow_recovers():
    """More uniques than TA_SORT_OUT_LOG2 allows must NOT raise: the
    flush re-extracts its retained ship records and re-sorts wider, and
    the table pre-spills to a host run before any merge could truncate.
    Regression for the 6.3M-unique hard-fail (out_cap 2^22)."""
    genome = tt.random_genome(30_000, seed=13)
    reads, lengths = tt.sim_reads(genome, coverage=8, read_len=100, seed=14,
                                  error_rate=0.01)
    kn, cn = kc.count_kedges_from_reads(reads, lengths, 31, engine="np")
    assert len(kn) > 4096            # far above the forced cap below
    km_, cm = count_kedges_megasort(_batches(reads, lengths, 512), 31,
                                    out_cap_log2=10, max_lanes=1 << 13)
    assert np.array_equal(kn, np.asarray(km_))
    assert np.array_equal(cn.astype(np.int64), np.asarray(cm, np.int64))


def test_external_merge_oracle():
    """np_external_merge_runs vs np_merge_count_runs on random runs,
    with slice boundaries forced tiny so many pivot cuts happen."""
    from turingassembler_tpu.ops.sortops import (np_external_merge_runs,
                                                 np_merge_count_runs)
    rng = np.random.default_rng(11)
    runs = []
    for _ in range(5):
        n = int(rng.integers(50, 400))
        keys = rng.integers(0, 50, (n, 2)).astype(np.uint32)
        keys = np.unique(keys, axis=0)
        counts = rng.integers(1, 9, len(keys)).astype(np.int64)
        runs.append((keys, counts))
    want = np_merge_count_runs(runs)
    got = np_external_merge_runs(runs, chunk_rows=37)
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[1], want[1])


def test_megasort_min_count():
    genome = tt.random_genome(5_000, seed=9)
    reads, lengths = tt.sim_reads(genome, coverage=6, read_len=90, seed=10,
                                  error_rate=0.02)
    kn, cn = kc.count_kedges_from_reads(reads, lengths, 31, engine="np",
                                        min_count=3)
    km_, cm = count_kedges_megasort(_batches(reads, lengths, 128), 31,
                                    min_count=3)
    assert np.array_equal(kn, km_)
    assert np.array_equal(cn.astype(np.int64), cm.astype(np.int64))


def test_count_reads_device_roundtrip():
    genome = tt.random_genome(10_000, seed=11)
    reads, lengths = tt.sim_reads(genome, coverage=6, read_len=100, seed=12)
    kn, cn = kc.count_kedges_from_reads(reads, lengths, 45, engine="np")
    uniq, counts, n = count_reads_device(reads, lengths.astype(np.int32), 45,
                                         chunk_reads=256, out_cap_log2=17)
    assert n == len(kn)
    assert np.array_equal(pull_rows(uniq, n), kn)
    assert np.array_equal(pull_rows(counts, n).astype(np.int64), cn)


def test_clean_wire_vs_masked_wire_parity():
    """The clean chunk format (no nmask / no length vector on the wire)
    and the masked fallback must count identically.  Chunk 0 is clean
    (uniform lengths, no Ns); chunk 1 carries Ns and ragged lengths, so
    one call exercises BOTH wire formats."""
    from turingassembler_tpu.kmer.megasort import _clean_chunk_info
    genome = tt.random_genome(20_000, seed=21)
    reads, lengths = tt.sim_reads(genome, coverage=10, read_len=96, seed=22)
    lengths = lengths.astype(np.int32)
    n = (len(reads) // 512) * 512
    reads, lengths = reads[:n].copy(), lengths[:n].copy()
    # dirty the second chunk: Ns + a truncated read
    reads[512 + 3, 10] = 4
    reads[512 + 7, 50:] = 255
    lengths[512 + 7] = 50
    assert _clean_chunk_info(reads[:512], lengths[:512])[0]
    assert not _clean_chunk_info(reads[512:1024], lengths[512:1024])[0]
    kn, cn = kc.count_kedges_from_reads(reads, lengths, 31, engine="np")
    uniq, counts, nu = count_reads_device(reads, lengths, 31,
                                          chunk_reads=512, out_cap_log2=17)
    assert nu == len(kn)
    assert np.array_equal(pull_rows(uniq, nu), kn)
    assert np.array_equal(pull_rows(counts, nu).astype(np.int64), cn)


# ---------------------------------------------------------------------------
# device graph build vs the numpy oracle
# ---------------------------------------------------------------------------

def _graphs_isomorphic(ga, gb):
    """Edge ids match by construction; nodes may be renumbered.  Verify a
    consistent rc-respecting bijection."""
    assert ga.n_e == gb.n_e
    assert ga.n_v == gb.n_v
    assert np.array_equal(ga.edge_rc, gb.edge_rc)
    assert np.array_equal(ga.edge_count, gb.edge_count)
    assert np.array_equal(ga.seq_off, gb.seq_off)
    assert np.array_equal(ga.seq_data, gb.seq_data)
    phi = {}
    def bind(a, b):
        if a in phi:
            assert phi[a] == b, f"node map conflict {a}: {phi[a]} vs {b}"
        else:
            phi[a] = b
    for e in range(ga.n_e):
        bind(int(ga.edge_source[e]), int(gb.edge_source[e]))
        bind(int(ga.edge_target[e]), int(gb.edge_target[e]))
    # bijectivity + rc structure
    assert len(set(phi.values())) == len(phi)
    for a, b in phi.items():
        ra, rb = int(ga.node_rc[a]), int(gb.node_rc[b])
        if ra in phi:
            assert phi[ra] == rb


def _build_both(genome_seed, genome_size, coverage=8, k=21, read_len=80,
                error_rate=0.0, circular=False):
    genome = tt.random_genome(genome_size, seed=genome_seed)
    if circular:
        genome = np.concatenate([genome, genome[:read_len - 1]])
    reads, lengths = tt.sim_reads(genome, coverage=coverage,
                                  read_len=read_len, seed=genome_seed + 1,
                                  error_rate=error_rate)
    kedges, counts = kc.count_kedges_from_reads(reads, lengths, k, engine="np")
    g_np = build_graph_from_kedges(kedges, counts, k)
    import jax.numpy as jnp
    cap = 1 << max(int(max(len(kedges), 2) - 1).bit_length(), 10)
    pad = cap - len(kedges)
    uniq = jnp.asarray(np.concatenate(
        [kedges, np.full((pad, kedges.shape[1]), 0xFFFFFFFF, np.uint32)]))
    cnts = jnp.asarray(np.concatenate(
        [counts.astype(np.int32), np.zeros(pad, np.int32)]))
    g_dev = build_graph_on_device(uniq, cnts, len(kedges), k)
    return g_np, g_dev


@pytest.mark.parametrize("seed,size,err", [(21, 6_000, 0.0),
                                           (22, 4_000, 0.02),
                                           (23, 12_000, 0.005)])
def test_device_build_matches_numpy(seed, size, err):
    g_np, g_dev = _build_both(seed, size, error_rate=err)
    check_graph(g_dev)
    _graphs_isomorphic(g_np, g_dev)


def test_device_build_repeat_genome():
    """Repeat family -> real branches, many unitigs."""
    rng = np.random.default_rng(5)
    rep = rng.integers(0, 4, 500, dtype=np.uint8)
    parts = [rng.integers(0, 4, 800, dtype=np.uint8) for _ in range(4)]
    genome = np.concatenate([parts[0], rep, parts[1], rep, parts[2], rep,
                             parts[3]])
    reads, lengths = tt.sim_reads(genome, coverage=12, read_len=70, seed=6)
    kedges, counts = kc.count_kedges_from_reads(reads, lengths, 21, engine="np")
    g_np = build_graph_from_kedges(kedges, counts, 21)
    import jax.numpy as jnp
    cap = 1 << max(int(len(kedges) - 1).bit_length(), 10)
    pad = cap - len(kedges)
    uniq = jnp.asarray(np.concatenate(
        [kedges, np.full((pad, kedges.shape[1]), 0xFFFFFFFF, np.uint32)]))
    cnts = jnp.asarray(np.concatenate(
        [counts.astype(np.int32), np.zeros(pad, np.int32)]))
    g_dev = build_graph_on_device(uniq, cnts, len(kedges), 21)
    check_graph(g_dev)
    assert g_dev.n_e > 2
    _graphs_isomorphic(g_np, g_dev)


def test_device_build_circular_genome():
    """A circular chromosome yields a pure-cycle unitig (the cycle-break
    path)."""
    g_np, g_dev = _build_both(31, 3_000, circular=True)
    check_graph(g_dev)
    _graphs_isomorphic(g_np, g_dev)


def test_device_build_large_rank_depth():
    """Genome big enough that D >= 2^16 exercises the deep pointer-
    doubling rounds of device_build._rank_chains."""
    g_np, g_dev = _build_both(41, 40_000, coverage=6, k=21, read_len=100)
    check_graph(g_dev)
    _graphs_isomorphic(g_np, g_dev)


def test_device_build_large_circular():
    """Large circular chromosome: cycle detection + break + re-rank at
    D >= 2^16 must still match the oracle."""
    g_np, g_dev = _build_both(42, 40_000, coverage=6, k=21, read_len=100,
                              circular=True)
    check_graph(g_dev)
    _graphs_isomorphic(g_np, g_dev)


def test_clean_chunk_info_packed_equivalence():
    """The bitmask-based clean check must agree with the (B, L) bool
    form on every chunk class: clean, N-laden, ragged lengths, empty,
    non-multiple-of-8 read lengths."""
    import numpy as np

    from turingassembler_tpu.kmer.count import host_pack_reads
    from turingassembler_tpu.kmer.megasort import (_clean_chunk_info,
                                                   _clean_chunk_info_packed)

    rng = np.random.default_rng(2)
    B, L = 257, 152
    cases = []
    rb = rng.integers(0, 4, (B, L)).astype(np.uint8)
    cases.append(("clean150", rb.copy(), np.full(B, 150, np.int32)))
    cases.append(("clean149", rb.copy(), np.full(B, 149, np.int32)))  # rem!=0
    rbN = rb.copy(); rbN[17, 31] = 4
    cases.append(("one N", rbN, np.full(B, 150, np.int32)))
    rbN2 = rb.copy(); rbN2[0, 149] = 255
    cases.append(("N at boundary", rbN2, np.full(B, 150, np.int32)))
    lv = np.full(B, 150, np.int32); lv[200] = 140
    cases.append(("ragged", rb.copy(), lv))
    rbT = rb.copy(); rbT[5, 150] = 4   # N beyond read length: still clean
    cases.append(("pad N", rbT, np.full(B, 150, np.int32)))
    cases.append(("empty", np.zeros((0, L), np.uint8), np.zeros(0, np.int32)))
    for name, mat, lens in cases:
        ref = _clean_chunk_info(mat, lens)
        _, nm = host_pack_reads(np.ascontiguousarray(mat))
        got = _clean_chunk_info_packed(nm, lens)
        assert ref == got, (name, ref, got)
