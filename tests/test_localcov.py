"""Positional local count gating + read-archive integrity invariant
(VERDICT r2 #9: reference assign_count_local_kedge_multi
src/kmer_build.c:159-192 and test_same_barcode
src/barcode_resolve2.c:1554-1588)."""

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.graph.from_contigs import graph_from_contigs
from turingassembler_tpu.localasm.local import (
    CONTIG_LEVEL_1_LOCAL,
    recount_local_graph_cov,
)


def _reads_from(seq: np.ndarray, lo: int, hi: int, n: int, rl: int = 100,
                seed: int = 0):
    rng = np.random.default_rng(seed)
    starts = rng.integers(lo, hi - rl + 1, n)
    reads = np.stack([seq[s : s + rl] for s in starts]).astype(np.uint8)
    return reads, np.full(n, rl, np.int32)


def _fixture():
    rng = np.random.default_rng(7)
    A = rng.integers(0, 4, 4000).astype(np.uint8)
    B = rng.integers(0, 4, 4000).astype(np.uint8)
    C = rng.integers(0, 4, 600).astype(np.uint8)
    lg = graph_from_contigs(
        [tt.codes_to_str(A), tt.codes_to_str(B), tt.codes_to_str(C)], 31)
    # locate each contig's forward edge by length + first bases
    eA = eB = eC = -1
    for e in range(lg.n_e):
        s = lg.get_seq(e)
        if len(s) == 4000 and (s[:50] == A[:50]).all():
            eA = e
        elif len(s) == 4000 and (s[:50] == B[:50]).all():
            eB = e
        elif len(s) == 600 and (s[:50] == C[:50]).all():
            eC = e
    assert min(eA, eB, eC) >= 0
    return lg, A, B, C, eA, eB, eC


def test_positional_gate_drops_deep_flank_kmers():
    lg, A, B, C, eA, eB, eC = _fixture()
    # reads ONLY from deep inside flank A (every kedge end-pos >= 3000)
    reads, lens = _reads_from(A, 3100, 4000, 200, seed=1)
    recount_local_graph_cov(lg, lg, eA, eB, reads, lens,
                            lc_e1=eA, lc_e2=eB)
    assert lg.edge_count[eA] == 0
    assert lg.edge_count[int(lg.edge_rc[eA])] == 0


def test_positional_gate_keeps_head_and_interior():
    lg, A, B, C, eA, eB, eC = _fixture()
    rA, lA = _reads_from(A, 0, 1000, 300, seed=2)      # head of flank A
    rC, lC = _reads_from(C, 0, 600, 100, seed=3)       # non-flank edge
    reads = np.concatenate([rA, rC])
    lens = np.concatenate([lA, lC])
    recount_local_graph_cov(lg, lg, eA, eB, reads, lens,
                            lc_e1=eA, lc_e2=eB)
    # non-flank edge counts unconditionally, symmetric with its rc
    assert lg.edge_count[eC] > 0
    assert lg.edge_count[eC] == lg.edge_count[int(lg.edge_rc[eC])]
    # flank head counts survive and are rescaled to full length
    # (fake count: cov over the first 3000 bases scaled by len - k + 1)
    assert lg.edge_count[eA] > 0
    raw_cov = 300 * (100 - 31) / (CONTIG_LEVEL_1_LOCAL - 31 + 1)
    expect = raw_cov * (4000 - 31 + 1)
    assert 0.5 * expect < lg.edge_count[eA] < 1.5 * expect


def test_positional_gate_mirrors_rc_flank():
    lg, A, B, C, eA, eB, eC = _fixture()
    rcA = int(lg.edge_rc[eA])
    # pass the RC record as the flank: reads deep in rc(A)'s record =
    # near A's HEAD -> mirrored position gate drops them
    reads, lens = _reads_from(A, 0, 900, 200, seed=4)
    recount_local_graph_cov(lg, lg, rcA, eB, reads, lens,
                            lc_e1=rcA, lc_e2=eB)
    assert lg.edge_count[rcA] == 0


def test_verify_read_archive(tmp_path):
    from turingassembler_tpu.barcode.sort_read import (
        ReadPath, load_barcode_index, sort_reads, verify_read_archive)
    from turingassembler_tpu.config import Config, LIB_TYPE_UST
    from turingassembler_tpu.io.fastq import encode_barcode
    genome = tt.random_genome(6000, seed=9)
    r1, r2, l1, l2, bcs = tt.sim_barcoded_pairs(
        genome, molecule_len=2500, n_molecules=20,
        reads_per_molecule=20, read_len=100, insert=250, seed=5)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    f1, f2, fI = (str(tmp_path / n) for n in ["R1.fq", "R2.fq", "I1.fq"])
    with open(f1, "w") as o1, open(f2, "w") as o2, open(fI, "w") as oI:
        for i in range(len(r1)):
            s1 = ACGT[r1[i]].tobytes().decode()
            s2 = ACGT[r2[i]].tobytes().decode()
            bseq = encode_barcode(int(bcs[i]) + 1, 16).decode()
            o1.write(f"@r{i}\n{s1}\n+\n{'I' * len(s1)}\n")
            o2.write(f"@r{i}\n{s2}\n+\n{'I' * len(s2)}\n")
            oI.write(f"@r{i}\n{bseq}\n+\n{'I' * 16}\n")
    cfg = Config(files_1=(f1,), files_2=(f2,), files_I=(fI,),
                 lib_type=LIB_TYPE_UST, out_dir=str(tmp_path / "out"))
    rpath = sort_reads(cfg)
    n = verify_read_archive(rpath)
    assert n == len(load_barcode_index(rpath.idx_path))
    # sampled mode
    assert verify_read_archive(rpath, max_barcodes=4) <= 4

    # corrupt one indexed span -> must raise
    idx = load_barcode_index(rpath.idx_path)
    bc0 = sorted(idx)[0]
    o1, _, L1, _ = idx[bc0]
    with open(rpath.R1_path, "r+b") as fp:
        fp.seek(o1)
        fp.write(b"X")                      # clobber the '@'
    with pytest.raises(ValueError):
        verify_read_archive(rpath)


def test_count_kedges_multi_matches_per_gap():
    """Batched multi-gap counting (one sort pass, gap-id key column)
    == the per-gap np count (VERDICT r2 #8)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from turingassembler_tpu.kmer.count import count_kedges_from_reads
    from turingassembler_tpu.localasm.local import count_kedges_multi
    rng = np.random.default_rng(3)
    sets = []
    for i in range(4):
        genome = rng.integers(0, 4, 3000 + 500 * i).astype(np.uint8)
        reads, lens = tt.sim_reads(genome, coverage=6, read_len=80,
                                   error_rate=0.01, seed=i)
        # plant some N/pad codes
        reads[0, 5] = 4
        sets.append((reads, lens))
    sets.insert(2, None)
    out = count_kedges_multi(sets, 31)
    assert len(out) == 5
    assert len(out[2][0]) == 0
    for i, rs in enumerate(sets):
        if rs is None:
            continue
        exp_k, exp_c = count_kedges_from_reads(rs[0], rs[1], 31,
                                               engine="np")
        np.testing.assert_array_equal(out[i][0], exp_k)
        np.testing.assert_array_equal(out[i][1], exp_c)


def test_map_contig_union_join_equals_per_edge_loop():
    """MapContig's union-table window join must return the same edge as
    the per-edge searchsorted oracle at every window position, on a
    local graph with shared/repeated content between edges."""
    import numpy as np

    from turingassembler_tpu import testing as tt
    from turingassembler_tpu.graph.from_contigs import graph_from_contigs
    from turingassembler_tpu.localasm.local import MapContig, WINDOW_SIZE

    rng = np.random.default_rng(11)
    base = rng.integers(0, 4, 2600).astype(np.uint8)
    shared = rng.integers(0, 4, 400).astype(np.uint8)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    contigs = [
        ACGT[np.concatenate([base[:1200], shared])].tobytes().decode(),
        ACGT[np.concatenate([shared, base[1200:2400]])].tobytes().decode(),
        ACGT[base[2400:2600]].tobytes().decode(),   # shorter than a window
    ]
    lg = graph_from_contigs(contigs, 31)
    # query: crosses both edges and the shared run, plus noise tails
    q = np.concatenate([rng.integers(0, 4, 300).astype(np.uint8),
                        base[:1200], shared, base[1200:2400],
                        rng.integers(0, 4, 300).astype(np.uint8)])
    mc = MapContig(q, lg)
    for pos in range(0, len(q), WINDOW_SIZE // 2):
        assert mc._match_window_uncached(pos) == mc._match_window_ref(pos), pos
