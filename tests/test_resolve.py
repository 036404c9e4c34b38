"""Simplification passes: error reads -> clean single contig; invariants hold."""

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.graph.build import build_graph_from_kedges
from turingassembler_tpu.graph.condense import asm_condense
from turingassembler_tpu.graph.invariants import check_graph
from turingassembler_tpu.kmer.count import count_kedges_from_reads
from turingassembler_tpu.resolve import resolve_graph_operation


def assemble(genome, k, coverage=40.0, read_len=100, error_rate=0.0,
             min_count=1, seed=5):
    reads, lengths = tt.sim_reads(genome, coverage=coverage, read_len=read_len,
                                  seed=seed, error_rate=error_rate)
    kedges, counts = count_kedges_from_reads(reads, lengths, k,
                                             batch_size=8192, min_count=min_count)
    return build_graph_from_kedges(kedges, counts, k)


def live_seqs(g):
    return {tt.canonical_str(tt.codes_to_str(g.get_seq(e)))
            for e in range(g.n_e) if g.edge_source[e] >= 0}


def test_condense_noop_on_clean_graph():
    genome = tt.random_genome(3000, seed=21)
    g = assemble(genome, 31)
    check_graph(g)
    g2 = asm_condense(g)
    check_graph(g2)
    assert live_seqs(g) == live_seqs(g2)


def test_error_reads_resolve_to_single_contig():
    genome = tt.random_genome(8000, seed=42)
    g = assemble(genome, 31, coverage=50.0, error_rate=0.005, min_count=2, seed=9)
    check_graph(g)
    # errors produce tips/bubbles: expect more than one edge before resolve
    g1 = resolve_graph_operation(g)
    check_graph(g1)
    seqs = live_seqs(g1)
    gstr = tt.codes_to_str(genome)
    big = [s for s in seqs if len(s) >= 300]
    assert len(big) == 1
    s0 = big[0]
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc0 = "".join(comp[c] for c in reversed(s0))
    assert (s0 in gstr or rc0 in gstr) and len(s0) >= len(genome) - 100


def test_resolve_preserves_clean_graph():
    genome = tt.random_genome(5000, seed=1)
    g = assemble(genome, 31)
    g1 = resolve_graph_operation(g)
    check_graph(g1)
    seqs = live_seqs(g1)
    assert len(seqs) == 1
    s0 = next(iter(seqs))
    gstr = tt.codes_to_str(genome)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc0 = "".join(comp[c] for c in reversed(s0))
    assert (s0 in gstr or rc0 in gstr) and len(s0) >= len(genome) - 100


def test_bubble_from_heterozygous_site():
    # two haplotypes differing at one position -> simple bubble
    genome = tt.random_genome(3000, seed=33)
    hap2 = genome.copy()
    hap2[1500] = (hap2[1500] + 1) % 4
    r1, l1 = tt.sim_reads(genome, coverage=30.0, read_len=100, seed=3)
    r2, l2 = tt.sim_reads(hap2, coverage=30.0, read_len=100, seed=4)
    reads = np.concatenate([r1, r2])
    lengths = np.concatenate([l1, l2])
    kedges, counts = count_kedges_from_reads(reads, lengths, 31, batch_size=8192)
    g = build_graph_from_kedges(kedges, counts, 31)
    check_graph(g)
    assert g.n_e > 2  # bubble present
    g1 = resolve_graph_operation(g)
    check_graph(g1)
    seqs = live_seqs(g1)
    assert len(seqs) == 1  # bubble popped into one contig
    s = next(iter(seqs))
    assert len(s) >= 2900


def test_dump_loop_duplication():
    """A loop-through repeat (e1 -> e <=loop= e -> e2) is unrolled into
    e-loop-e and the loop edge removed (reference asm_resolve_dump_loop,
    src/basic_resolve.c:1221-1276)."""
    from turingassembler_tpu.graph.mutable import MutableGraph
    from turingassembler_tpu.resolve.basic import resolve_dump_loop

    rng = np.random.default_rng(31)
    k = 21
    A = rng.integers(0, 4, 1500).astype(np.uint8)
    R = rng.integers(0, 4, 300).astype(np.uint8)
    L = rng.integers(0, 4, 200).astype(np.uint8)
    B = rng.integers(0, 4, 1500).astype(np.uint8)
    h = np.concatenate([A, R, L, R, B])
    g = assemble(h, k, coverage=40)
    check_graph(g)
    assert g.n_e == 8  # A, R, loop, B x rc

    mg = MutableGraph.from_asm(g)
    n = resolve_dump_loop(mg)
    assert n == 1
    g2 = asm_condense(mg.to_asm())
    check_graph(g2, check_seq=True)
    assert int(g2.alive_mask().sum()) == 2  # single contig + rc
    # the duplicated traversal A.R.L.R.B is reconstructed (genome ends
    # may lose a couple of bases to read-start sampling)
    hs = tt.codes_to_str(h)
    (s,) = {tt.codes_to_str(g2.get_seq(e))
            for e in range(g2.n_e) if g2.edge_source[e] >= 0
            and e <= g2.edge_rc[e]}
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = "".join(comp[ch] for ch in reversed(s))
    assert hs[20:-20] in s or hs[20:-20] in rc


def test_dump_branch_collapse():
    """Two parallel branches between the same flanks collapse to the
    higher-coverage one (reference asm_resolve_dump_branch,
    src/basic_resolve.c:1278-1317)."""
    from turingassembler_tpu.graph.mutable import MutableGraph
    from turingassembler_tpu.resolve.basic import resolve_dump_branch

    rng = np.random.default_rng(33)
    k = 21
    A = rng.integers(0, 4, 1500).astype(np.uint8)
    M0 = rng.integers(0, 4, 400).astype(np.uint8)
    M1 = rng.integers(0, 4, 400).astype(np.uint8)
    B = rng.integers(0, 4, 1500).astype(np.uint8)
    h0 = np.concatenate([A, M0, B])
    h1 = np.concatenate([A, M1, B])
    r0, l0 = tt.sim_reads(h0, coverage=40, read_len=100, seed=7)
    r1, l1 = tt.sim_reads(h1, coverage=12, read_len=100, seed=8)
    ke, c = count_kedges_from_reads(np.concatenate([r0, r1]),
                                    np.concatenate([l0, l1]), k)
    g = build_graph_from_kedges(ke, c, k)
    check_graph(g)
    assert g.n_e == 8  # A, M0, M1, B x rc

    mg = MutableGraph.from_asm(g)
    n = resolve_dump_branch(mg)
    assert n == 1
    g2 = asm_condense(mg.to_asm())
    check_graph(g2, check_seq=True)
    assert int(g2.alive_mask().sum()) == 2
    hs = tt.codes_to_str(h0)  # high-cov branch kept
    (s,) = {tt.codes_to_str(g2.get_seq(e))
            for e in range(g2.n_e) if g2.edge_source[e] >= 0
            and e <= g2.edge_rc[e]}
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = "".join(comp[ch] for ch in reversed(s))
    assert hs[20:-20] in s or hs[20:-20] in rc
