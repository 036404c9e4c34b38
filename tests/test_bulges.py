"""Simple/complex bulge resolution."""

import numpy as np

from turingassembler_tpu import testing as tt
from turingassembler_tpu.graph.build import build_graph_from_kedges
from turingassembler_tpu.graph.invariants import check_graph
from turingassembler_tpu.kmer.count import count_kedges_from_reads
from turingassembler_tpu.resolve.bulges import (
    resolve_complex_bulges_ite,
    resolve_simple_bulges_ite,
)


def build(reads, lengths, k):
    ke, c = count_kedges_from_reads(reads, lengths, k)
    return build_graph_from_kedges(ke, c, k)


def live_seqs(g):
    return [tt.codes_to_str(g.get_seq(e))
            for e in range(g.n_e) if g.edge_source[e] >= 0]


def test_simple_bulge_divergent_alleles():
    # two haplotypes with a completely substituted 300/330 bp region:
    # parallel edges of similar length that alignment would reject but
    # the length-based simple-bulge rule collapses
    rng = np.random.default_rng(8)
    A = rng.integers(0, 4, 2000).astype(np.uint8)
    B = rng.integers(0, 4, 2000).astype(np.uint8)
    M1 = rng.integers(0, 4, 300).astype(np.uint8)
    M2 = rng.integers(0, 4, 330).astype(np.uint8)
    hap1 = np.concatenate([A, M1, B])
    hap2 = np.concatenate([A, M2, B])
    k = 21
    r1, l1 = tt.sim_reads(hap1, coverage=30, read_len=100, seed=1)
    r2, l2 = tt.sim_reads(hap2, coverage=30, read_len=100, seed=2)
    g = build(np.concatenate([r1, r2]), np.concatenate([l1, l2]), k)
    check_graph(g)
    n_before = int(g.alive_mask().sum())
    assert n_before >= 6  # A, B, M1, M2 arms (rc pairs)
    g1 = resolve_simple_bulges_ite(g)
    check_graph(g1)
    n_after = int(g1.alive_mask().sum())
    assert n_after < n_before
    # one haplotype route survives end-to-end
    assert max(len(s) for s in live_seqs(g1)) >= 4200


def test_bulge_passes_noop_on_clean_graph():
    genome = tt.random_genome(5000, seed=2)
    reads, lengths = tt.sim_reads(genome, coverage=30, read_len=100, seed=3)
    g = build(reads, lengths, 31)
    s0 = sorted(live_seqs(g))
    g1 = resolve_simple_bulges_ite(g)
    g2 = resolve_complex_bulges_ite(g1)
    check_graph(g2)
    assert sorted(live_seqs(g2)) == s0


def test_complex_bulges_smoke_on_tangle():
    # tangled graph from repeat-rich genome: passes must preserve invariants
    rng = np.random.default_rng(5)
    rep = rng.integers(0, 4, 200).astype(np.uint8)
    parts = []
    for i in range(5):
        parts.append(rng.integers(0, 4, 500).astype(np.uint8))
        parts.append(rep)
    genome = np.concatenate(parts)
    reads, lengths = tt.sim_reads(genome, coverage=35, read_len=120, seed=6)
    g = build(reads, lengths, 21)
    check_graph(g)
    g1 = resolve_complex_bulges_ite(g)
    check_graph(g1)


def test_join_edge_with_fill():
    from turingassembler_tpu.graph.mutable import MutableGraph
    genome = tt.random_genome(3000, seed=77)
    reads, lengths = tt.sim_reads(genome, coverage=30, read_len=100, seed=1)
    # two halves as separate graphs... build one graph from two contigs
    from turingassembler_tpu.graph.from_contigs import graph_from_contigs
    a = tt.codes_to_str(genome[:1400])
    b = tt.codes_to_str(genome[1600:])
    g = graph_from_contigs([a, b], 31)
    mg = MutableGraph.from_asm(g)
    fill = genome[1400:1600]
    mg.join_edge_with_fill(0, 2, fill)  # edges 0 (a fw) and 2 (b fw)
    g2 = mg.to_asm()
    check_graph(g2, check_seq=True)
    seqs = {tt.codes_to_str(g2.get_seq(e))
            for e in range(g2.n_e) if g2.edge_source[e] >= 0}
    assert tt.codes_to_str(genome) in seqs
