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
