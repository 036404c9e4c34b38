"""Assembly-quality harness: a repeat-rich 60 kb genome with sequencing
errors must assemble to high NGA50 through the full basic pipeline."""

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.evaluate import evaluate_assembly
from turingassembler_tpu.graph.build import build_graph_from_kedges
from turingassembler_tpu.kmer.count import count_kedges_from_reads
from turingassembler_tpu.resolve import resolve_graph_operation
from turingassembler_tpu.resolve.bulges import (
    resolve_complex_bulges_ite,
    resolve_simple_bulges_ite,
)


def make_genome(size=60_000, seed=0):
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, size).astype(np.uint8)
    # plant a few dispersed repeats shorter than k=45 spacing effects
    rep = rng.integers(0, 4, 400).astype(np.uint8)
    for pos in (10_000, 25_000, 42_000):
        if pos + 400 <= size:
            g[pos : pos + 400] = rep
    return g


def test_evaluator_sanity():
    genome = tt.codes_to_str(make_genome(20_000, seed=3))
    # perfect single contig
    r = evaluate_assembly([genome], genome)
    assert r.nga50 >= len(genome) - 200
    assert r.n_misassemblies == 0
    assert r.genome_fraction > 0.99
    # two halves
    half = len(genome) // 2
    r2 = evaluate_assembly([genome[:half], genome[half:]], genome)
    assert abs(r2.nga50 - half) < 200
    # misassembly: swapped halves glued
    r3 = evaluate_assembly([genome[half:] + genome[:half]], genome)
    assert r3.n_misassemblies >= 1


@pytest.mark.slow
def test_repeat_genome_quality():
    genome = make_genome()
    reads, lengths = tt.sim_reads(genome, coverage=45, read_len=150,
                                  error_rate=0.003, seed=2)
    k = 45
    ke, c = count_kedges_from_reads(reads, lengths, k, min_count=2)
    g = build_graph_from_kedges(ke, c, k)
    g = resolve_graph_operation(g)
    g = resolve_simple_bulges_ite(g)
    g = resolve_complex_bulges_ite(g)
    contigs = [tt.codes_to_str(g.get_seq(e))
               for e in range(g.n_e)
               if g.edge_source[e] >= 0 and e <= g.edge_rc[e]
               and g.edge_len(e) >= 500]
    res = evaluate_assembly(contigs, tt.codes_to_str(genome))
    # the 400bp repeats are shorter than... longer than k=45, so the graph
    # breaks at them: expect ~4 large blocks, NGA50 >= ~10kb, no misassembly
    assert res.n_misassemblies == 0
    assert res.genome_fraction > 0.95
    assert res.nga50 >= 8_000, res


def test_evaluator_mismatch_and_indel_tally():
    """The evaluator's third QUAST headline metric (the reference
    publishes 5.65 mismatches/100 kbp, README.md:13): planted
    substitutions are counted exactly via inter-anchor hamming spans,
    indels as |length diff| between anchors, and neither produces a
    phantom misassembly."""
    import random

    g = tt.codes_to_str(tt.random_genome(100_000, seed=7))
    rng = random.Random(3)
    pos = sorted(rng.sample(range(1000, 99_000), 12))
    carr = list(g)
    for p in pos:
        carr[p] = {"A": "C", "C": "G", "G": "T", "T": "A"}[carr[p]]
    res = evaluate_assembly(["".join(carr)], g)
    assert res.n_misassemblies == 0
    assert res.n_mismatches == 12
    assert abs(res.mismatches_per_100kbp - 12.0) < 0.1

    assert evaluate_assembly([g[:50_000]], g).n_mismatches == 0

    res3 = evaluate_assembly([g[:30_000] + g[30_005:60_000]], g)
    assert res3.n_misassemblies == 0
    assert res3.n_indel_bases >= 5
