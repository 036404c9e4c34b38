"""k=31 coverage recount vs direct expectation."""

import numpy as np

from turingassembler_tpu import testing as tt
from turingassembler_tpu.graph.build import build_graph_from_kedges
from turingassembler_tpu.kmer.count import count_kedges_from_reads
from turingassembler_tpu.kmer.coverage import recount_coverage


def test_recount_matches_read_depth():
    genome = tt.random_genome(4000, seed=13)
    reads, lengths = tt.sim_reads(genome, coverage=25.0, read_len=100, seed=2)
    ke, c = count_kedges_from_reads(reads, lengths, 45)
    g = build_graph_from_kedges(ke, c, 45)
    assert g.n_e == 2
    old_cov = g.edge_cov()[0]
    g = recount_coverage(g, reads, lengths)
    # recount at k=31 over the same reads: per-kmer depth ~ coverage*(1-30/100)
    new_cov31 = g.edge_count[0] / max(g.edge_len(0) - 31 + 1, 1)
    # fw+rc both counted -> each genomic 31-mer counted once per read that
    # covers it (reads are one strand each, table is fw of edge, read rc
    # kmers hit too) => depth ~ coverage * (100-30)/100
    expect = 25.0 * (100 - 30) / 100
    assert abs(new_cov31 - expect) / expect < 0.25, (new_cov31, expect)
    # symmetry
    assert g.edge_count[0] == g.edge_count[1]
