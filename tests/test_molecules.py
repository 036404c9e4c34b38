"""Molecule extraction over a fabricated barcode digraph + e2e smoke."""

import numpy as np

from turingassembler_tpu import testing as tt
from turingassembler_tpu.graph.build import build_graph_from_kedges
from turingassembler_tpu.kmer.count import count_kedges_from_reads
from turingassembler_tpu.scaffold.molecules import (
    count_edge_link_shared_bc,
    extract_molecules,
)


def test_extract_molecules_dag():
    # graph with 3 contigs (6 directed edges); fabricate a chain 0 -> 2 -> 4
    genome_parts = [tt.random_genome(1200, seed=s) for s in (1, 2, 3)]
    reads = []
    lens = []
    for p in genome_parts:
        r, l = tt.sim_reads(p, coverage=25, read_len=100, seed=int(p[0]) + 5)
        reads.append(r)
        lens.append(l)
    ke, c = count_kedges_from_reads(np.concatenate(reads), np.concatenate(lens), 31)
    g = build_graph_from_kedges(ke, c, 31)
    assert g.n_e == 6

    # identify one directed edge per contig
    lens_e = g.edge_len()
    ids = [e for e in range(g.n_e) if e < g.edge_rc[e]]
    a, b, cc = ids[:3]
    all_count = {(min(a, b), max(a, b)): 200, (min(b, cc), max(b, cc)): 150}
    pairs = [(a, b), (b, cc)]
    mols = extract_molecules(g, pairs, all_count)
    assert mols == [[a, b, cc]]


def test_count_edge_link():
    bx = {1: {3: 5, 7: 2}, 2: {3: 1, 7: 1, 9: 4}}
    out = count_edge_link_shared_bc(bx)
    assert out[(3, 7)] == 2
    assert out[(3, 9)] == 1
    assert out[(7, 9)] == 1
