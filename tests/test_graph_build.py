"""Level-0 DBG construction vs a brute-force oracle + invariants.

Mirrors the reference's de-facto integration test: `test_asm_graph`
(src/assembly_graph.c:987-1171) runs after every build; here
`check_graph` plays that role and the unitig set is compared against a
sequential textbook implementation.
"""

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.graph.build import build_graph_from_kedges
from turingassembler_tpu.graph.invariants import check_graph
from turingassembler_tpu.kmer.count import count_kedges_from_reads


def build_from_genome(genome, k, coverage=25.0, read_len=80, seed=1):
    reads, lengths = tt.sim_reads(genome, coverage=coverage, read_len=read_len, seed=seed)
    kedges, counts = count_kedges_from_reads(reads, lengths, k, batch_size=4096)
    g = build_graph_from_kedges(kedges, counts, k)
    return g, reads


def graph_unitig_set(g):
    out = set()
    for e in range(g.n_e):
        if g.edge_source[e] < 0:
            continue
        out.add(tt.canonical_str(tt.codes_to_str(g.get_seq(e))))
    return sorted(out)


@pytest.mark.parametrize("k,glen", [(15, 300), (21, 2000), (31, 5000)])
def test_build_matches_bruteforce(k, glen):
    genome = tt.random_genome(glen, seed=k)
    g, reads = build_from_genome(genome, k)
    check_graph(g)
    reads_str = [tt.codes_to_str(r[r < 4]) for r in reads]
    want = tt.brute_force_unitigs(reads_str, k)
    got = graph_unitig_set(g)
    assert got == want


def test_single_unitig_reconstructs_genome():
    # random 4kb genome, k=31: every 31-mer unique whp -> one unitig pair
    genome = tt.random_genome(4000, seed=7)
    g, _ = build_from_genome(genome, 31, coverage=40.0, read_len=100)
    check_graph(g)
    # edges come in rc pairs
    assert g.n_e == 2
    assert g.edge_rc[0] == 1 and g.edge_rc[1] == 0
    # the unitig is a near-full-length exact substring of the genome
    # (terminal k-mers may be unsampled: a read must start at position 0
    # to cover the very first (k+1)-mer)
    s = tt.codes_to_str(g.get_seq(0))
    rc = tt.codes_to_str(tt.revcomp(g.get_seq(0)))
    gstr = tt.codes_to_str(genome)
    assert s in gstr or rc in gstr
    assert g.edge_len(0) >= 3900


def test_repeat_creates_branching():
    # genome with an exact internal repeat longer than k forces branch nodes
    rng = np.random.default_rng(3)
    a = rng.integers(0, 4, 600).astype(np.uint8)
    rep = rng.integers(0, 4, 120).astype(np.uint8)
    b = rng.integers(0, 4, 600).astype(np.uint8)
    c = rng.integers(0, 4, 600).astype(np.uint8)
    genome = np.concatenate([a, rep, b, rep, c])
    k = 21
    g, reads = build_from_genome(genome, k, coverage=40.0)
    check_graph(g)
    reads_str = [tt.codes_to_str(r[r < 4]) for r in reads]
    want = tt.brute_force_unitigs(reads_str, k)
    assert graph_unitig_set(g) == want
    assert g.n_e > 2  # repeat split the graph


def test_counts_sum_conserved():
    genome = tt.random_genome(1500, seed=11)
    k = 17
    reads, lengths = tt.sim_reads(genome, coverage=20.0, read_len=60, seed=2)
    kedges, counts = count_kedges_from_reads(reads, lengths, k, batch_size=512)
    g = build_graph_from_kedges(kedges, counts, k)
    check_graph(g)
    # every canonical kedge's count lands in exactly one edge and its rc
    alive = g.alive_mask()
    # each unitig pair double-counts (edge + its rc), except palindromic edges
    tot = 0
    for e in np.flatnonzero(alive):
        if g.edge_rc[e] == e:
            tot += 2 * g.edge_count[e]
        else:
            tot += g.edge_count[e]
    assert tot == 2 * counts.sum()


def test_k63_build():
    # 4-limb k-mer path (k=63, k+1=64 -> exactly 4 limbs)
    genome = tt.random_genome(3000, seed=9)
    g, reads = build_from_genome(genome, 63, coverage=30.0, read_len=100)
    check_graph(g)
    reads_str = [tt.codes_to_str(r[r < 4]) for r in reads]
    want = tt.brute_force_unitigs(reads_str, 63)
    assert graph_unitig_set(g) == want
