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


def _repeat_chain_graph():
    """X R1 Y R2 Z genome: contigs X, Y, Z split by two distinct short
    repeats -> graph path X -> R1 -> Y -> R2 -> Z."""
    X = tt.random_genome(2000, seed=1)
    R1 = tt.random_genome(150, seed=9)
    Y = tt.random_genome(1800, seed=2)
    R2 = tt.random_genome(160, seed=12)
    Z = tt.random_genome(2200, seed=3)
    U = tt.random_genome(500, seed=21)
    V = tt.random_genome(600, seed=24)
    W = tt.random_genome(600, seed=25)
    # second repeat copies live on a separate decoy molecule (with
    # unique flanks so R1/R2 branch on both sides and stay separate
    # edges); the main X -> Y -> Z chain stays acyclic in the graph
    main = np.concatenate([X, R1, Y, R2, Z])
    decoy = np.concatenate([V, R1, U, R2, W])
    r1, l1 = tt.sim_reads(main, coverage=35, read_len=100, seed=4)
    r2, l2 = tt.sim_reads(decoy, coverage=35, read_len=100, seed=6)
    reads = np.concatenate([r1, r2])
    lens = np.concatenate([l1, l2])
    ke, c = count_kedges_from_reads(reads, lens, 45, engine="np")
    return build_graph_from_kedges(ke, c, 45)


def test_order_molecule_edges_chain():
    from turingassembler_tpu.scaffold.molecules import order_molecule_edges
    g = _repeat_chain_graph()
    lens = g.edge_len()
    longs = [e for e in range(g.n_e) if lens[e] >= 1500]
    assert len(longs) >= 6  # X, Y, Z + rcs
    chains = order_molecule_edges(g, longs)
    # at least one orientation yields the full 3-contig molecule
    assert any(len(ch) == 3 for ch in chains), chains
    for ch in chains:
        assert all(lens[e] >= 500 for e in ch)


def test_barcode_graph_filters():
    from turingassembler_tpu.scaffold.molecules import (
        BarcodeGraph, filter_bulge, filter_by_deg,
        filter_go_reverse_complement, filter_go_both_reverse_complement)
    g = _repeat_chain_graph()
    rc = g.edge_rc

    # deg filter: one node fanning out to 3 others
    bg = BarcodeGraph(g)
    lens = g.edge_len()
    longs = [e for e in range(g.n_e) if lens[e] >= 1500 and e < rc[e]]
    a, b, c = longs[:3]
    bg.add_group(a, b)
    bg.add_group(a, c)
    n0 = len(bg.links)
    filter_by_deg(bg, 1)   # a has out-deg >= 2 -> loses its out links
    assert (a, b) not in bg.links and (a, c) not in bg.links
    assert len(bg.links) < n0

    # rc filter
    bg = BarcodeGraph(g)
    bg.add_group(a, int(rc[a]))
    filter_go_reverse_complement(g, bg)
    assert (a, int(rc[a])) not in bg.links

    # both-rc filter: a links to b and rc(b) -> whole candidates dropped
    bg = BarcodeGraph(g)
    bg.add_group(a, b)
    filter_go_both_reverse_complement(g, bg)  # (a,b) group adds a->b and a->rc(b)? no
    # a -> b and a -> rc(b) are both in the 8-orientation group, so the
    # filter must fire on the group itself
    assert (a, b) not in bg.links

    # bulge: chain a->b, a->c, b->c keeps only a->b
    bg = BarcodeGraph(g)
    bg.links = {(a, b): 0, (a, c): 1, (b, c): 2}
    bg.groups = {0: [(a, b)], 1: [(a, c)], 2: [(b, c)]}
    filter_bulge(bg)
    assert (a, c) not in bg.links and (a, b) in bg.links


def test_check_read_pair_path_support():
    from turingassembler_tpu.scaffold.molecules import _check_read_pair
    g = _repeat_chain_graph()
    lens = g.edge_len()
    rc = g.edge_rc
    longs = sorted([e for e in range(g.n_e) if lens[e] >= 1500])
    a, b = longs[0], longs[1]
    path = [a, b]
    rp = {(a, int(rc[b])): 5}
    assert _check_read_pair(g, rp, path)
    assert not _check_read_pair(g, {}, path)


def test_molecule_contigs_end_to_end(tmp_path):
    """Full molecule pipeline (hit tables -> barcode graph filters ->
    DAG molecules -> molecules.fasta) on a repeat-split barcoded
    library."""
    import os
    from tests.test_assembly3 import make_repeat_genome, write_library
    from turingassembler_tpu.barcode.sort_read import sort_reads
    from turingassembler_tpu.config import Config, LIB_TYPE_UST
    from turingassembler_tpu.graph.build import build_graph_from_kedges
    from turingassembler_tpu.io.fasta import read_fasta
    from turingassembler_tpu.resolve import resolve_graph_operation
    from turingassembler_tpu.scaffold.molecules import molecule_contigs

    genome = make_repeat_genome()
    f1, f2, fI = write_library(tmp_path, genome, n_molecules=900, seed=2)
    out = str(tmp_path / "out")
    cfg = Config(files_1=(f1,), files_2=(f2,), files_I=(fI,),
                 lib_type=LIB_TYPE_UST, out_dir=out, k0=31)
    os.makedirs(out, exist_ok=True)
    reads = []
    lens = []
    from turingassembler_tpu.io.fastq import read_fastq_batches
    for f in (f1, f2):
        for rb in read_fastq_batches(f, pad_to=100):
            reads.append(rb.bases)
            lens.append(rb.lengths)
    ke, c = count_kedges_from_reads(np.concatenate(reads),
                                    np.concatenate(lens), 31, engine="np")
    g = resolve_graph_operation(build_graph_from_kedges(ke, c, 31))
    assert int(g.alive_mask().sum()) >= 6   # repeat splits the genome
    rpath = sort_reads(cfg)
    out_fa = molecule_contigs(cfg, g, rpath)
    recs = list(read_fasta(out_fa))
    assert recs
    # total molecule sequence should cover most of the genome
    total = sum(len(s) for _, s in recs)
    assert total >= 15000, total
