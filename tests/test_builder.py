"""Vectorized barcode attachment == per-read reference implementation."""

import numpy as np

from turingassembler_tpu.barcode import builder as B
from turingassembler_tpu.graph.from_contigs import graph_from_contigs
from turingassembler_tpu import testing as tt


def make_graph(n=6, L=12000):
    rng = np.random.default_rng(0)
    return graph_from_contigs(
        [tt.codes_to_str(rng.integers(0, 4, L).astype(np.uint8))
         for _ in range(n)], 45)


def test_bulk_attach_matches_scalar():
    rng = np.random.default_rng(1)
    g1, g2 = make_graph(), make_graph()
    B.init_barcode_structs(g1)
    B.init_barcode_structs(g2)
    lens = g1.edge_len()
    N = 5000
    edges = rng.integers(-1, g1.n_e, N).astype(np.int32)
    pos = rng.integers(0, 12000, N).astype(np.int32)
    bcs = rng.integers(0, 50, N).astype(np.uint64)
    bcs[rng.random(N) < 0.05] = np.uint64(0xFFFFFFFFFFFFFFFF)

    # scalar reference
    for i in range(N):
        e, p, bc = int(edges[i]), int(pos[i]), int(bcs[i])
        if e < 0 or bc == 0xFFFFFFFFFFFFFFFF:
            continue
        B._attach(g1, lens, e, p, bc)
    # vectorized
    B._bulk_attach(g2, lens, edges, pos, bcs)

    for e in range(g1.n_e):
        for lvl in range(3):
            assert g1.barcodes[e][lvl] == g2.barcodes[e][lvl], (e, lvl)
        assert g1.barcodes_scaf[e] == g2.barcodes_scaf[e], e
        assert g1.barcodes_cov[e] == g2.barcodes_cov[e], e


def test_mirror_hits_positions():
    """Mirror record of a hit: (rc(e), len - pos - aligned); tail
    overhang mirrors to pos 0 (reference indexes both strand records,
    src/barcode_resolve2.c:1476-1488)."""
    g = make_graph(n=2, L=2000)
    lens = g.edge_len()
    e = np.array([0, 0, -1], np.int32)
    p = np.array([100, 1950, 5], np.int32)     # interior; 50-base overhang
    ql = np.array([100, 100, 100], np.int32)
    em, pm = B._mirror_hits(g, lens, e, p, ql)
    rc0 = int(g.edge_rc[0])
    assert em.tolist() == [rc0, rc0, -1]
    assert pm[0] == 2000 - 100 - 100
    assert pm[1] == 0                          # clipped aligned = 50
    assert pm[2] == -1


def test_candidate_pairs_junction_counted():
    """Junction-spanning FR pairs must reach the candidate tally: the
    votes sit near their records' TAILS, so only the mirror-expanded
    combos pass the pos1 + pos2 < 350 gate (reference read_mapper
    stage 3 loops all n1 x n2 strand records, barcode_builder.c:814-830;
    VERDICT r2 #6 flagged the vote-only gate as missing these)."""
    g = make_graph(n=2, L=2000)
    lens = g.edge_len()
    A, rcA = 0, int(g.edge_rc[0])
    Bfw = [e for e in range(g.n_e) if e not in (A, rcA)][0]
    Brc = int(g.edge_rc[Bfw])
    ql = np.full(1, 100, np.int32)

    def tally(e1, p1, e2, p2):
        e1 = np.array([e1], np.int32); p1 = np.array([p1], np.int32)
        e2 = np.array([e2], np.int32); p2 = np.array([p2], np.int32)
        h1 = (e1, p1) + B._mirror_hits(g, lens, e1, p1, ql)
        h2 = (e2, p2) + B._mirror_hits(g, lens, e2, p2, ql)
        return {(k >> 32, k & 0xFFFFFFFF): c
                for k, c in B._candidate_pair_keys(g, h1, h2)}

    # FR pair across the A->B junction: r1 fwd at tail of A, r2 votes
    # rc(B) near ITS tail (the mate sits at B's head)
    fr = tally(A, 1850, Brc, 1850)
    # the consistent frame: mirrored records sit near the heads
    assert (rcA, Bfw) in fr and (Bfw, rcA) in fr
    # mates far from every record end tally nothing
    mid = tally(A, 900, Brc, 900)
    assert not mid


def test_rp_counts_orientation_structural():
    """Read-pair counts are keyed by the FORWARD record of each mate,
    so a same-genome-strand (FF) false pair supports a DIFFERENT
    orientation key than a true FR pair — the vote frame is the
    reference's strand gate (rp_count_mapper keeps same-strand record
    combos and rc-swaps them, src/barcode_builder.c:705-727; VERDICT
    r2 #6).  An FF artifact therefore cannot inflate the true A->B
    candidate."""
    from turingassembler_tpu.resolve.readpairs import build_rp_cand
    g = make_graph(n=2, L=2000)
    A, rcA = 0, int(g.edge_rc[0])
    Bfw = [e for e in range(g.n_e) if e not in (A, rcA)][0]
    Brc = int(g.edge_rc[Bfw])
    # true FR junction pair votes (A, rc(B)); both directed orders
    # counted (reference kh adds code and code_rc)
    fr_counts = {(A, Brc): 1, (Brc, A): 1}
    cand_fr = build_rp_cand(g, fr_counts)
    assert (Bfw, 2) in [(u, c) for u, c in cand_fr.get(A, [])] or \
        any(u == Bfw for u, _ in cand_fr.get(A, []))
    # FF artifact votes (A, B-forward) -> supports A followed by rc(B),
    # NOT A->B
    ff_counts = {(A, Bfw): 1, (Bfw, A): 1}
    cand_ff = build_rp_cand(g, ff_counts)
    assert all(u != Bfw for u, _ in cand_ff.get(A, []))
    assert any(u == Brc for u, _ in cand_ff.get(A, []))
