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
