"""Scaffolder unit test: fabricated barcode sets must order contigs."""

import os

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.config import Config
from turingassembler_tpu.graph.from_contigs import graph_from_contigs
from turingassembler_tpu.scaffold.scaffolding import scaffolding


def test_scaffold_orders_contigs(tmp_path):
    rng = np.random.default_rng(4)
    contigs = [rng.integers(0, 4, 6000).astype(np.uint8) for _ in range(3)]
    g = graph_from_contigs([tt.codes_to_str(c) for c in contigs], 45)
    # counts give uniform coverage ~30
    lens = g.edge_len()
    g.edge_count = (30 * np.maximum(lens - g.ksize, 1)).astype(np.int64)

    # barcode sets: chain 0 -> 1 -> 2.  barcodes_scaf of edge e covers the
    # HEAD of e; a molecule spanning the junction between contig i tail
    # and contig i+1 head lands in scaf(rc(edge_i)) and scaf(edge_{i+1}).
    g.barcodes = [[{}, {}, {}] for _ in range(g.n_e)]
    g.barcodes_scaf = [{} for _ in range(g.n_e)]
    g.barcodes_cov = [{} for _ in range(g.n_e)]
    g.aux_flag |= 1

    def fw(i):
        return 2 * i

    def rc(i):
        return 2 * i + 1

    bc = 0

    def bcs(n):
        nonlocal bc
        out = {bc + j: 1 for j in range(n)}
        bc += n
        return out

    # junction 0-1: 100 shared barcodes between scaf(rc(0)) and scaf(fw(1))
    j01 = bcs(100)
    j12 = bcs(100)
    head0 = bcs(100)   # private barcodes so every set has >= 75 items
    head1 = bcs(20)
    head2 = bcs(20)
    tail2 = bcs(100)
    g.barcodes_scaf[fw(0)] = dict(head0)
    g.barcodes_scaf[rc(0)] = {**j01, **bcs(10)}
    g.barcodes_scaf[fw(1)] = {**j01, **head1}
    g.barcodes_scaf[rc(1)] = {**j12, **head2}
    g.barcodes_scaf[fw(2)] = {**j12, **bcs(10)}
    g.barcodes_scaf[rc(2)] = dict(tail2)

    cfg = Config(out_dir=str(tmp_path))
    path_file = scaffolding(cfg, g, str(tmp_path))
    txt = open(path_file).read().split()
    n_paths = int(txt[0])
    assert n_paths == 1
    ln = int(txt[1])
    assert ln == 3
    path = [int(x) for x in txt[2:5]]
    # expect the chain 0 -> 1 -> 2 in either direction
    ids = [p // 2 for p in path]
    assert ids == [0, 1, 2] or ids == [2, 1, 0]
    assert os.path.exists(str(tmp_path / "scaffolds.fasta"))
