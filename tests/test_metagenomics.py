"""Metagenomics mode: mixed genomes at unequal coverage.

The reference's -metagenomics branch skips low-coverage contig removal
in scaffolding (scaffolding.c:704-706) and marks all contigs usable
once (init_mark :592-606).
"""

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.config import Config
from turingassembler_tpu.graph.build import build_graph_from_kedges
from turingassembler_tpu.graph.invariants import check_graph
from turingassembler_tpu.kmer.count import count_kedges_from_reads
from turingassembler_tpu.evaluate import evaluate_assembly


def test_mixed_community_assembles_both_genomes():
    # two "species" at 40x and 8x coverage
    gA = tt.random_genome(15_000, seed=1)
    gB = tt.random_genome(12_000, seed=2)
    rA, lA = tt.sim_reads(gA, coverage=40, read_len=120, seed=3)
    rB, lB = tt.sim_reads(gB, coverage=8, read_len=120, seed=4)
    reads = np.concatenate([rA, rB])
    lengths = np.concatenate([lA, lB])
    ke, c = count_kedges_from_reads(reads, lengths, 31)
    g = build_graph_from_kedges(ke, c, 31)
    check_graph(g)
    contigs = [tt.codes_to_str(g.get_seq(e))
               for e in range(g.n_e)
               if g.edge_source[e] >= 0 and e <= g.edge_rc[e]
               and g.edge_len(e) >= 500]
    resA = evaluate_assembly(contigs, tt.codes_to_str(gA))
    resB = evaluate_assembly(contigs, tt.codes_to_str(gB))
    assert resA.genome_fraction > 0.95
    assert resB.genome_fraction > 0.8  # low-coverage species still assembled
    assert resA.n_misassemblies == 0 and resB.n_misassemblies == 0


def test_metagenomics_scaffold_keeps_low_cov(tmp_path):
    from turingassembler_tpu.graph.from_contigs import graph_from_contigs
    from turingassembler_tpu.scaffold.scaffolding import scaffolding
    rng = np.random.default_rng(5)
    contigs = [rng.integers(0, 4, 5000).astype(np.uint8) for _ in range(2)]
    g = graph_from_contigs([tt.codes_to_str(c) for c in contigs], 45)
    lens = g.edge_len()
    # contig 0 at cov 30, contig 1 at cov 1 (would be dropped non-meta)
    g.edge_count = np.array([30 * (lens[0] - 45), 30 * (lens[1] - 45),
                             1 * (lens[2] - 45), 1 * (lens[3] - 45)], np.int64)
    g.barcodes = [[{}, {}, {}] for _ in range(g.n_e)]
    g.barcodes_scaf = [{i: 1 for i in range(80)} for _ in range(g.n_e)]
    g.barcodes_cov = [{} for _ in range(g.n_e)]
    g.aux_flag |= 1

    cfg = Config(out_dir=str(tmp_path), metagenomics=True)
    scaffolding(cfg, g, str(tmp_path))
    fa = (tmp_path / "scaffolds.fasta").read_text()
    n_records = fa.count(">")
    assert n_records >= 2  # low-cov contig survived in metagenomics mode
