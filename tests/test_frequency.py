"""Barcode frequency counting and dataset reduction (reference
count_bx_freq, src/minimizers/count_barcodes.c:354-457; fastq_reducer.c)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(__file__))

from turingassembler_tpu import testing as tt
from turingassembler_tpu.barcode.frequency import count_bx_freq, reduce_reads
from turingassembler_tpu.config import Config, LIB_TYPE_UST
from test_pipeline import write_synthetic_library


def test_count_bx_freq(tmp_path):
    genome = tt.random_genome(10000, seed=31)
    f1, f2, fI, bcs = write_synthetic_library(tmp_path, genome, n_molecules=50)
    cfg = Config(files_1=(f1,), files_2=(f2,), files_I=(fI,),
                 lib_type=LIB_TYPE_UST, out_dir=str(tmp_path))
    out = count_bx_freq(cfg)
    rows = [l.split("\t") for l in open(out).read().splitlines()]
    assert len(rows) == len(set(bcs))
    # total counted reads == number of index reads
    assert sum(int(c) for _, c in rows) == len(bcs)


def test_reduce_reads_keeps_head_mappers(tmp_path):
    from turingassembler_tpu.graph.from_contigs import graph_from_contigs
    genome = tt.random_genome(30000, seed=32)
    f1, f2, fI, _ = write_synthetic_library(tmp_path, genome,
                                            n_molecules=120)
    # contig = the genome itself; head regions are its first/last 1000bp
    g = graph_from_contigs([tt.codes_to_str(genome)], 45)
    cfg = Config(files_1=(f1,), files_2=(f2,), files_I=(fI,),
                 lib_type=LIB_TYPE_UST, out_dir=str(tmp_path / "red"))
    outs = reduce_reads(cfg, g)
    (o1, o2), = outs
    kept = open(o1).read().count("@read")
    total = open(f1).read().count("@read")
    assert 0 < kept < total  # strictly reduced, non-empty
    # kept fraction should be roughly the head fraction of the genome
    assert kept / total < 0.5
