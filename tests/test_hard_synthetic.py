"""Harder synthetic stress: indel+substitution errors, near-identical
repeat families, GC skew, mapper precision against truth, and non-UST
library types through the full pipeline (VERDICT r1 item 7)."""

import os

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.evaluate import evaluate_assembly
from turingassembler_tpu.graph.build import build_graph_from_kedges
from turingassembler_tpu.kmer.count import count_kedges_from_reads
from turingassembler_tpu.resolve import resolve_graph_operation


def _assemble(reads, lengths, k=31, min_count=3):
    ke, c = count_kedges_from_reads(reads, lengths, k, engine="np",
                                    min_count=min_count)
    g = build_graph_from_kedges(ke, c, k)
    return resolve_graph_operation(g)


def _contigs(g, min_len=500):
    return [tt.codes_to_str(g.get_seq(e)) for e in range(g.n_e)
            if g.edge_source[e] >= 0 and e <= g.edge_rc[e]
            and g.edge_len(e) >= min_len]


def test_assembly_with_indels_1pct():
    """1% substitutions + 0.4% indels at 45x still reassembles."""
    genome = tt.random_genome(40_000, seed=3)
    reads, lengths = tt.sim_reads(genome, coverage=45, read_len=120, seed=4)
    reads, lengths = tt.apply_indel_errors(reads, lengths, sub_rate=0.01,
                                           indel_rate=0.004, seed=5)
    g = _assemble(reads, lengths)
    res = evaluate_assembly(_contigs(g), tt.codes_to_str(genome))
    assert res.genome_fraction > 0.95, res
    assert res.n_misassemblies == 0


def test_repeat_family_95_identity():
    """95%-identity 2 kb repeat copies must not be collapsed into
    misjoins: unique segments reassemble cleanly."""
    genome = tt.genome_with_repeat_family(n_segments=4, segment_len=8000,
                                          repeat_len=2000, identity=0.95,
                                          seed=7)
    reads, lengths = tt.sim_reads(genome, coverage=40, read_len=120,
                                  error_rate=0.004, seed=8)
    g = _assemble(reads, lengths)
    res = evaluate_assembly(_contigs(g), tt.codes_to_str(genome))
    assert res.genome_fraction > 0.9, res
    assert res.n_misassemblies == 0


def test_gc_skewed_genome():
    genome = tt.gc_skewed_genome(30_000, gc=0.7, seed=9)
    reads, lengths = tt.sim_reads(genome, coverage=40, read_len=120,
                                  error_rate=0.01, seed=10)
    g = _assemble(reads, lengths)
    res = evaluate_assembly(_contigs(g), tt.codes_to_str(genome))
    assert res.genome_fraction > 0.95, res
    assert res.n_misassemblies == 0


def test_mapper_precision_recall_1pct_errors():
    """Minimizer-vote + DP-verify mapping measured against truth
    placements at 1% substitutions."""
    from turingassembler_tpu.graph.from_contigs import graph_from_contigs
    from turingassembler_tpu.mapper.minimizers import (EdgeMinimizerIndex,
                                                       map_reads)
    rng = np.random.default_rng(11)
    contigs = [tt.random_genome(6000, seed=20 + i) for i in range(4)]
    g = graph_from_contigs([tt.codes_to_str(c) for c in contigs], 45)
    idx = EdgeMinimizerIndex.build(g)
    # reads with known source contig (forward strand)
    N, L = 2000, 100
    src = rng.integers(0, 4, N)
    starts = rng.integers(0, 6000 - L, N)
    reads = np.stack([contigs[s][p : p + L] for s, p in zip(src, starts)])
    reads = reads.astype(np.uint8)
    errs = rng.random(reads.shape) < 0.01
    reads = np.where(errs, (reads + rng.integers(1, 4, reads.shape)) % 4,
                     reads).astype(np.uint8)
    lengths = np.full(N, L, np.int32)
    edges, _, starts_est = map_reads(idx, reads, lengths, graph=g)
    # which graph edge is contig i forward? from_contigs: edge 2i is fw
    truth_edge = np.array([g.edge_source[2 * s] * 0 + 2 * s for s in src])
    mapped = edges >= 0
    assert mapped.mean() > 0.9, mapped.mean()          # recall
    correct = (edges[mapped] == truth_edge[mapped])
    assert correct.mean() > 0.98, correct.mean()       # precision
    # estimated positions close to truth
    ok_pos = np.abs(starts_est[mapped] - starts[mapped]) <= 5
    assert ok_pos.mean() > 0.95


def _write_library(tmp_path, lib, genome, n_molecules=2500, seed=1):
    from turingassembler_tpu.io.fastq import encode_barcode
    r1, r2, l1, l2, bcs = tt.sim_barcoded_pairs(
        genome, molecule_len=5000, n_molecules=n_molecules,
        reads_per_molecule=18, read_len=100, insert=280, seed=seed,
        error_rate=0.004)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    f1, f2, fI = (str(tmp_path / n) for n in ["R1.fq", "R2.fq", "I1.fq"])
    with open(f1, "w") as o1, open(f2, "w") as o2, open(fI, "w") as oI:
        for i in range(len(r1)):
            s1 = ACGT[r1[i]].tobytes().decode()
            s2 = ACGT[r2[i]].tobytes().decode()
            bseq = encode_barcode(int(bcs[i]) + 1, 16).decode()
            if lib == "bioturing":
                o1.write(f"@r{i} BX:Z:{bseq} QB:Z:{'I'*16}\n{s1}\n+\n"
                         f"{'I'*100}\n")
            elif lib == "10x":
                o1.write(f"@r{i}\n{bseq}AAAAAAA{s1}\n+\n{'I'*123}\n")
            else:
                o1.write(f"@r{i}\n{s1}\n+\n{'I'*100}\n")
                oI.write(f"@r{i}\n{bseq}\n+\n{'I'*16}\n")
            o2.write(f"@r{i}\n{s2}\n+\n{'I'*100}\n")
    return f1, f2, fI


@pytest.mark.slow
@pytest.mark.parametrize("lib", ["bioturing", "10x"])
def test_assembly3_non_ust_libraries(tmp_path, lib):
    """Full assembly3 with BioT (BX:Z:) and 10X (inline barcode)
    libraries — round 1 only exercised UST end-to-end."""
    from tests.test_assembly3 import make_repeat_genome
    from turingassembler_tpu.cli import main as cli_main
    from turingassembler_tpu.io.fasta import read_fasta

    genome = make_repeat_genome()
    f1, f2, fI = _write_library(tmp_path, lib, genome)
    out = str(tmp_path / "out")
    args = ["assembly3", "-1", f1, "-2", f2, "-l", lib,
            "-k0", "31", "-o", out]
    if lib == "ust":
        args += ["-I", fI]
    rc = cli_main(args)
    assert rc == 0
    final = os.path.join(out, "scaffold.full.fasta")
    recs = list(read_fasta(final))
    assert recs
    lens = sorted((len(s) for _, s in recs), reverse=True)
    assert lens[0] >= 8000, lens
    assert sum(lens) >= 15000
