"""End-to-end pipeline + CLI on synthetic FASTQ files."""

import gzip
import os

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.barcode.sort_read import (
    fetch_reads_by_barcodes,
    load_barcode_index,
    parse_fastq_blob,
    sort_reads,
)
from turingassembler_tpu.cli import main as cli_main
from turingassembler_tpu.config import Config, LIB_TYPE_UST
from turingassembler_tpu.io.fasta import read_fasta
from turingassembler_tpu.io.fastq import encode_barcode


def write_synthetic_library(tmp_path, genome, n_molecules=200, seed=0):
    r1, r2, l1, l2, bcs = tt.sim_barcoded_pairs(
        genome, molecule_len=3000, n_molecules=n_molecules,
        reads_per_molecule=40, read_len=100, insert=250, seed=seed)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    f1, f2, fI = (str(tmp_path / n) for n in ["R1.fq", "R2.fq", "I1.fq"])
    with open(f1, "w") as o1, open(f2, "w") as o2, open(fI, "w") as oI:
        for i in range(len(r1)):
            s1 = ACGT[r1[i]].tobytes().decode()
            s2 = ACGT[r2[i]].tobytes().decode()
            bseq = encode_barcode(int(bcs[i]) + 1, 16).decode()
            o1.write(f"@read{i}\n{s1}\n+\n{'I'*len(s1)}\n")
            o2.write(f"@read{i}\n{s2}\n+\n{'I'*len(s2)}\n")
            oI.write(f"@read{i}\n{bseq}\n+\n{'I'*16}\n")
    return f1, f2, fI, bcs


def test_cli_basic_pipeline(tmp_path):
    genome = tt.random_genome(12000, seed=3)
    f1, f2, fI, _ = write_synthetic_library(tmp_path, genome)
    out = str(tmp_path / "out")
    rc = cli_main(["basic", "-1", f1, "-2", f2, "-I", fI,
                   "-l", "ust", "-k0", "31", "-o", out])
    assert rc == 0
    for lvl in ["level_0", "level_1", "level_2"]:
        for ext in ["bin", "gfa", "fasta"]:
            assert os.path.exists(os.path.join(out, f"graph_k_31_{lvl}.{ext}")), (lvl, ext)
    recs = list(read_fasta(os.path.join(out, "graph_k_31_level_2.fasta")))
    assert len(recs) >= 1
    # molecule sampling undercovers the genome ends; allow a margin
    big = max(len(s) for _, s in recs)
    assert big >= len(genome) - 600
    gstr = tt.codes_to_str(genome)
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    for _, s in recs:
        if len(s) == big:
            rc_s = "".join(comp[c] for c in reversed(s))
            assert s in gstr or rc_s in gstr


def test_sort_read_and_index(tmp_path):
    genome = tt.random_genome(6000, seed=9)
    f1, f2, fI, bcs = write_synthetic_library(tmp_path, genome, n_molecules=25, seed=4)
    out = str(tmp_path / "sorted")
    cfg = Config(files_1=(f1,), files_2=(f2,), files_I=(fI,),
                 lib_type=LIB_TYPE_UST, out_dir=out)
    rpath = sort_reads(cfg)
    assert os.path.exists(rpath.idx_path)
    index = load_barcode_index(rpath.idx_path)
    # every barcode present
    from turingassembler_tpu.io.fastq import decode_barcode_seq
    want_bcs = {decode_barcode_seq(encode_barcode(int(b) + 1, 16)) for b in bcs}
    assert set(index) == want_bcs

    # sorted R1 is grouped: offsets are increasing and contiguous
    offs = sorted((v[0], v[2]) for v in index.values())
    end = 0
    for o, l in offs:
        assert o == end
        end = o + l
    assert end == os.path.getsize(rpath.R1_path)

    # random-access fetch returns exactly that barcode's reads
    some = list(index)[:3]
    blob1, blob2 = fetch_reads_by_barcodes(rpath, index, some)
    names, seqs, quals, comments = parse_fastq_blob(blob1)
    assert len(names) > 0
    for cm in comments:
        assert cm.startswith(b"BX:Z:")
        bcseq = cm.split()[0][5:]
        assert decode_barcode_seq(bcseq) in some


def test_cli_gzip_inputs(tmp_path):
    """End-to-end with gzip-compressed FASTQ through the native loader."""
    import gzip
    genome = tt.random_genome(8000, seed=17)
    f1, f2, fI, _ = write_synthetic_library(tmp_path, genome, n_molecules=80)
    for f in (f1, f2):
        with open(f, "rb") as src, gzip.open(f + ".gz", "wb") as dst:
            dst.write(src.read())
    out = str(tmp_path / "gz_out")
    rc = cli_main(["basic", "-1", f1 + ".gz", "-2", f2 + ".gz",
                   "-l", "bioturing", "-k0", "31", "-o", out])
    assert rc == 0
    recs = list(read_fasta(os.path.join(out, "graph_k_31_level_2.fasta")))
    assert recs and max(len(s) for _, s in recs) >= 7000


def test_cli_stage_subcommands(tmp_path):
    """build_3_4 / build_4_5 / resolve_bulges / resolve_complex_bulges /
    resolve_212_cov load a graph file and write their stage output
    (reference per-stage CLI resume, SURVEY.md §5.4)."""
    genome = tt.random_genome(9000, seed=23)
    f1, f2, fI, _ = write_synthetic_library(tmp_path, genome, n_molecules=80)
    out = str(tmp_path / "out")
    rc = cli_main(["basic", "-1", f1, "-2", f2, "-I", fI,
                   "-l", "ust", "-k0", "31", "-o", out])
    assert rc == 0
    lvl2 = os.path.join(out, "graph_k_31_level_2.bin")
    for cmd, suffix in [("build_3_4", "level_4"),
                        ("build_4_5", "level_5"),
                        ("resolve_bulges", "bulges_resolved"),
                        ("resolve_complex_bulges", "complex_bulges_resolved"),
                        ("resolve_212_cov", "212_resolved")]:
        d = str(tmp_path / cmd)
        rc = cli_main([cmd, "-i", lvl2, "-k0", "31", "-o", d])
        assert rc == 0, cmd
        assert os.path.exists(os.path.join(d, f"graph_k_31_{suffix}.bin")), cmd


def test_cli_minimizers_hit(tmp_path):
    """minimizers_hit writes the all-barcode hit table csv."""
    genome = tt.random_genome(9000, seed=29)
    f1, f2, fI, _ = write_synthetic_library(tmp_path, genome, n_molecules=60)
    out = str(tmp_path / "out")
    assert cli_main(["basic", "-1", f1, "-2", f2, "-I", fI,
                     "-l", "ust", "-k0", "31", "-o", out]) == 0
    assert cli_main(["sort_read", "-1", f1, "-2", f2, "-I", fI,
                     "-l", "ust", "-o", out]) == 0
    lvl2 = os.path.join(out, "graph_k_31_level_2.bin")
    rc = cli_main(["minimizers_hit", "-i", lvl2, "-l", "sorted",
                   "-1", os.path.join(out, "R1.sorted.fq"),
                   "-2", os.path.join(out, "R2.sorted.fq"),
                   "-I", os.path.join(out, "barcode.idx"),
                   "-o", out])
    assert rc == 0
    csv = os.path.join(out, "barcode_hits.csv")
    assert os.path.exists(csv)
    rows = open(csv).read().splitlines()
    assert rows and all(len(r.split(",")) == 3 for r in rows)


def test_cli_assembly3_10x(tmp_path):
    """Full assembly3 with a 10X-style library: 16bp barcode + 7bp UMI
    prefixed to R1 (reference get_barcode_10x, src/sort_read.c:62-79)."""
    from turingassembler_tpu.io.fastq import encode_barcode
    genome = tt.random_genome(15000, seed=37)
    r1, r2, l1, l2, bcs = tt.sim_barcoded_pairs(
        genome, molecule_len=4000, n_molecules=80,
        reads_per_molecule=40, read_len=100, insert=250, seed=8)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    f1, f2 = str(tmp_path / "R1.fq"), str(tmp_path / "R2.fq")
    with open(f1, "w") as o1, open(f2, "w") as o2:
        for i in range(len(r1)):
            s1 = ACGT[r1[i]].tobytes().decode()
            s2 = ACGT[r2[i]].tobytes().decode()
            bseq = encode_barcode(int(bcs[i]) + 1, 16).decode()
            o1.write(f"@read{i}\n{bseq}AAAAAAA{s1}\n+\n{'I'*(23+len(s1))}\n")
            o2.write(f"@read{i}\n{s2}\n+\n{'I'*len(s2)}\n")
    out = str(tmp_path / "out")
    rc = cli_main(["assembly3", "-1", f1, "-2", f2, "-l", "10x",
                   "-k0", "31", "-lk", "21", "-o", out])
    assert rc == 0
    final = os.path.join(out, "scaffold.full.fasta")
    assert os.path.exists(final)
    recs = list(read_fasta(final))
    assert recs and max(len(s) for _, s in recs) >= 12000
