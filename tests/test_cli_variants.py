"""Reference-name CLI subcommand variants (src/main.c:426-503).

One synthetic library is assembled and sorted once (module scope); each
subcommand then drives its stage off the shared artifacts the way a
reference user resuming mid-pipeline would.
"""

import os

import pytest

from test_pipeline import write_synthetic_library
from turingassembler_tpu import testing as tt
from turingassembler_tpu.cli import COMMANDS, main as cli_main


@pytest.fixture(scope="module")
def assembled(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli_variants")
    genome = tt.random_genome(9000, seed=41)
    f1, f2, fI, _ = write_synthetic_library(tmp, genome, n_molecules=60,
                                            seed=5)
    out = str(tmp / "out")
    assert cli_main(["basic", "-1", f1, "-2", f2, "-I", fI,
                     "-l", "ust", "-k0", "31", "-o", out]) == 0
    assert cli_main(["sort_read", "-1", f1, "-2", f2, "-I", fI,
                     "-l", "ust", "-o", out]) == 0
    return {
        "tmp": tmp,
        "out": out,
        "lvl2": os.path.join(out, "graph_k_31_level_2.bin"),
        "lvl2_fasta": os.path.join(out, "graph_k_31_level_2.fasta"),
        "sorted_args": ["-l", "sorted",
                        "-1", os.path.join(out, "R1.sorted.fq"),
                        "-2", os.path.join(out, "R2.sorted.fq"),
                        "-I", os.path.join(out, "barcode.idx")],
    }


def test_alias_registration():
    """build_bridge / build_scaffolding_1_2 / debug_get_barcode_graph /
    resolve_molecule are the reference names for stages the repo also
    exposes under its own names; all must dispatch."""
    for name in ["build_2_3", "build_3_4_nobc", "build_barcode_coverage",
                 "build_barcode_fasta", "build_barcode_fastg",
                 "build_bridge", "build_scaffolding_1_2", "debug_current",
                 "debug_get_barcode_graph", "debug_split_molecules",
                 "dirty", "resolve_local", "resolve_molecule"]:
        assert name in COMMANDS, name


def test_build_2_3_and_dirty(assembled, tmp_path):
    d = str(tmp_path / "b23")
    assert cli_main(["build_2_3", "-i", assembled["lvl2"],
                     "-k0", "31", "-o", d]) == 0
    assert os.path.exists(os.path.join(d, "graph_k_31_level_3.bin"))
    assert cli_main(["dirty", "-i", assembled["lvl2"],
                     "-k0", "31", "-o", str(tmp_path / "dirty")]) == 0


def test_build_3_4_nobc(assembled, tmp_path):
    d = str(tmp_path / "nobc")
    assert cli_main(["build_3_4_nobc", "-i", assembled["lvl2"],
                     "-k0", "31", "-o", d]) == 0
    assert os.path.exists(os.path.join(d, "graph_k_31_level_4.bin"))


def test_resolve_local(assembled, tmp_path):
    d = str(tmp_path / "rl")
    assert cli_main(["resolve_local", "-i", assembled["lvl2"],
                     "-k0", "31", "-o", d]) == 0
    assert os.path.exists(os.path.join(d, "graph_k_31_level_2.bin"))


def test_build_barcode_coverage_then_scaffold_and_bridge(assembled):
    out = assembled["out"]
    assert cli_main(["build_barcode_coverage", "-i", assembled["lvl2"],
                     *assembled["sorted_args"], "-k0", "31",
                     "-o", out]) == 0
    bc_bin = os.path.join(out, "graph_k_31_added_barcode.bin")
    assert os.path.exists(bc_bin)

    # reference name for the scaffolding stage (process.c:158-177)
    assert cli_main(["build_scaffolding_1_2", "-i", bc_bin,
                     *assembled["sorted_args"], "-k0", "31",
                     "-o", out]) == 0
    assert os.path.exists(os.path.join(out, "scaffolds.fasta"))
    scaf = os.path.join(out, "local_assembly_scaffold_path.txt")
    assert os.path.exists(scaf)

    # reference name for local_assembly (main.c:458-461)
    assert cli_main(["build_bridge", "-i", bc_bin,
                     *assembled["sorted_args"], "-k0", "31",
                     "-o", out]) == 0
    assert os.path.exists(os.path.join(out, "scaffold.full.fasta"))


def test_build_barcode_fasta(assembled, tmp_path):
    d = str(tmp_path / "bcfasta")
    assert cli_main(["build_barcode_fasta", "-f", assembled["lvl2_fasta"],
                     *assembled["sorted_args"], "-k0", "31",
                     "-o", d]) == 0
    assert os.path.exists(os.path.join(d, "graph_k_31_from_fasta.bin"))
    assert os.path.exists(os.path.join(d, "graph_k_31_added_barcode.bin"))


def test_build_barcode_fastg(assembled, tmp_path):
    # adjacency-free FASTG of the level-2 contigs (each edge + its rc)
    from turingassembler_tpu.io.fasta import read_fasta
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    fg = str(tmp_path / "g.fastg")
    with open(fg, "w") as fp:
        for i, (_, s) in enumerate(read_fasta(assembled["lvl2_fasta"]), 1):
            rc = "".join(comp[c] for c in reversed(s))
            fp.write(f">EDGE_{i}_length_{len(s)}_cov_10;\n{s}\n")
            fp.write(f">EDGE_{i}_length_{len(s)}_cov_10';\n{rc}\n")
    d = str(tmp_path / "bcfastg")
    assert cli_main(["build_barcode_fastg", "-f", fg,
                     *assembled["sorted_args"], "-k0", "31",
                     "-o", d]) == 0
    assert os.path.exists(os.path.join(d, "graph_k_31_level_4.bin"))


def test_debug_current(assembled, tmp_path):
    d = str(tmp_path / "dbgcur")
    assert cli_main(["debug_current", "-i", assembled["lvl2"],
                     *assembled["sorted_args"], "-k0", "31",
                     "-o", d]) == 0
    assert os.path.exists(os.path.join(d, "graph_k_31_extend.fasta"))


def test_debug_split_molecules(assembled, tmp_path):
    out = assembled["out"]
    tmp_lib = assembled["tmp"]
    # frequency file from the raw library (reference feeds -f with the
    # count_bx output, process.c:276-280)
    d0 = str(tmp_path / "freq")
    assert cli_main(["count_bx",
                     "-1", str(tmp_lib / "R1.fq"),
                     "-2", str(tmp_lib / "R2.fq"),
                     "-I", str(tmp_lib / "I1.fq"),
                     "-l", "ust", "-o", d0]) == 0
    freq = os.path.join(d0, "barcode_frequencies.txt")
    assert os.path.exists(freq)
    d = str(tmp_path / "split")
    assert cli_main(["debug_split_molecules", "-i", assembled["lvl2"],
                     "-f", freq, *assembled["sorted_args"],
                     "-k0", "31", "-o", d]) == 0
    mol = os.path.join(d, "molecules_by_barcode.txt")
    # the 9 kb genome resolves to a single contig, so no barcode carries
    # two long edges and the molecule list is legitimately empty; chain
    # content is covered by test_molecules.py
    assert os.path.exists(mol)


def test_resolve_molecule(assembled, tmp_path):
    d = str(tmp_path / "rmol")
    assert cli_main(["resolve_molecule", "-i", assembled["lvl2"],
                     *assembled["sorted_args"], "-k0", "31",
                     "-o", d]) == 0
    assert os.path.exists(os.path.join(d, "molecules.fasta"))


def test_evaluate_subcommand(tmp_path, capsys):
    """`evaluate -f asm.fasta -ref truth.fasta` prints the QUAST-style
    report (NGA50 / misassemblies / genome fraction — the metrics of
    the reference's published claim, README.md:13-15) and exits 0 only
    when no truth record shows a misassembly."""
    g = tt.codes_to_str(tt.random_genome(30_000, seed=44))
    truth = str(tmp_path / "truth.fasta")
    asm = str(tmp_path / "asm.fasta")
    with open(truth, "w") as f:
        f.write(f">chr1\n{g}\n")
    with open(asm, "w") as f:
        f.write(f">c1\n{g[:18000]}\n>c2\n{g[17000:]}\n")
    assert cli_main(["evaluate", "-f", asm, "-ref", truth]) == 0
    out = capsys.readouterr().out
    assert "genome_fraction=1.000" in out and "misassemblies=0" in out

    with open(asm, "w") as f:                 # two distant spans glued
        f.write(f">bad\n{g[:5000] + g[20000:26000]}\n")
    assert cli_main(["evaluate", "-f", asm, "-ref", truth]) == 1
    assert cli_main(["evaluate"]) == 2        # missing args


def test_evaluate_subcommand_multi_record(tmp_path, capsys):
    """Multi-record truth runs ONE combined anchor index (ADVICE r4
    medium): per-record fractions are reported and a contig chimeric
    across records exits 1 as a translocation."""
    g1 = tt.codes_to_str(tt.random_genome(30_000, seed=45))
    g2 = tt.codes_to_str(tt.random_genome(25_000, seed=46))
    truth = str(tmp_path / "truth.fasta")
    asm = str(tmp_path / "asm.fasta")
    with open(truth, "w") as f:
        f.write(f">chr1\n{g1}\n>chr2\n{g2}\n")
    with open(asm, "w") as f:
        f.write(f">c1\n{g1}\n>c2\n{g2[:20000]}\n")
    assert cli_main(["evaluate", "-f", asm, "-ref", truth]) == 0
    out = capsys.readouterr().out
    assert "chr1: fraction 1.000" in out
    assert "chr2: fraction 0.800" in out

    with open(asm, "w") as f:                 # inter-record chimera
        f.write(f">bad\n{g1[:10000] + g2[5000:15000]}\n")
    assert cli_main(["evaluate", "-f", asm, "-ref", truth]) == 1
    out = capsys.readouterr().out
    assert "translocations=1" in out
