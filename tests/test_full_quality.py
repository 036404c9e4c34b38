"""Full-pipeline quality: a repeat-planted genome must assemble gapless.

Mirrors the reference's headline claim (README.md:13: "gapless assembly"
for E. coli TELL-Seq): the graph alone breaks at planted repeats, and
the read-cloud machinery (barcode scaffolding + per-gap local assembly)
must close them.
"""

import os

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.cli import main as cli_main
from turingassembler_tpu.evaluate import evaluate_assembly
from turingassembler_tpu.io.fasta import read_fasta
from turingassembler_tpu.io.fastq import encode_barcode


@pytest.mark.slow
def test_repeat_genome_gapless_through_assembly3(tmp_path):
    rng = np.random.default_rng(123)
    genome = rng.integers(0, 4, 100_000).astype(np.uint8)
    rep = rng.integers(0, 4, 700).astype(np.uint8)
    for pos in (25_000, 60_000):
        genome[pos : pos + 700] = rep

    r1, r2, l1, l2, bcs = tt.sim_barcoded_pairs(
        genome, molecule_len=12_000, n_molecules=2500,
        reads_per_molecule=20, read_len=120, insert=300, seed=1,
        error_rate=0.002)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    f1, f2, fI = (str(tmp_path / n) for n in ["R1.fq", "R2.fq", "I1.fq"])
    with open(f1, "w") as o1, open(f2, "w") as o2, open(fI, "w") as oI:
        for i in range(len(r1)):
            o1.write(f"@r{i}\n{ACGT[r1[i]].tobytes().decode()}\n+\n{'I'*120}\n")
            o2.write(f"@r{i}\n{ACGT[r2[i]].tobytes().decode()}\n+\n{'I'*120}\n")
            oI.write(f"@r{i}\n{encode_barcode(int(bcs[i])+1,16).decode()}\n+\n{'I'*16}\n")

    out = str(tmp_path / "out")
    rc = cli_main(["assembly3", "-1", f1, "-2", f2, "-I", fI,
                   "-l", "ust", "-k0", "45", "-mc", "2", "-o", out])
    assert rc == 0
    final = os.path.join(out, "scaffold.full.fasta")
    contigs = [s for _, s in read_fasta(final)]
    res = evaluate_assembly(contigs, tt.codes_to_str(genome))
    assert res.n_misassemblies == 0
    assert res.genome_fraction > 0.97
    # repeats must be bridged: NGA50 close to the full genome
    assert res.nga50 >= 0.9 * len(genome), res
    # residual-error parity (VERDICT r4 #3): the simulated library's
    # substitution errors (error_rate=0.002, ~37x) must wash out in the
    # consensus to at or below the reference's published real-data
    # residuals (5.65 mismatches / 0.47 indel bases per 100 kbp,
    # /root/reference/README.md:13-15)
    assert res.mismatches_per_100kbp <= 5.65, res
    assert res.indels_per_100kbp <= 0.47, res


@pytest.mark.slow
def test_1mbp_repeat_family_gapless_through_assembly3(tmp_path):
    """The megabase gate (VERDICT r3 #7): the closest approachable proxy
    for the E. coli config (BASELINE.json configs[2], 4.6 Mbp) — a 1 Mbp
    genome with a planted repeat FAMILY must come out gapless with
    NGA50 >= 0.9x genome and 0 misassemblies, and the stage wall-clock
    shares go to stderr for NOTES tracking."""
    import sys
    import time

    rng = np.random.default_rng(321)
    genome = rng.integers(0, 4, 1_000_000).astype(np.uint8)
    rep = rng.integers(0, 4, 700).astype(np.uint8)
    for pos in (150_000, 380_000, 610_000, 840_000):
        copy = rep.copy()
        # 99%-identity family: each copy mutates ~7 positions
        mut = rng.integers(0, 700, 7)
        copy[mut] = (copy[mut] + rng.integers(1, 4, 7)) % 4
        genome[pos : pos + 700] = copy

    r1, r2, l1, l2, bcs = tt.sim_barcoded_pairs(
        genome, molecule_len=12_000, n_molecules=13_000,
        reads_per_molecule=12, read_len=120, insert=300, seed=9,
        error_rate=0.002)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    f1, f2, fI = (str(tmp_path / n) for n in ["R1.fq", "R2.fq", "I1.fq"])
    with open(f1, "w") as o1, open(f2, "w") as o2, open(fI, "w") as oI:
        for i in range(len(r1)):
            o1.write(f"@r{i}\n{ACGT[r1[i]].tobytes().decode()}\n+\n{'I'*120}\n")
            o2.write(f"@r{i}\n{ACGT[r2[i]].tobytes().decode()}\n+\n{'I'*120}\n")
            oI.write(f"@r{i}\n{encode_barcode(int(bcs[i])+1,16).decode()}\n+\n{'I'*16}\n")

    out = str(tmp_path / "out")
    t0 = time.time()
    rc = cli_main(["assembly3", "-1", f1, "-2", f2, "-I", fI,
                   "-l", "ust", "-k0", "45", "-mc", "2", "-o", out])
    wall = time.time() - t0
    assert rc == 0
    final = os.path.join(out, "scaffold.full.fasta")
    contigs = [s for _, s in read_fasta(final)]
    res = evaluate_assembly(contigs, tt.codes_to_str(genome))
    print(f"\n1Mbp gate: {len(r1)} pairs, assembly3 wall {wall:.0f}s, "
          f"NGA50 {res.nga50:,} misasm {res.n_misassemblies} "
          f"genome_fraction {res.genome_fraction:.3f}", file=sys.stderr)
    assert res.n_misassemblies == 0
    assert res.genome_fraction > 0.97
    assert res.nga50 >= 0.9 * len(genome), res
    # residual-error parity (VERDICT r4 #3): the simulated library's
    # substitution errors (error_rate=0.002, ~37x) must wash out in the
    # consensus to at or below the reference's published real-data
    # residuals (5.65 mismatches / 0.47 indel bases per 100 kbp,
    # /root/reference/README.md:13-15)
    assert res.mismatches_per_100kbp <= 5.65, res
    assert res.indels_per_100kbp <= 0.47, res


@pytest.mark.slow
def test_harsh_read_cloud_gapless_through_assembly3(tmp_path):
    """Harsher real-read-cloud proxy (VERDICT r4 #8): 0.5% substitution
    errors, 10% barcode collisions (two molecules, one barcode — real
    TELL-Seq/10X put several molecules per barcode), and 3% chimeric
    molecules (GEM artifacts).  The repeat-planted genome must still
    come out gapless with 0 misassemblies — the cheapest available
    stand-in for the missing real-data risk (VERDICT r4 missing #2)."""
    rng = np.random.default_rng(55)
    genome = rng.integers(0, 4, 100_000).astype(np.uint8)
    rep = rng.integers(0, 4, 700).astype(np.uint8)
    for pos in (25_000, 60_000):
        genome[pos : pos + 700] = rep

    r1, r2, l1, l2, bcs = tt.sim_barcoded_pairs_fast(
        genome, molecule_len=12_000, n_molecules=2500,
        reads_per_molecule=20, read_len=120, insert=300, seed=3,
        error_rate=0.005, collision_rate=0.10, chimera_rate=0.03)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    f1, f2, fI = (str(tmp_path / n) for n in ["R1.fq", "R2.fq", "I1.fq"])
    with open(f1, "w") as o1, open(f2, "w") as o2, open(fI, "w") as oI:
        for i in range(len(r1)):
            o1.write(f"@r{i}\n{ACGT[r1[i]].tobytes().decode()}\n+\n{'I'*120}\n")
            o2.write(f"@r{i}\n{ACGT[r2[i]].tobytes().decode()}\n+\n{'I'*120}\n")
            oI.write(f"@r{i}\n{encode_barcode(int(bcs[i])+1,16).decode()}\n+\n{'I'*16}\n")

    out = str(tmp_path / "out")
    rc = cli_main(["assembly3", "-1", f1, "-2", f2, "-I", fI,
                   "-l", "ust", "-k0", "45", "-mc", "2", "-o", out])
    assert rc == 0
    final = os.path.join(out, "scaffold.full.fasta")
    contigs = [s for _, s in read_fasta(final)]
    res = evaluate_assembly(contigs, tt.codes_to_str(genome))
    assert res.n_misassemblies == 0
    assert res.genome_fraction > 0.97
    assert res.nga50 >= 0.9 * len(genome), res
    assert res.mismatches_per_100kbp <= 5.65, res
    assert res.indels_per_100kbp <= 0.47, res


@pytest.mark.slow
def test_k63_repeat_genome_gapless_through_assembly3(tmp_path):
    """The k63 global-DBG gate (BASELINE.json configs[3]: the
    S. cerevisiae linked-read config runs the k63 path).  Same shape as
    the k45 gate but the whole pipeline — 64-base (k0+1)-mer counting
    (4-limb keys — ceil(64/16), ops/limbs.py), level-0 build, resolve, mapping,
    scaffolding, bridging — runs at k0=63 end to end.  Reference
    analogue: the user-selectable odd k0 up to 63
    (/root/reference/src/main.c:52,196-197,317-318)."""
    rng = np.random.default_rng(77)
    genome = rng.integers(0, 4, 120_000).astype(np.uint8)
    rep = rng.integers(0, 4, 700).astype(np.uint8)
    for pos in (30_000, 75_000):
        genome[pos : pos + 700] = rep

    r1, r2, l1, l2, bcs = tt.sim_barcoded_pairs(
        genome, molecule_len=12_000, n_molecules=2600,
        reads_per_molecule=20, read_len=150, insert=350, seed=2,
        error_rate=0.002)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    f1, f2, fI = (str(tmp_path / n) for n in ["R1.fq", "R2.fq", "I1.fq"])
    with open(f1, "w") as o1, open(f2, "w") as o2, open(fI, "w") as oI:
        for i in range(len(r1)):
            o1.write(f"@r{i}\n{ACGT[r1[i]].tobytes().decode()}\n+\n{'I'*150}\n")
            o2.write(f"@r{i}\n{ACGT[r2[i]].tobytes().decode()}\n+\n{'I'*150}\n")
            oI.write(f"@r{i}\n{encode_barcode(int(bcs[i])+1,16).decode()}\n+\n{'I'*16}\n")

    out = str(tmp_path / "out")
    rc = cli_main(["assembly3", "-1", f1, "-2", f2, "-I", fI,
                   "-l", "ust", "-k0", "63", "-mc", "2", "-o", out])
    assert rc == 0
    final = os.path.join(out, "scaffold.full.fasta")
    contigs = [s for _, s in read_fasta(final)]
    res = evaluate_assembly(contigs, tt.codes_to_str(genome))
    assert res.n_misassemblies == 0
    assert res.genome_fraction > 0.97
    assert res.nga50 >= 0.9 * len(genome), res
    # residual-error parity (VERDICT r4 #3): the simulated library's
    # substitution errors (error_rate=0.002, ~37x) must wash out in the
    # consensus to at or below the reference's published real-data
    # residuals (5.65 mismatches / 0.47 indel bases per 100 kbp,
    # /root/reference/README.md:13-15)
    assert res.mismatches_per_100kbp <= 5.65, res
    assert res.indels_per_100kbp <= 0.47, res
