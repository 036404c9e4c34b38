"""Full pipeline end-to-end: repeat-split genome, barcode scaffolding,
local-assembly bridging -> scaffold.full.fasta."""

import os

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.cli import main as cli_main
from turingassembler_tpu.io.fasta import read_fasta
from turingassembler_tpu.io.fastq import encode_barcode


def make_repeat_genome(seed=11):
    rng = np.random.default_rng(seed)
    A = rng.integers(0, 4, 6000).astype(np.uint8)
    R = rng.integers(0, 4, 1500).astype(np.uint8)
    B = rng.integers(0, 4, 6000).astype(np.uint8)
    C = rng.integers(0, 4, 6000).astype(np.uint8)
    return np.concatenate([A, R, B, R, C])


def write_library(tmp_path, genome, n_molecules=2500, seed=1):
    r1, r2, l1, l2, bcs = tt.sim_barcoded_pairs(
        genome, molecule_len=5000, n_molecules=n_molecules,
        reads_per_molecule=18, read_len=100, insert=280, seed=seed)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    f1, f2, fI = (str(tmp_path / n) for n in ["R1.fq", "R2.fq", "I1.fq"])
    with open(f1, "w") as o1, open(f2, "w") as o2, open(fI, "w") as oI:
        for i in range(len(r1)):
            o1.write(f"@r{i}\n{ACGT[r1[i]].tobytes().decode()}\n+\n{'I'*100}\n")
            o2.write(f"@r{i}\n{ACGT[r2[i]].tobytes().decode()}\n+\n{'I'*100}\n")
            bseq = encode_barcode(int(bcs[i]) + 1, 16).decode()
            oI.write(f"@r{i}\n{bseq}\n+\n{'I'*16}\n")
    return f1, f2, fI


@pytest.mark.slow
def test_assembly3_end_to_end(tmp_path):
    genome = make_repeat_genome()
    f1, f2, fI = write_library(tmp_path, genome)
    out = str(tmp_path / "out")
    rc = cli_main(["assembly3", "-1", f1, "-2", f2, "-I", fI,
                   "-l", "ust", "-k0", "31", "-o", out])
    assert rc == 0
    final = os.path.join(out, "scaffold.full.fasta")
    assert os.path.exists(final)
    recs = list(read_fasta(final))
    assert recs, "empty final assembly"
    lens = sorted((len(s) for _, s in recs), reverse=True)
    # the three unique regions total 18 kb + repeats 3 kb; the largest
    # scaffold should span a large fraction of the genome
    assert lens[0] >= 8000, lens
    total = sum(lens)
    assert total >= 15000
