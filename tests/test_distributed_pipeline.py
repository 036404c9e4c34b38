"""N-process assembly3 end-to-end (SURVEY.md §5.8 / VERDICT r3 missing #3).

Launches the FULL pipeline as 2 OS processes through the CLI's --dist-*
flags: counting, the read-pair-count map, and the aux-info map stripe
over ranks and key-sum merge on rank 0; graph transforms and
scaffolding run on rank 0 between barriers.  The final assembly must
match the single-process run.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2


def _library(tmp, genome_size=60_000, n_molecules=1000):
    sys.path.insert(0, ROOT)
    from turingassembler_tpu import testing as tt
    from turingassembler_tpu.io.fastq import encode_barcode

    rng = np.random.default_rng(77)
    genome = rng.integers(0, 4, genome_size).astype(np.uint8)
    rep = rng.integers(0, 4, 700).astype(np.uint8)
    for frac in (0.25, 0.66):
        pos = int(frac * genome_size)
        genome[pos : pos + 700] = rep
    r1, r2, l1, l2, bcs = tt.sim_barcoded_pairs_fast(
        genome, molecule_len=12_000, n_molecules=n_molecules,
        reads_per_molecule=16, read_len=120, insert=300, seed=2,
        error_rate=0.002)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    f1, f2, fI = (os.path.join(tmp, n) for n in ["R1.fq", "R2.fq", "I1.fq"])
    with open(f1, "w") as o1, open(f2, "w") as o2, open(fI, "w") as oI:
        for i in range(len(r1)):
            o1.write(f"@r{i}\n{ACGT[r1[i]].tobytes().decode()}\n+\n"
                     f"{'I'*120}\n")
            o2.write(f"@r{i}\n{ACGT[r2[i]].tobytes().decode()}\n+\n"
                     f"{'I'*120}\n")
            oI.write(f"@r{i}\n{encode_barcode(int(bcs[i])+1,16).decode()}"
                     f"\n+\n{'I'*16}\n")
    return genome, f1, f2, fI


def _run_assembly3_nproc(tmp, genome, f1, f2, fI, n_proc, timeout=1800):
    """Single-process run + n_proc distributed run on the same inputs;
    asserts byte-identity and the quality gate.  Returns the contigs."""
    from turingassembler_tpu import testing as tt
    from turingassembler_tpu.evaluate import evaluate_assembly
    from turingassembler_tpu.io.fasta import read_fasta

    env_base = {**os.environ, "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": "--xla_force_host_platform_device_count=1"}

    # single-process reference
    out1 = os.path.join(tmp, "out_single")
    p = subprocess.run(
        [sys.executable, "-m", "turingassembler_tpu", "assembly3",
         "-1", f1, "-2", f2, "-I", fI, "-l", "ust", "-k0", "45",
         "-mc", "2", "-o", out1],
        env=env_base, cwd=ROOT, capture_output=True, text=True,
        timeout=timeout)
    assert p.returncode == 0, p.stdout + p.stderr

    # n-process run over the same inputs
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    out2 = os.path.join(tmp, "out_dist")
    procs = [subprocess.Popen(
        [sys.executable, "-m", "turingassembler_tpu", "assembly3",
         "-1", f1, "-2", f2, "-I", fI, "-l", "ust", "-k0", "45",
         "-mc", "2", "-o", out2,
         "--dist-coordinator", f"localhost:{port}",
         "--dist-nproc", str(n_proc), "--dist-pid", str(i)],
        env=env_base, cwd=ROOT, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT) for i in range(n_proc)]
    outs = []
    for pr in procs:
        out, _ = pr.communicate(timeout=timeout)
        outs.append(out.decode(errors="replace"))
    for i, pr in enumerate(procs):
        assert pr.returncode == 0, f"rank {i} failed:\n{outs[i][-4000:]}"

    fa1 = os.path.join(out1, "scaffold.full.fasta")
    fa2 = os.path.join(out2, "scaffold.full.fasta")
    assert os.path.exists(fa2), outs[0][-4000:]
    c1 = sorted(s for _, s in read_fasta(fa1))
    c2 = sorted(s for _, s in read_fasta(fa2))
    assert c1 == c2, (
        f"single vs {n_proc}-process assemblies differ: "
        f"{[len(s) for s in c1]} vs {[len(s) for s in c2]}")
    # and both must pass the quality gate
    res = evaluate_assembly([s for s in c2 if len(s) >= 500],
                            tt.codes_to_str(genome))
    assert res.n_misassemblies == 0
    assert res.nga50 >= 0.9 * len(genome), res
    return c2


@pytest.mark.slow
def test_two_process_assembly3(tmp_path):
    tmp = str(tmp_path)
    genome, f1, f2, fI = _library(tmp)
    _run_assembly3_nproc(tmp, genome, f1, f2, fI, 2)


@pytest.mark.slow
def test_four_process_assembly3(tmp_path):
    """4-rank variant (VERDICT r4 #6): stripes of 4 over counting, rp
    map, aux map, and gap prebuild must still merge to the identical
    assembly."""
    tmp = str(tmp_path)
    genome, f1, f2, fI = _library(tmp)
    _run_assembly3_nproc(tmp, genome, f1, f2, fI, 4)


@pytest.mark.slow
def test_two_process_assembly3_1mbp(tmp_path):
    """Megabase-scale distributed byte-identity (VERDICT r4 #6: the
    60 kb identity said little about shard imbalance / merge cost at
    scale).  1 Mbp genome, ~208k pairs, 2 OS processes."""
    tmp = str(tmp_path)
    genome, f1, f2, fI = _library(tmp, genome_size=1_000_000,
                                  n_molecules=13_000)
    _run_assembly3_nproc(tmp, genome, f1, f2, fI, 2, timeout=2700)
