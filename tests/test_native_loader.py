"""Native C++ FASTQ loader vs the pure-python reader."""

import gzip

import numpy as np
import pytest

from turingassembler_tpu.io.fastq import read_fastq_batches
from turingassembler_tpu.io.native_loader import (
    native_available,
    read_fastq_batches_native,
)


def write_fq(path, n=1000, gz=False, seed=0):
    rng = np.random.default_rng(seed)
    op = gzip.open if gz else open
    with op(path, "wt") as fp:
        for i in range(n):
            L = int(rng.integers(50, 151))
            seq = "".join("ACGTN"[c] for c in rng.integers(0, 5, L))
            fp.write(f"@read_{i} BX:Z:AAAA\n{seq}\n+\n{'I' * L}\n")


@pytest.mark.parametrize("gz", [False, True])
def test_native_matches_python(tmp_path, gz):
    if not native_available():
        pytest.skip("native loader unavailable")
    p = str(tmp_path / ("a.fq.gz" if gz else "a.fq"))
    write_fq(p, n=1000, gz=gz)

    py_batches = list(read_fastq_batches(p, batch_size=256, pad_to=160,
                                         keep_text=True))
    nat_batches = list(read_fastq_batches_native(p, batch_size=256, pad_to=160,
                                                 with_headers=True))
    py_bases = np.concatenate([b.bases for b in py_batches])
    py_lens = np.concatenate([b.lengths for b in py_batches])
    nat_bases = np.concatenate([b[0] for b in nat_batches])
    nat_lens = np.concatenate([b[1] for b in nat_batches])
    np.testing.assert_array_equal(py_lens, nat_lens)
    np.testing.assert_array_equal(py_bases, nat_bases)
    py_hdrs = [n + b" " + c for b in py_batches for n, c in zip(b.names, b.comments)]
    nat_hdrs = [h for b in nat_batches for h in b[2]]
    assert py_hdrs == nat_hdrs


def test_native_throughput_sane(tmp_path):
    if not native_available():
        pytest.skip("native loader unavailable")
    import time
    p = str(tmp_path / "big.fq")
    write_fq(p, n=20000)
    t0 = time.time()
    total = 0
    for bases, lengths, _ in read_fastq_batches_native(p, batch_size=4096,
                                                       pad_to=160):
        total += len(bases)
    dt = time.time() - t0
    assert total == 20000
    assert dt < 5.0  # native should chew 20k reads well under a second


# ---------------------------------------------------------------------------
# native barcode sorter (native/sort_read.cpp) vs the python loop
# ---------------------------------------------------------------------------

def _file_bytes(d, name):
    import os
    with open(os.path.join(d, name), "rb") as fp:
        return fp.read()


@pytest.mark.parametrize("lib", ["ust", "bioturing", "10x"])
def test_native_sorter_matches_python(tmp_path, lib, monkeypatch):
    import os
    from turingassembler_tpu import testing as tt
    from turingassembler_tpu.barcode import sort_read as sr
    from turingassembler_tpu.config import Config, LIB_TYPE_NAMES
    from turingassembler_tpu.io.fastq import encode_barcode

    if sr._NATIVE_SORT is None:
        pytest.skip("native sorter unavailable")

    genome = tt.random_genome(15000, seed=11)
    r1, r2, l1, l2, bcs = tt.sim_barcoded_pairs(
        genome, molecule_len=3000, n_molecules=60,
        reads_per_molecule=30, read_len=80, insert=200, seed=7)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    f1, f2, fI = (str(tmp_path / n) for n in ["R1.fq", "R2.fq", "I1.fq"])
    with open(f1, "w") as o1, open(f2, "w") as o2, open(fI, "w") as oI:
        for i in range(len(r1)):
            s1 = ACGT[r1[i]].tobytes().decode()
            s2 = ACGT[r2[i]].tobytes().decode()
            bseq = encode_barcode(int(bcs[i]) + 1, 16).decode()
            if lib == "ust":
                o1.write(f"@read{i}\n{s1}\n+\n{'I'*len(s1)}\n")
            elif lib == "bioturing":
                o1.write(f"@read{i} BX:Z:{bseq} QB:Z:{'I'*16}\n{s1}\n+\n{'I'*len(s1)}\n")
            else:  # 10x: 16bp barcode + 7bp UMI prefix on R1
                o1.write(f"@read{i}\n{bseq}AAAAAAA{s1}\n+\n{'I'*(23+len(s1))}\n")
            o2.write(f"@read{i}\n{s2}\n+\n{'I'*len(s2)}\n")
            oI.write(f"@read{i}\n{bseq}\n+\n{'I'*16}\n")

    files_I = (fI,) if lib == "ust" else ()
    outs = {}
    for native in ("1", "0"):
        monkeypatch.setenv("TA_SORT_NATIVE", native)
        d = str(tmp_path / f"out{native}")
        os.makedirs(d, exist_ok=True)
        cfg = Config(files_1=(f1,), files_2=(f2,), files_I=files_I,
                     lib_type=LIB_TYPE_NAMES[lib], out_dir=d)
        sr.sort_reads(cfg)
        outs[native] = tuple(_file_bytes(d, n) for n in
                             ["R1.sorted.fq", "R2.sorted.fq", "barcode.idx"])
    assert outs["1"] == outs["0"]
    assert len(outs["1"][2]) % 40 == 0 and len(outs["1"][2]) > 0


def test_native_sorter_gzip_inputs(tmp_path, monkeypatch):
    """Native sorter reads .gz inputs and matches plain-file output."""
    import gzip as gzmod
    import os
    from turingassembler_tpu import testing as tt
    from turingassembler_tpu.barcode import sort_read as sr
    from turingassembler_tpu.config import Config, LIB_TYPE_UST
    from turingassembler_tpu.io.fastq import encode_barcode

    if sr._NATIVE_SORT is None:
        pytest.skip("native sorter unavailable")
    genome = tt.random_genome(8000, seed=13)
    r1, r2, l1, l2, bcs = tt.sim_barcoded_pairs(
        genome, molecule_len=2000, n_molecules=30,
        reads_per_molecule=20, read_len=80, insert=200, seed=3)
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
    for f in (f1, f2, fI):
        with open(f, "rb") as src, gzmod.open(f + ".gz", "wb") as dst:
            dst.write(src.read())
    monkeypatch.setenv("TA_SORT_NATIVE", "1")
    outs = {}
    for tagged, (a, b, c) in [("plain", (f1, f2, fI)),
                              ("gz", (f1 + ".gz", f2 + ".gz", fI + ".gz"))]:
        d = str(tmp_path / tagged)
        os.makedirs(d, exist_ok=True)
        cfg = Config(files_1=(a,), files_2=(b,), files_I=(c,),
                     lib_type=LIB_TYPE_UST, out_dir=d)
        rp = sr.sort_reads(cfg)
        assert rp is not None
        outs[tagged] = tuple(_file_bytes(d, n) for n in
                             ["R1.sorted.fq", "R2.sorted.fq", "barcode.idx"])
    assert outs["plain"] == outs["gz"]


def test_native_sorter_spill_byte_identical(tmp_path):
    """A tiny memory budget forces sorted-run spills + k-way merge;
    outputs must be byte-identical to the unlimited in-memory path
    (reference external sort, src/sort_read.c:281-288,567-658)."""
    import os

    from turingassembler_tpu import testing as tt
    from turingassembler_tpu.barcode import sort_read as sr
    from turingassembler_tpu.config import Config, LIB_TYPE_BIOT
    from turingassembler_tpu.io.fastq import encode_barcode

    if sr._NATIVE_SORT is None:
        pytest.skip("native sorter unavailable")

    genome = tt.random_genome(20000, seed=3)
    r1, r2, l1, l2, bcs = tt.sim_barcoded_pairs(
        genome, molecule_len=5000, n_molecules=60, reads_per_molecule=20,
        read_len=80, seed=4)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    f1 = str(tmp_path / "R1.fq")
    f2 = str(tmp_path / "R2.fq")
    with open(f1, "w") as o1, open(f2, "w") as o2:
        for i in range(len(r1)):
            s1 = ACGT[r1[i]].tobytes().decode()
            s2 = ACGT[r2[i]].tobytes().decode()
            bseq = encode_barcode(int(bcs[i]) + 1, 16).decode()
            o1.write(f"@read{i} BX:Z:{bseq} QB:Z:{'I'*16}\n{s1}\n+\n{'I'*len(s1)}\n")
            o2.write(f"@read{i}\n{s2}\n+\n{'I'*len(s2)}\n")

    def run(out, budget_env):
        cfg = Config(files_1=[f1], files_2=[f2], files_I=[],
                     lib_type=LIB_TYPE_BIOT, out_dir=str(tmp_path / out))
        old = os.environ.get("TA_SORT_MEM_BYTES")
        os.environ["TA_SORT_MEM_BYTES"] = str(budget_env)
        try:
            rp = sr._sort_reads_native(cfg, cfg.out_dir)
        finally:
            if old is None:
                os.environ.pop("TA_SORT_MEM_BYTES", None)
            else:
                os.environ["TA_SORT_MEM_BYTES"] = old
        assert rp is not None
        return rp

    os.makedirs(tmp_path / "mem", exist_ok=True)
    os.makedirs(tmp_path / "spill", exist_ok=True)
    rp_mem = run("mem", 0)                  # unlimited
    rp_spill = run("spill", 16_384)         # ~16 KB -> many runs

    for a, b in ((rp_mem.R1_path, rp_spill.R1_path),
                 (rp_mem.R2_path, rp_spill.R2_path),
                 (rp_mem.idx_path, rp_spill.idx_path)):
        with open(a, "rb") as fa, open(b, "rb") as fb:
            assert fa.read() == fb.read(), (a, b)
    # run files cleaned up
    assert not [p for p in os.listdir(tmp_path / "spill")
                if ".run" in p]
