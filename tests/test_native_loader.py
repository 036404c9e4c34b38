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
