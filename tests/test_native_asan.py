"""AddressSanitizer smoke run of every native library.

The reference ships a `make debug` ASan build (Makefile:96-101) as its
race/memory-safety net; our native layer gets the same: `make asan`
builds *_asan.so variants, and this test drives every extern "C" entry
point in a SUBPROCESS with libasan preloaded (ctypes can't load an
ASan .so into an un-instrumented interpreter without LD_PRELOAD).
A memory error aborts the subprocess -> nonzero exit fails the test.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "turingassembler_tpu", "native")


def _libasan_path():
    try:
        out = subprocess.run(["ldconfig", "-p"], capture_output=True,
                             text=True, timeout=30).stdout
    except Exception:
        return None
    for line in out.splitlines():
        if "libasan.so" in line and "=>" in line:
            return line.split("=>")[1].strip()
    return None


def _write_library(d: str) -> None:
    sys.path.insert(0, ROOT)
    from turingassembler_tpu import testing as tt
    from turingassembler_tpu.io.fastq import encode_barcode
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    g = tt.random_genome(2000, seed=11)
    reads, lens = tt.sim_reads(g, coverage=10, read_len=80, seed=12)
    n = (len(reads) // 2) * 2
    with open(os.path.join(d, "R1.fq"), "wb") as f1, \
            open(os.path.join(d, "R2.fq"), "wb") as f2, \
            open(os.path.join(d, "I1.fq"), "wb") as fI:
        for i in range(0, n, 2):
            f1.write(b"@r%d\n%s\n+\n%s\n"
                     % (i, ACGT[reads[i]].tobytes(), b"I" * 80))
            f2.write(b"@r%d\n%s\n+\n%s\n"
                     % (i, ACGT[reads[i + 1]].tobytes(), b"I" * 80))
            fI.write(b"@r%d\n%s\n+\n%s\n"
                     % (i, encode_barcode(i % 7 + 1, 16), b"I" * 16))
    import gzip
    with open(os.path.join(d, "R1.fq"), "rb") as src, \
            gzip.open(os.path.join(d, "R1.fq.gz"), "wb") as dst:
        dst.write(src.read())


_WORKER = r"""
import ctypes, os, sys
import numpy as np
d = sys.argv[1]
nat = sys.argv[2]

fq = ctypes.CDLL(os.path.join(nat, "libtafq_asan.so"))
fq.tafq_open.restype = ctypes.c_void_p
fq.tafq_open.argtypes = [ctypes.c_char_p]
fq.tafq_close.argtypes = [ctypes.c_void_p]
fq.tafq_next_batch.restype = ctypes.c_long
fq.tafq_next_batch.argtypes = [
    ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
    ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
    ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_int64)]
for name in ("R1.fq", "R1.fq.gz"):
    h = fq.tafq_open(os.path.join(d, name).encode())
    assert h
    bases = np.empty((64, 128), np.uint8)
    lens = np.empty(64, np.int32)
    total = 0
    while True:
        n = fq.tafq_next_batch(
            h, 64, 128,
            bases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            None, 0, None)
        assert n >= 0
        total += n
        if n < 64:
            break
    fq.tafq_close(h)
    assert total > 0, name

srt = ctypes.CDLL(os.path.join(nat, "libtasort_asan.so"))
srt.ta_sort_reads_budget.restype = ctypes.c_int64
srt.ta_sort_reads_budget.argtypes = [
    ctypes.POINTER(ctypes.c_char_p)] * 3 + [
    ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
    ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
def carr(paths):
    a = (ctypes.c_char_p * max(len(paths), 1))()
    for i, p in enumerate(paths):
        a[i] = p.encode()
    return a
# tiny budget forces the spill + k-way merge path under ASan too
rc = srt.ta_sort_reads_budget(
    carr([os.path.join(d, "R1.fq")]), carr([os.path.join(d, "R2.fq")]),
    carr([os.path.join(d, "I1.fq")]), 1, 1, 2,
    os.path.join(d, "R1.s.fq").encode(),
    os.path.join(d, "R2.s.fq").encode(),
    os.path.join(d, "bc.idx").encode(), 1 << 14)
assert rc > 0, rc

pk = ctypes.CDLL(os.path.join(nat, "libtapack_asan.so"))
pk.ta_pack_reads.argtypes = [
    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
    ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
B, L = 33, 101
bases = np.random.default_rng(0).integers(0, 5, (B, L)).astype(np.uint8)
packed = np.zeros((B, (L + 3) // 4), np.uint8)
nmask = np.zeros((B, (L + 7) // 8), np.uint8)
pk.ta_pack_reads(bases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                 B, L, packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                 nmask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))

gk = ctypes.CDLL(os.path.join(nat, "libtagraph_asan.so"))
gk.ta_list_rank.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
gk.ta_unique_ids.restype = ctypes.c_int64
gk.ta_unique_ids.argtypes = [
    ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64, ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int32)]
# chain 0->1->2, cycle 3<->4
prev = np.array([-1, 0, 1, 4, 3], np.int32)
head = np.empty(5, np.int32); dist = np.empty(5, np.int32)
gk.ta_list_rank(prev.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), 5,
                head.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                dist.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
assert head[2] == 0 and dist[2] == 2
keys = np.array([7, 9, 7, 11, 9, 7], np.uint64)
ids = np.empty(6, np.int32)
nu = gk.ta_unique_ids(keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
                      6, 16, ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
assert nu == 3 and ids[0] == ids[2] == ids[5]
print("asan smoke ok")
"""


@pytest.mark.slow
def test_native_asan_smoke(tmp_path):
    libasan = _libasan_path()
    if libasan is None:
        pytest.skip("libasan not installed")
    r = subprocess.run(["make", "-C", NATIVE, "asan"], capture_output=True,
                       text=True, timeout=300)
    if r.returncode != 0:
        pytest.skip(f"asan build unavailable: {r.stderr[-500:]}")
    _write_library(str(tmp_path))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = {**os.environ,
           "LD_PRELOAD": libasan,
           "ASAN_OPTIONS": "detect_leaks=0:abort_on_error=1"}
    p = subprocess.run([sys.executable, str(worker), str(tmp_path), NATIVE],
                       env=env, capture_output=True, text=True, timeout=300)
    assert p.returncode == 0, f"ASan run failed:\n{p.stdout}\n{p.stderr}"
    assert "asan smoke ok" in p.stdout
