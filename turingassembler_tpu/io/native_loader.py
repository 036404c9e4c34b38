"""ctypes binding for the native FASTQ loader (native/fastq_reader.cpp).

Builds the shared library on first use if the toolchain is present;
falls back to the pure-python reader (io/fastq.py) otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Iterator, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtafq.so")
_LIB = None
_TRIED = False


def _load_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.tafq_open.restype = ctypes.c_void_p
    lib.tafq_open.argtypes = [ctypes.c_char_p]
    lib.tafq_close.argtypes = [ctypes.c_void_p]
    lib.tafq_next_batch.restype = ctypes.c_long
    lib.tafq_next_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_char_p, ctypes.c_long, ctypes.POINTER(ctypes.c_int64),
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def read_fastq_batches_native(path: str, batch_size: int = 8192,
                              pad_to: int = 256, with_headers: bool = False
                              ) -> Iterator[Tuple[np.ndarray, np.ndarray, Optional[list]]]:
    """Yield (bases, lengths, headers|None) batches via the C++ loader."""
    lib = _load_lib()
    if lib is None:
        # pure-python fallback
        from .fastq import read_fastq_batches
        for b in read_fastq_batches(path, batch_size, pad_to, keep_text=with_headers):
            hdrs = None
            if with_headers:
                hdrs = [n + (b" " + c if c else b"")
                        for n, c in zip(b.names, b.comments)]
            yield b.bases, b.lengths, hdrs
        return
    h = lib.tafq_open(path.encode())
    if not h:
        raise FileNotFoundError(path)
    try:
        hdr_cap = batch_size * 256
        while True:
            bases = np.empty((batch_size, pad_to), np.uint8)
            lengths = np.empty(batch_size, np.int32)
            if with_headers:
                hdr_buf = ctypes.create_string_buffer(hdr_cap)
                hdr_off = np.zeros(batch_size + 1, np.int64)
                hp = hdr_buf
                ho = hdr_off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
            else:
                hp, ho = None, None
            n = lib.tafq_next_batch(
                h, batch_size, pad_to,
                bases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                hp, hdr_cap if with_headers else 0, ho)
            if n < 0:
                raise ValueError(f"{path}: malformed FASTQ")
            if n == 0:
                break
            hdrs = None
            if with_headers:
                raw = hdr_buf.raw
                hdrs = [raw[hdr_off[i] : hdr_off[i + 1]] for i in range(n)]
            yield bases[:n], lengths[:n], hdrs
            if n < batch_size:
                break
    finally:
        lib.tafq_close(h)
