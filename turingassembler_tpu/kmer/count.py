"""Streaming canonical (k+1)-mer counting.

Replaces the external KMC counter (reference include/kmc_skipping.h:8-11,
invoked from src/kmer_build.c:726-737) and the striped-lock kmhash
(src/kmhash.c).

Three engines (see count_kedges_from_batches): the TPU path packs
reads to ~2.25 bits/base on host, ships them async, and runs
unpack + window-extract + hash-table insert as one fused dispatch per
batch (ops/devhash.py); the sort-tile + LSM-merge engine remains for
the mesh-sharded variant; small jobs use per-batch device RLE with a
host merge.  Shape count stays constant in stream length.
"""

from __future__ import annotations

import functools
from typing import Iterable, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kmers as km
from ..ops import sortops as so
from ..ops.merge import SENTINEL, DeviceCountAccumulator


# ---------------------------------------------------------------------------
# packed host->device transfer: the relay H2D on this rig runs ~5 MB/s,
# so reads ship as 2 bits/base + a 1-bit validity mask (~2.25 bits/base)
# and are unpacked by cheap vector ops on device.
# ---------------------------------------------------------------------------

def _load_native_pack():
    """ctypes handle to the C++ packer (native/pack_kernels.cpp), or None."""
    import ctypes
    import os
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native", "libtapack.so")
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.ta_pack_reads.argtypes = [u8p, ctypes.c_int64, ctypes.c_int64,
                                      u8p, u8p]
        lib.ta_pack_reads.restype = None
        return lib
    except (OSError, AttributeError):
        return None


_NATIVE_PACK = _load_native_pack()


def host_pack_reads(bases: np.ndarray):
    """(B, L) uint8 codes (>=4 invalid/pad) -> (packed2 (B, ceil(L/4)),
    nmask (B, ceil(L/8)))."""
    B, L = bases.shape
    if _NATIVE_PACK is not None and bases.flags.c_contiguous and B * L:
        import ctypes
        packed = np.empty((B, (L + 3) // 4), np.uint8)
        nmask = np.empty((B, (L + 7) // 8), np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        _NATIVE_PACK.ta_pack_reads(
            bases.ctypes.data_as(u8p), ctypes.c_int64(B), ctypes.c_int64(L),
            packed.ctypes.data_as(u8p), nmask.ctypes.data_as(u8p))
        return packed, nmask
    L4 = (L + 3) // 4 * 4
    L8 = (L + 7) // 8 * 8
    b = np.zeros((B, L4), np.uint8)
    np.minimum(bases, 3, out=b[:, :L], casting="unsafe")
    q = b.reshape(B, L4 // 4, 4).astype(np.uint16)
    packed = (q[:, :, 0] | (q[:, :, 1] << 2) | (q[:, :, 2] << 4)
              | (q[:, :, 3] << 6)).astype(np.uint8)
    v = np.zeros((B, L8), np.uint8)
    v[:, :L] = (bases < 4).astype(np.uint8)
    m = v.reshape(B, L8 // 8, 8).astype(np.uint16)
    nmask = (m[:, :, 0] | (m[:, :, 1] << 1) | (m[:, :, 2] << 2)
             | (m[:, :, 3] << 3) | (m[:, :, 4] << 4) | (m[:, :, 5] << 5)
             | (m[:, :, 6] << 6) | (m[:, :, 7] << 7)).astype(np.uint8)
    return packed, nmask


@functools.partial(jax.jit, static_argnames=("L",))
def device_unpack_reads(packed, nmask, L: int):
    """Inverse of host_pack_reads -> (B, L) uint8 codes with 255 invalid."""
    B = packed.shape[0]
    shifts2 = jnp.arange(4, dtype=jnp.uint8) * 2
    b = ((packed[:, :, None] >> shifts2[None, None, :]) & 3).reshape(B, -1)
    shifts1 = jnp.arange(8, dtype=jnp.uint8)
    v = ((nmask[:, :, None] >> shifts1[None, None, :]) & 1).reshape(B, -1)
    bases = jnp.where(v[:, :L] == 1, b[:, :L], jnp.uint8(255))
    return bases.astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("L", "k1", "cap_frac"),
                   donate_argnums=(0, 1))
def _count_batch_fused(keys, counts, packed, nmask, lengths, L: int, k1: int,
                       cap_frac: int = 1):
    """unpack + extract + hash-insert as ONE dispatch (relay dispatch
    latency is tens of ms per call on this rig)."""
    from ..ops.devhash import _insert_body
    bases = device_unpack_reads(packed, nmask, L)
    canon, _, valid = km.extract_canonical_kmers(bases, lengths, k1)
    flat = canon.reshape(-1, canon.shape[-1])
    vflat = valid.reshape(-1)
    return _insert_body(keys, counts, flat, vflat, cap_frac)


@functools.partial(jax.jit, static_argnames=("k1",), donate_argnums=())
def batch_count_tile(bases, lengths, k1: int):
    """One batch -> sorted unique run, sentinel-padded to tile capacity.

    Returns (keys (T, nl) uint32 with tail = 0xFFFFFFFF, counts (T,)
    int32, n_unique ()).
    """
    canon, _, valid = km.extract_canonical_kmers(bases, lengths, k1)
    flat = canon.reshape(-1, canon.shape[-1])
    vflat = valid.reshape(-1)
    uniq, counts, n_unique = so.sort_unique_count(flat, vflat)
    T = uniq.shape[0]
    idx = jnp.arange(T)
    tail = (idx >= n_unique)[:, None]
    keys = jnp.where(tail, jnp.uint32(SENTINEL), uniq)
    counts = jnp.where(idx >= n_unique, 0, counts)
    return keys, counts, n_unique


def count_kedges_from_batches(
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    k: int,
    min_count: int = 1,
    engine: str = "auto",
) -> Tuple[np.ndarray, np.ndarray]:
    """Count canonical (k+1)-mers over an iterable of (bases, lengths)
    batches.  Returns (kedges (n, nl) uint32 sorted unique, counts (n,)
    int64), filtered to count >= min_count.

    engine:
      "megasort" — mega-batch device sort + run-length count
                 (kmer/megasort.py): the TPU hot path (sort streams
                 ~160M rows/s on this hardware vs ~100M random
                 accesses/s for scatter probing);
      "hash"   — vectorized open-addressing device hash table
                 (ops/devhash.py), kept as the bounded-memory
                 streaming alternative;
      "device" — per-batch tile sort + LSM merges on the accelerator
                 (kept for the mesh-sharded variant and comparison);
      "np"     — per-batch device RLE, host numpy lexsort merge (fast
                 for the small jobs: local assemblies, tests);
      "auto"   — "np" on the CPU backend, "megasort" otherwise.
    """
    if engine == "auto":
        engine = "np" if jax.default_backend() == "cpu" else "megasort"
    k1 = k + 1
    if engine == "megasort":
        from .megasort import count_kedges_megasort
        return count_kedges_megasort(batches, k, min_count=min_count)
    if engine == "hash":
        from ..ops import limbs as lbops
        from ..ops.devhash import DeviceHashCounter
        counter = None
        n_batches_done = 0
        cap_log2 = int(__import__("os").environ.get("TA_HASH_CAP_LOG2", 25))
        for bases, lengths in batches:
            L = bases.shape[1]
            packed, nmask = host_pack_reads(np.ascontiguousarray(bases))
            dp = jax.device_put(packed)      # async: overlaps with inserts
            dm = jax.device_put(nmask)
            dl = jax.device_put(np.ascontiguousarray(lengths))
            if counter is None:
                counter = DeviceHashCounter(cap_log2, lbops.n_limbs(k1))
            # while the table fills most lanes miss (cap_frac=1); at
            # steady state misses are rare and the small-buffer
            # executable does ~2.5x fewer full-batch scatter passes
            warm = int(__import__("os").environ.get("TA_HASH_WARM_BATCHES", 6))
            frac = 1 if n_batches_done < warm else 4
            counter.keys, counter.counts, ovf = _count_batch_fused(
                counter.keys, counter.counts, dp, dm, dl, L, k1,
                cap_frac=frac)
            counter._ovf = counter._ovf + ovf
            n_batches_done += 1
        if counter is None:
            return np.zeros((0, lbops.n_limbs(k1)), np.uint32), np.zeros(0, np.int64)
        out_log2 = int(__import__("os").environ.get("TA_HASH_OUT_LOG2",
                                                    max(cap_log2 - 2, 10)))
        kedges, counts = counter.finalize(out_cap_log2=out_log2)
    elif engine == "device":
        acc = DeviceCountAccumulator()
        for bases, lengths in batches:
            keys, counts, _ = batch_count_tile(
                jnp.asarray(np.ascontiguousarray(bases)),
                jnp.asarray(np.ascontiguousarray(lengths)), k1)
            acc.add_run(keys, counts)
        kedges, counts = acc.finalize()
    else:
        runs = []
        for bases, lengths in batches:
            keys, cnts, n_unique = batch_count_tile(
                jnp.asarray(np.ascontiguousarray(bases)),
                jnp.asarray(np.ascontiguousarray(lengths)), k1)
            n = int(n_unique)
            runs.append((np.asarray(keys[:n]), np.asarray(cnts[:n], np.int64)))
        kedges, counts = so.np_merge_count_runs(runs)
    if min_count > 1 and len(counts):
        keep = counts >= min_count
        kedges, counts = kedges[keep], counts[keep]
    return kedges, counts


def count_kedges_from_reads(
    reads: np.ndarray, lengths: np.ndarray, k: int,
    batch_size: int = 8192, min_count: int = 1, engine: str = "auto",
) -> Tuple[np.ndarray, np.ndarray]:
    """Convenience wrapper: chunk a read matrix into batches and count.

    The tail batch is zero-padded up to batch_size (padded reads have
    length 0 so contribute nothing) to keep shapes constant."""
    def gen():
        for i in range(0, len(reads), batch_size):
            rb = reads[i : i + batch_size]
            lb = lengths[i : i + batch_size]
            if len(rb) < batch_size:
                pad = batch_size - len(rb)
                rb = np.concatenate([rb, np.full((pad, rb.shape[1]), 255, np.uint8)])
                lb = np.concatenate([lb, np.zeros(pad, np.int32)])
            yield rb, lb
    return count_kedges_from_batches(gen(), k, min_count=min_count, engine=engine)
