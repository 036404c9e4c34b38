"""Read->edge mapping across a device mesh.

The aux-info and read-pair-extension stages are full-library maps — the
reference fans them out over a thread pool sharing one BWA index
(src/barcode_builder.c:408-436).  The TPU-native layout: shard the read
batch across the mesh (data parallel), replicate the minimizer index
(it is small — singleton minimizers of the contig set), and run the
per-device vote kernel (mapper/minimizers._map_batch) under shard_map.
No collectives are needed in the step itself — each read's vote is
independent — so scaling is pure data parallelism over ICI; the
per-edge barcode/tally attachment stays host-side on the gathered
(edge, start) arrays exactly as in the single-device path.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mapper.minimizers import _map_batch, EdgeMinimizerIndex


@functools.partial(jax.jit, static_argnames=("mesh", "k", "w", "bits",
                                              "iters", "axis"))
def sharded_map_step(bases, lengths, keys, edge, pos, count, lut, *,
                     mesh: Mesh, k: int, w: int, bits: int, iters: int,
                     axis: str = "shard"):
    """One distributed mapping step.

    bases/lengths are sharded over `axis`; the index arrays are
    replicated.  Returns (best_edge, n_hits, est_start), each sharded
    like the input reads — bit-equal to the single-device kernel on the
    same rows."""
    def body(b, l, ks, e, p, c, lt):
        return _map_batch(b, l, ks, e, p, c, lt, k, w, bits, iters)

    # check_vma off: the lookup loop carry starts replicated (zeros)
    # and becomes device-varying inside the body, which the
    # varying-manual-axes checker rejects; the body itself is pure
    # per-device compute with no collectives.
    f = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, None), P(None), P(None),
                  P(None), P(None)),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return f(bases, lengths, keys, edge, pos, count, lut)


def map_reads_sharded(index: EdgeMinimizerIndex, bases: np.ndarray,
                      lengths: np.ndarray, mesh: Mesh,
                      batch_size: int = 8192, axis: str = "shard"):
    """Mesh-parallel map_reads (no DP verify — callers compose
    rescore_hits on the gathered results just like the local path).

    Returns (edge (N,) int32 [-1 unmapped], n_hits (N,), est_start (N,)).
    """
    D = int(mesh.devices.size)
    batch_size = ((batch_size + D - 1) // D) * D
    N = len(bases)
    edges = np.full(N, -1, np.int32)
    hits = np.zeros(N, np.int32)
    starts = np.full(N, -1, np.int32)
    if len(index.keys) == 0 or N == 0:
        return edges, hits, starts
    rep = NamedSharding(mesh, P())
    rep2 = NamedSharding(mesh, P(None, None))
    keys_np, edge_np, pos_np, count_np, lut_np, bits, iters = \
        index.padded_tables()
    keys = jax.device_put(keys_np, rep2)
    edge = jax.device_put(edge_np, rep)
    pos = jax.device_put(pos_np, rep)
    count = jax.device_put(count_np, rep)
    lut = jax.device_put(lut_np, rep)
    shb = NamedSharding(mesh, P(axis, None))
    shl = NamedSharding(mesh, P(axis))
    pending = []
    for i in range(0, N, batch_size):
        rb = bases[i : i + batch_size]
        lb_ = lengths[i : i + batch_size]
        if len(rb) < batch_size:
            pad = batch_size - len(rb)
            rb = np.concatenate(
                [rb, np.full((pad, rb.shape[1]), 255, np.uint8)])
            lb_ = np.concatenate([lb_, np.zeros(pad, np.int32)])
        db = jax.device_put(rb, shb)
        dl = jax.device_put(lb_, shl)
        pending.append((i, sharded_map_step(
            db, dl, keys, edge, pos, count, lut, mesh=mesh, k=index.k,
            w=index.w, bits=bits, iters=iters, axis=axis)))
    for i, (be, bh, bs) in pending:
        m = min(batch_size, N - i)
        edges[i : i + m] = np.asarray(be)[:m]
        hits[i : i + m] = np.asarray(bh)[:m]
        starts[i : i + m] = np.asarray(bs)[:m]
    return edges, hits, starts
