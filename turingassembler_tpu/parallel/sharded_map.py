"""Read->edge mapping across a device mesh.

The aux-info and read-pair-extension stages are full-library maps — the
reference fans them out over a thread pool sharing one BWA index
(src/barcode_builder.c:408-436).  The TPU-native layout: shard the read
batch across the mesh (data parallel), replicate the minimizer index
AND the packed edge-sequence pool (both are contig-sized, not
library-sized), and run the per-device fused vote+gapless-verify kernel
(mapper/minimizers._map_batch_verified) under shard_map.  No
collectives are needed in the step itself — each read's vote is
independent — so scaling is pure data parallelism over ICI.  Only the
rare lanes whose gapless bound misses their threshold fall back to the
host banded DP, exactly like the single-device path (the reference's
per-thread rescore, src/barcode_builder.c:448-563); everything else is
decided on device, so multi-chip mapping does not serialize on host DP.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..mapper.minimizers import (_map_batch, _map_batch_verified,
                                 _dp_verify_rest, EdgeMinimizerIndex)


@functools.partial(jax.jit, static_argnames=("mesh", "k", "w", "axis"))
def sharded_map_step(bases, lengths, hkeys, vals, salt, *,
                     mesh: Mesh, k: int, w: int, axis: str = "shard"):
    """One distributed vote-only mapping step.

    bases/lengths are sharded over `axis`; the cuckoo index tables are
    replicated.  Returns (best_edge, n_hits, est_start), each sharded
    like the input reads — bit-equal to the single-device kernel on the
    same rows."""
    def body(b, l, hk, vl, st):
        return _map_batch(b, l, hk, vl, st, k, w)

    # check_vma off: replicated operands become device-varying inside
    # the body, which the varying-manual-axes checker rejects; the body
    # itself is pure per-device compute with no collectives.
    f = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(None, None), P(None, None),
                  P()),
        out_specs=(P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return f(bases, lengths, hkeys, vals, salt)


@functools.partial(jax.jit, static_argnames=("mesh", "k", "w", "mt", "mm",
                                             "axis"))
def sharded_map_step_verified(bases, lengths, thr, hkeys, vals, salt,
                              seq_pk, seq_off, *, mesh: Mesh, k: int,
                              w: int, mt: int, mm: int,
                              axis: str = "shard"):
    """Distributed fused vote + gapless-verification step (VERDICT r2 #3:
    the mesh path must not fall back to host DP for the bulk of lanes).

    Returns (best_edge, n_hits, est_start, bound, fast), sharded like
    the reads — bit-equal to _map_batch_verified on the same rows."""
    def body(b, l, t, hk, vl, st, sd, so):
        return _map_batch_verified(b, l, hk, vl, st, sd, so, t,
                                   k, w, mt, mm)

    f = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(None, None),
                  P(None, None), P(), P(None), P(None)),
        out_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return f(bases, lengths, thr, hkeys, vals, salt, seq_pk, seq_off)


def map_reads_sharded(index: EdgeMinimizerIndex, bases: np.ndarray,
                      lengths: np.ndarray, mesh: Mesh,
                      batch_size: int = 8192, axis: str = "shard",
                      graph=None, min_score=None, with_hits: bool = True):
    """Mesh-parallel map_reads.  When `graph` is given, every voted hit
    is verified: the gapless fast path runs ON DEVICE inside the
    sharded dispatch and only the remainder lanes go through the host
    banded DP — same acceptance as the single-device verified path.

    Returns (edge (N,) int32 [-1 unmapped], n_hits (N,), est_start (N,)
    clamped >= 0 on mapped lanes).
    """
    D = int(mesh.devices.size)
    batch_size = ((batch_size + D - 1) // D) * D
    N = len(bases)
    edges = np.full(N, -1, np.int32)
    hits = np.zeros(N, np.int32)
    starts = np.full(N, -1, np.int32)
    if len(index.keys) == 0 or N == 0:
        return edges, hits, starts
    verified = graph is not None
    rep = NamedSharding(mesh, P())
    rep2 = NamedSharding(mesh, P(None, None))
    hkeys_np, vals_np, salt_np = index.hash_tables()
    hkeys = jax.device_put(hkeys_np, rep2)
    vals = jax.device_put(vals_np, rep2)
    salt = jax.device_put(salt_np, rep)
    if verified:
        from ..ops import dp
        if min_score is None:
            min_score = dp.MIN_MAP_SCORE
        thr_all = (np.asarray(np.broadcast_to(min_score, (N,)), np.int32)
                   if np.ndim(min_score) else np.full(N, min_score, np.int32))
        mt, mm = int(dp.SCORING_BWA[0]), int(dp.SCORING_BWA[1])
        from ..mapper.minimizers import _pack_pool_nibbles
        sd = jax.device_put(_pack_pool_nibbles(graph.seq_data), rep)
        sod = jax.device_put(
            np.ascontiguousarray(graph.seq_off, np.int32), rep)
        fast = np.zeros(N, bool)
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
        if verified:
            tb_ = thr_all[i : i + batch_size]
            if len(tb_) < batch_size:
                tb_ = np.concatenate(
                    [tb_, np.full(batch_size - len(tb_), np.int32(1 << 30),
                                  np.int32)])
            dt = jax.device_put(tb_, shl)
            pending.append((i, sharded_map_step_verified(
                db, dl, dt, hkeys, vals, salt, sd, sod, mesh=mesh,
                k=index.k, w=index.w, mt=mt, mm=mm, axis=axis)))
        else:
            pending.append((i, sharded_map_step(
                db, dl, hkeys, vals, salt, mesh=mesh, k=index.k,
                w=index.w, axis=axis)))
    for i, out in pending:
        m = min(batch_size, N - i)
        edges[i : i + m] = np.asarray(out[0])[:m]
        if with_hits:
            hits[i : i + m] = np.asarray(out[1])[:m]
        starts[i : i + m] = np.asarray(out[2])[:m]
        if verified:
            fast[i : i + m] = np.asarray(out[4])[:m]
    if verified:
        accept = fast & (edges >= 0)
        rest = np.flatnonzero((edges >= 0) & ~fast)
        if len(rest):
            from ..ops import dp
            sc = _dp_verify_rest(graph.seq_data, graph.seq_off, edges,
                                 starts, bases, lengths, rest,
                                 dp.SCORING_BWA)
            accept[rest] = sc >= thr_all[rest]
        edges = np.where(accept, edges, -1)
    starts = np.where(edges >= 0, np.maximum(starts, 0), -1)
    return edges, hits, starts
