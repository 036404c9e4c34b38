"""Level-0 DBG construction on device — sorts and scatters, no host loop.

The numpy builder (graph/build.py) is the semantics oracle; this module
is its XLA translation so the count -> build pipeline never round-trips
the 2M-row k-edge table through the ~25 MB/s host link.  Mapping:

  numpy oracle (build.py)                | here
  ---------------------------------------+---------------------------
  np.unique on 64-bit node fingerprints  | lax.sort (fpA, fpB) + segment
  (or native first-appearance ids)       | ids (ascending-fp numbering)
  boolean adjacency scatter              | scatter-or into (8m,) buffer
  native serial chain walk               | packed-row pointer doubling:
  (graph_kernels.cpp ta_list_rank)       | (anc, dist) as an (N,2) row so
                                         | each round is ONE row-gather
  cycle break at min element             | min-doubling pass, dispatched
                                         | only when a pulled scalar says
                                         | cycles exist
  per-element seq writes                 | head bases via compacted
                                         | (head_cap, k) scatter + one
                                         | full-width lastbase scatter

Reference semantics: the unitig walk and RC pairing of
src/kmer_build.c:421-649; every array here is the flat-array form of
that walk (interior (1,1) k-mers chain; heads start where the source
k-mer branches).

Static shapes: capacity `capK` (next pow2 of the k-edge count) keys the
executable; `n` stays a device scalar so one compile serves any dataset
of the same capacity class.  head_cap/seq_cap overflows are detected by
pulled scalars and retried with doubled capacity.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import kmers as km
from ..ops import limbs as lb
from .structs import AsmGraph

SENTINEL = np.uint32(0xFFFFFFFF)
I32 = jnp.int32


def _fingerprints(limbs):
    """Two independent 32-bit mixes — same mixes as the numpy builder's
    _np_fingerprint64 so node numbering matches the np.unique order."""
    fpA = lb.hash_limbs(limbs)                      # seed 0x9E3779B9
    fpB = lb.hash_limbs(limbs, seed=0x27D4EB2F)
    # keep SENTINEL exclusively for invalid lanes (2^-32 per-key remap)
    fpA = jnp.where(fpA == SENTINEL, jnp.uint32(0xFFFFFFFE), fpA)
    return fpA, fpB


@functools.partial(jax.jit, static_argnames=("k",))
def _front(uniq, counts, n, k: int):
    """kedges -> directed-kedge successor structure + chain ranking.

    Returns (src_key, tgt_key, lastbase, prev_ptr, head_of, dist,
    n_cycle_lanes)."""
    capK = uniq.shape[0]
    idx = jnp.arange(capK, dtype=I32)
    valid = idx < n

    first = km.kedge_first_base(uniq).astype(I32)
    last = km.kedge_last_base(uniq, k).astype(I32)
    pre, suf = km.split_kedge(uniq, k)
    pre_rc = lb.revcomp_limbs(pre, k)
    suf_rc = lb.revcomp_limbs(suf, k)
    o_pre = lb.lex_lt(pre_rc, pre).astype(I32)
    o_suf = lb.lex_lt(suf_rc, suf).astype(I32)
    cpre = jnp.where(o_pre[:, None] == 1, pre_rc, pre)
    csuf = jnp.where(o_suf[:, None] == 1, suf_rc, suf)

    # dense node ids in ascending-fingerprint order (oracle: np.unique)
    allk = jnp.concatenate([cpre, csuf], axis=0)
    fpA, fpB = _fingerprints(allk)
    vv = jnp.concatenate([valid, valid])
    fpA = jnp.where(vv, fpA, SENTINEL)
    fpB = jnp.where(vv, fpB, SENTINEL)
    D = 2 * capK
    origidx = jnp.arange(D, dtype=I32)
    sA, sB, sidx = jax.lax.sort((fpA, fpB, origidx), num_keys=2)
    i2 = jnp.arange(D, dtype=I32)
    new = jnp.concatenate([jnp.ones((1,), bool),
                           (sA[1:] != sA[:-1]) | (sB[1:] != sB[:-1])])
    new = new & (i2 < 2 * n)
    seg = jnp.cumsum(new.astype(I32)) - 1
    # invert the sort permutation with a 1-key sort instead of a D-row
    # scatter (sort streams; scatter is the platform's slowest
    # primitive at ~50M rows/s).  Invalid lanes carry bounded garbage
    # ids — every consumer is gated on valid/dvalid and gathers with
    # mode=clip, same contract as the old dropped-scatter form.
    _, inv = jax.lax.sort((sidx.astype(jnp.uint32), seg), num_keys=1)
    node_pre, node_suf = inv[:capK], inv[capK:]

    # adjacency nibbles (fw bits 0-3, rv bits 4-7; kmer_build.c:78-129)
    m_cap = D
    w1 = jnp.where(valid, node_pre * 8 + o_pre * 4 + last, 8 * m_cap)
    w2 = jnp.where(valid, node_suf * 8 + (1 - o_suf) * 4 + (3 - first),
                   8 * m_cap)
    adj = jnp.zeros((8 * m_cap + 1,), bool)
    adj = adj.at[w1].set(True, mode="drop")
    adj = adj.at[w2].set(True, mode="drop")
    # per-(node, orient) degree = sum of 4 adjacent bits; strided 1-D
    # slices keep everything (2*m_cap,) — a reshape(m_cap, 2, 4).sum(2)
    # pads the minor dims to (8, 128) on TPU (32x HBM blowup at capK=8M)
    adj8 = adj[:8 * m_cap]
    degs_flat = (adj8[0::4].astype(I32) + adj8[1::4].astype(I32)
                 + adj8[2::4].astype(I32) + adj8[3::4].astype(I32))

    # directed k-edges: [0, capK) canonical orientation, [capK, 2capK) rc
    src_node = jnp.concatenate([node_pre, node_suf])
    src_or = jnp.concatenate([o_pre, 1 - o_suf])
    tgt_node = jnp.concatenate([node_suf, node_pre])
    tgt_or = jnp.concatenate([o_suf, 1 - o_pre])
    lastbase = jnp.concatenate([last, 3 - first]).astype(jnp.uint8)
    src_key = src_node * 2 + src_or
    tgt_key = tgt_node * 2 + tgt_or
    d_idx = jnp.arange(D, dtype=I32)
    dvalid = vv

    succ = jnp.zeros((2 * m_cap + 1,), I32) - 1
    succ = succ.at[jnp.where(dvalid, src_key, 2 * m_cap)].set(
        d_idx, mode="drop")[:2 * m_cap]
    t_out = jnp.take(degs_flat, tgt_key, mode="clip")
    t_in = jnp.take(degs_flat, tgt_node * 2 + (1 - tgt_or), mode="clip")
    can = (t_out == 1) & (t_in == 1) & dvalid
    nxt = jnp.where(can, jnp.take(succ, tgt_key, mode="clip"), -1)
    nxt = jnp.where(nxt == d_idx, -1, nxt)          # palindromic self-successor

    s_out = jnp.take(degs_flat, src_key, mode="clip")
    s_in = jnp.take(degs_flat, src_node * 2 + (1 - src_or), mode="clip")
    prev_exists = (s_out == 1) & (s_in == 1) & dvalid
    prv = jnp.zeros((D + 1,), I32) - 1
    prv = prv.at[jnp.where(nxt >= 0, nxt, D)].set(d_idx, mode="drop")[:D]
    prev_ptr = jnp.where(prev_exists & (prv >= 0), prv, -1)

    head_of, dist = _rank_chains(prev_ptr)
    n_cyc = jnp.sum((jnp.take(prev_ptr, head_of, mode="clip") >= 0) & dvalid)
    return src_key, tgt_key, lastbase, prev_ptr, head_of, dist, n_cyc


def _rank_chains(prev_ptr):
    """(head index, distance) per element via packed-row pointer doubling.

    Wyllie's algorithm: up to ceil(log2 D)+1 rounds of ONE (D,2)-row
    gather each (~230M rows/s measured on the v5e).  A two-level spine
    variant (stop-set doubling to a static 1/16 sample, then ranking the
    compact spine list) was built and measured SLOWER (0.67s vs 0.50s at
    D=4.2M, round-2 notes) — the extra where/bit-decode per round costs
    more than the rounds it saves, so the simple form stays.

    Early exit: the loop runs only ceil(log2(longest chain))+1 rounds —
    a lane is settled once its ancestor is a head (gathered dist
    increment 0), and the while_loop stops when every lane is.  Real
    error-laden libraries run ~1 unitig per 10 k-edges (short chains,
    ~half the rounds); the worst case (one genome-length unitig, the
    bench workload) still needs every round, paying only a cheap (D,)
    any() reduction per round for the convergence test.
    """
    D = prev_ptr.shape[0]
    d_idx = jnp.arange(D, dtype=I32)
    anc = jnp.where(prev_ptr < 0, d_idx, prev_ptr)
    st0 = jnp.stack([anc, (prev_ptr >= 0).astype(I32)], axis=1)
    rounds = max(1, int(np.ceil(np.log2(max(D, 2)))) + 1)

    def cond(c):
        st, changed, r = c
        return changed & (r < rounds)

    def body(c):
        st, _, r = c
        g = jnp.take(st, st[:, 0], axis=0, mode="clip")
        nst = jnp.stack([g[:, 0], st[:, 1] + g[:, 1]], axis=1)
        return nst, jnp.any(g[:, 1] > 0), r + 1

    st, _, _ = jax.lax.while_loop(
        cond, body, (st0, jnp.asarray(True), jnp.zeros((), I32)))
    return st[:, 0], st[:, 1]


@jax.jit
def _break_cycles(prev_ptr, head_of):
    """Rare path: pure cycles (circular unitigs).  The fw and rc copies
    of a circular unitig are two distinct cycles; they must break at
    MIRRORED adjacencies or the rc unitig comes out as a rotation
    (violating source(rc(e)) == rc(target(e))).  Every incoming adjacency
    (prev(d) -> d) is keyed by min(enc(prev,d), enc(rc(d), rc(prev))) —
    invariant under the rc mirror — and each cycle breaks at its minimum
    adjacency (oracle: build.py rc_consistent_cycle_heads)."""
    D = prev_ptr.shape[0]
    capK = D // 2
    d_idx = jnp.arange(D, dtype=I32)
    on_cyc = jnp.take(prev_ptr, head_of, mode="clip") >= 0
    rcd = jnp.where(d_idx < capK, d_idx + capK, d_idx - capK)
    p = jnp.where(on_cyc, prev_ptr, d_idx)
    # enc(a, b) as an (a, b) pair compared lexicographically (a*D+b
    # exceeds int32)
    e1a, e1b = p, d_idx
    e2a, e2b = rcd, jnp.take(rcd, p, mode="clip")
    use1 = (e1a < e2a) | ((e1a == e2a) & (e1b <= e2b))
    ka = jnp.where(use1, e1a, e2a)
    kb = jnp.where(use1, e1b, e2b)
    va = jnp.where(on_cyc, ka, D)
    vb = jnp.where(on_cyc, kb, D)
    nxt = p
    rounds = max(1, int(np.ceil(np.log2(max(D, 2)))) + 1)
    for _ in range(rounds):
        ga = jnp.take(va, nxt, mode="clip")
        gb = jnp.take(vb, nxt, mode="clip")
        lt = (ga < va) | ((ga == va) & (gb < vb))
        va = jnp.where(lt, ga, va)
        vb = jnp.where(lt, gb, vb)
        nxt = jnp.take(nxt, nxt, mode="clip")
    new_head = on_cyc & (ka == va) & (kb == vb)
    prev_ptr = jnp.where(new_head, -1, prev_ptr)
    head_of, dist = _rank_chains(prev_ptr)
    return prev_ptr, head_of, dist


@functools.partial(jax.jit,
                   static_argnames=("k", "head_cap", "seq_cap"))
def _assemble(uniq, counts, n, src_key, tgt_key, lastbase, head_of, dist,
              k: int, head_cap: int, seq_cap: int):
    """Chains -> unitig arrays + packed sequence pool."""
    capK = uniq.shape[0]
    D = 2 * capK
    d_idx = jnp.arange(D, dtype=I32)
    valid = jnp.arange(capK, dtype=I32) < n
    dvalid = jnp.concatenate([valid, valid])

    is_head = (head_of == d_idx) & dvalid
    u_all = jnp.cumsum(is_head.astype(I32)) - 1     # unitig id at head lanes
    n_edges = jnp.sum(is_head.astype(I32))
    u_of = jnp.take(u_all, head_of, mode="clip")    # unitig id per lane

    gate = dvalid & (u_of < head_cap)
    # ulen + ecount fused into ONE (D, 2)-update scatter-add (same
    # index vector; scatter cost scales with index rows)
    counts_d2 = jnp.concatenate([counts, counts])
    upd = jnp.stack([jnp.ones((D,), I32), counts_d2], axis=1)
    acc = jnp.zeros((head_cap + 1, 2), I32).at[
        jnp.where(gate, u_of, head_cap)].add(upd, mode="drop")
    ulen = acc[:head_cap, 0]
    eidx = jnp.arange(head_cap, dtype=I32)
    elive = eidx < n_edges
    seq_len = jnp.where(elive, k + ulen, 0)
    seq_off = jnp.concatenate([jnp.zeros((1,), I32), jnp.cumsum(seq_len)])
    total = seq_off[head_cap]

    # head lane per unitig via compaction sort: head lanes' u_all
    # ascend with d_idx, so the sorted (is_head ? d_idx : big) prefix
    # IS head_d (dead slots carry D, bounded; consumers gate on elive
    # and gather with mode=clip)
    (hsorted,) = jax.lax.sort(
        (jnp.where(is_head, d_idx, D).astype(jnp.uint32),), num_keys=1)
    head_d = hsorted[:head_cap].astype(I32)
    head_e = jnp.where(head_d < capK, head_d, head_d - capK)
    head_is_rc = head_d >= capK
    hk = jnp.take(uniq, head_e, axis=0, mode="clip")
    kb = lb.unpack_limbs(hk, k + 1)                 # (head_cap, k+1) uint8
    rkb = (3 - kb)[:, ::-1]
    head_firstk = jnp.where(head_is_rc[:, None], rkb[:, :k], kb[:, :k])

    base_idx = seq_off[:head_cap, None] + jnp.arange(k, dtype=I32)[None, :]
    sdst = jnp.where(elive[:, None], base_idx, seq_cap)
    seq = jnp.zeros((seq_cap + 1,), jnp.uint8)
    seq = seq.at[sdst.reshape(-1)].set(head_firstk.reshape(-1), mode="drop")
    ldst = jnp.where(gate, jnp.take(seq_off, u_of, mode="clip") + k + dist,
                     seq_cap)
    seq = seq.at[ldst].set(lastbase, mode="drop")
    # pack 4 bases/byte for the host pull (strided slices, not a
    # (-1, 4) reshape whose minor dim pads to 128 on TPU)
    sq = seq[:seq_cap]
    seq_packed = (sq[0::4] | (sq[1::4] << 2) | (sq[2::4] << 4)
                  | (sq[3::4] << 6)).astype(jnp.uint8)

    ecount = acc[:head_cap, 1]

    # rc pairing: rc unitig of u = unitig of rc(tail(u)); tail lane per
    # unitig via a (u_of, d_idx) key sort — one tail per live unitig,
    # so the sorted prefix is tail_d indexed by unitig id
    tail_mask = gate & (dist == jnp.take(ulen, u_of, mode="clip") - 1)
    _, tsorted = jax.lax.sort(
        (jnp.where(tail_mask, u_of, head_cap + 1).astype(jnp.uint32),
         d_idx), num_keys=1)
    tail_d = tsorted[:head_cap]
    rc_d = jnp.where(tail_d < capK, tail_d + capK, tail_d - capK)
    edge_rc = jnp.take(u_of, rc_d, mode="clip")

    # endpoint nodes -> dense ids (ascending old node id, oracle np.unique)
    e_src_key = jnp.take(src_key, head_d, mode="clip")
    e_tgt_key = jnp.take(tgt_key, tail_d, mode="clip")
    used = jnp.concatenate([e_src_key // 2, e_tgt_key // 2]).astype(jnp.uint32)
    live2 = jnp.concatenate([elive, elive])
    used = jnp.where(live2, used, SENTINEL)
    su, = jax.lax.sort((used,), num_keys=1)[:1]
    i2 = jnp.arange(2 * head_cap, dtype=I32)
    nnew = jnp.concatenate([jnp.ones((1,), bool), su[1:] != su[:-1]])
    nnew = nnew & (i2 < 2 * n_edges)
    segn = jnp.cumsum(nnew.astype(I32)) - 1
    n_used = jnp.sum(nnew.astype(I32))
    node_of = jnp.zeros((D + 1,), I32).at[
        jnp.where(i2 < 2 * n_edges, su.astype(I32), D)].set(
        segn, mode="drop")
    edge_source = jnp.take(node_of, e_src_key // 2, mode="clip") * 2 \
        + (e_src_key & 1)
    edge_target = jnp.take(node_of, e_tgt_key // 2, mode="clip") * 2 \
        + (e_tgt_key & 1)

    return (n_edges, total, 2 * n_used, seq_packed, seq_len, ecount,
            edge_rc, edge_source, edge_target)


@functools.partial(jax.jit, static_argnames=("k", "head_cap", "seq_cap"))
def _build_all(uniq, counts, n, k: int, head_cap: int, seq_cap: int):
    """front -> (conditional) cycle break -> assemble as ONE dispatch.

    The tunnel charges ~tens of ms per dispatch and per host sync; the
    split form paid four (front, n_cyc pull, cycle break, assemble).
    The cycle break rides a lax.cond keyed on the device-side cycle
    count, and every scalar output comes back in one stacked pull."""
    (src_key, tgt_key, lastbase, prev_ptr, head_of, dist,
     n_cyc) = _front(uniq, counts, n, k)
    prev_ptr, head_of, dist = jax.lax.cond(
        n_cyc > 0, lambda a, b: _break_cycles(a, b),
        lambda a, b: (a, b, dist), prev_ptr, head_of)
    out = _assemble(uniq, counts, n, src_key, tgt_key, lastbase,
                    head_of, dist, k, head_cap, seq_cap)
    (n_edges, total, n_v2, seq_packed, seq_len, ecount, edge_rc,
     edge_source, edge_target) = out
    scalars = jnp.stack([n_edges, total, n_v2])
    return (scalars, seq_packed, seq_len, ecount, edge_rc, edge_source,
            edge_target)


def build_graph_on_device(uniq, counts, n: int, k: int, *,
                          head_cap: int | None = None) -> AsmGraph:
    """Device (kedges, counts) -> host AsmGraph, pulling only unitig-sized
    outputs.  uniq: (cap, nl) uint32 device, sorted unique, sentinel-padded;
    counts: (cap,) int32 device; n: live row count."""
    if n == 0:
        return AsmGraph(ksize=k)
    capK = 1 << max(int(n - 1).bit_length(), 10)
    if uniq.shape[0] < capK:
        raise ValueError("uniq capacity below n")
    uniq = uniq[:capK]
    counts = counts[:capK].astype(jnp.int32)
    n_dev = jnp.asarray(n, jnp.int32)
    if head_cap is None:
        head_cap = int(os.environ.get("TA_BUILD_HEAD_LOG2", 16))
        head_cap = min(1 << head_cap, 2 * capK)

    while True:
        seq_cap = 2 * capK + k * head_cap
        seq_cap = (seq_cap + 3) // 4 * 4
        out = _build_all(uniq, counts, n_dev, k, head_cap, seq_cap)
        scalars = np.asarray(out[0])          # one sync for all three
        n_e = int(scalars[0])
        if n_e <= head_cap:
            break
        head_cap = min(2 * head_cap, 2 * capK)
        if head_cap >= 2 * capK and n_e > head_cap:
            raise RuntimeError("unitig count exceeds 2x k-edge count")

    (_, seq_packed, seq_len, ecount, edge_rc,
     edge_source, edge_target) = out
    total = int(scalars[1])
    n_v = int(scalars[2])

    ecap = max(n_e, 1)
    nbytes = (total + 3) // 4
    views = [seq_len[:ecap], ecount[:ecap], edge_rc[:ecap],
             edge_source[:ecap], edge_target[:ecap], seq_packed[:nbytes]]
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(3) as ex:
        pulled = list(ex.map(np.asarray, views))
    seq_len_h, ecount_h, edge_rc_h, edge_source_h, edge_target_h = (
        a.astype(np.int64) for a in pulled[:5])
    packed_h = pulled[5]
    shifts = np.arange(4, dtype=np.uint8) * 2
    seq_data = ((packed_h[:, None] >> shifts[None, :]) & 3).reshape(-1)[
        :total].astype(np.uint8)

    g = AsmGraph(ksize=k)
    g.node_rc = np.arange(n_v, dtype=np.int64) ^ 1
    g.edge_source = edge_source_h
    g.edge_target = edge_target_h
    g.edge_rc = edge_rc_h
    g.edge_count = ecount_h
    g.seq_off = np.concatenate([[0], np.cumsum(seq_len_h)]).astype(np.int64)
    g.seq_data = seq_data
    g.rebuild_adjacency()
    return g
