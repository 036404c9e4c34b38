"""Vectorized simplification passes over the struct-of-arrays graph.

The per-node Python passes in resolve/basic.py are faithful oracles but
iterate edges one at a time — fine at the bacterial scale (n_e ~ 1e3),
quadratic pain at metagenome scale.  These implementations compute each
pass predicate on a snapshot of the whole graph with numpy segment
reductions (mask -> tombstone -> condense, SURVEY.md §7.5), iterating
snapshots to an in-pass fixpoint so cascades (a removed tip exposing
another) are still taken.

Semantics mirror the same reference passes:
  remove_tips            src/basic_resolve.c:641-696
  remove_tips_topo       src/basic_resolve.c:541-639
  remove_chimeric        src/basic_resolve.c:713-742
  resolve_simple_bubble  src/basic_resolve.c:980-1012
and the thresholds come from the same config block.  The driver uses
these as a pre-pass on large graphs and keeps resolve/basic.py as the
oracle (equivalence-tested in tests/test_vectorized_resolve.py).
"""

from __future__ import annotations

import numpy as np

from ..graph.structs import AsmGraph
from .basic import (
    CHIMERIC_LEN_THRES,
    CHIMERIC_RATIO_THRES,
    MIN_NOTICE_LEN,
    MIN_TIPS_LEG,
    TIPS_COV_THRES,
    TIPS_HARD_THRESHOLD,
    TIPS_LEN_THRES,
    TIPS_RATIO_THRES,
)


def _segmax(values: np.ndarray, seg: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros(n, values.dtype)
    np.maximum.at(out, seg, values)
    return out


def _remove_pairs(g: AsmGraph, rm: np.ndarray) -> int:
    """Tombstone edges and their rcs; return the number of removed
    PAIRS — the python oracles count one per remove_edge_pair (the rc
    is skipped as already-dead when the loop reaches it)."""
    removed = np.zeros(g.n_e, bool)
    removed[rm] = True
    removed[g.edge_rc[rm]] = True
    ids = np.flatnonzero(removed)
    g.edge_source[ids] = -1
    return (len(ids) + 1) // 2


def _node_views(g: AsmGraph):
    """(alive edge ids, per-edge arrays, per-node out-degree)."""
    alive = g.alive_mask()
    eids = np.flatnonzero(alive)
    src = g.edge_source[eids].astype(np.int64)
    tgt = g.edge_target[eids].astype(np.int64)
    cov = g.edge_cov()[eids]
    lens = g.edge_len()[eids].astype(np.int64)
    deg = np.bincount(src, minlength=g.n_v).astype(np.int64)
    return eids, src, tgt, cov, lens, deg


def remove_tips(g: AsmGraph) -> int:
    """Snapshot remove_tips iterated to fixpoint.  Tombstones in place."""
    rc_node = g.node_rc.astype(np.int64)
    total = 0
    while True:
        eids, src, tgt, cov, lens, deg = _node_views(g)
        if len(eids) == 0:
            break
        covmax = _segmax(cov, src, g.n_v)
        lenmax = _segmax(lens, src, g.n_v)
        # extend flag per node: any out-edge with live target or long leg
        ext_e = (deg[tgt] != 0) | (lens >= MIN_TIPS_LEG)
        ext = np.zeros(g.n_v, bool)
        np.logical_or.at(ext, src, ext_e)

        max_cov = np.maximum(covmax[src], covmax[rc_node[src]])
        extend_l = ext[src]
        extend_r = ext[rc_node[src]]
        len_fw = lenmax[src]
        len_rv = lenmax[rc_node[src]]
        is_tip = (deg[tgt] == 0) & (cov < max_cov) & (
            ((lens < TIPS_LEN_THRES) & extend_l & extend_r
             & (cov < TIPS_HARD_THRESHOLD))
            | ((cov < TIPS_COV_THRES) & (cov < max_cov * TIPS_RATIO_THRES))
            | ((len_fw >= MIN_TIPS_LEG) & (len_rv >= MIN_TIPS_LEG)
               & (cov < max_cov * TIPS_RATIO_THRES)))
        rm = eids[is_tip]
        if len(rm) == 0:
            break
        total += _remove_pairs(g, rm)
    return total


def _topo_longest(g: AsmGraph, max_len: int = 1000):
    """Longest acyclic path to a sink per node, capped (reference
    find_topo, src/basic_resolve.c:541-575).  Kahn order on arrays;
    degs[v] > 0 afterwards marks nodes on cycles (never drained)."""
    n_v = g.n_v
    rc = g.node_rc.astype(np.int64)
    alive = g.alive_mask()
    eids = np.flatnonzero(alive)
    src = g.edge_source[eids].astype(np.int64)
    tgt = g.edge_target[eids].astype(np.int64)
    lens = g.edge_len()[eids].astype(np.int64)
    degs = np.bincount(src, minlength=n_v).astype(np.int64)
    d = np.zeros(n_v, np.int64)
    # CSR by source so node_adj[u_rc] is bucket u_rc
    order = np.argsort(src, kind="stable")
    by_tgt = tgt[order]
    by_len = lens[order]
    boff = np.concatenate([[0], np.cumsum(
        np.bincount(src, minlength=n_v))]).astype(np.int64)
    queue = list(np.flatnonzero(degs == 0))
    qi = 0
    ksize = g.ksize
    while qi < len(queue):
        u = int(queue[qi]); qi += 1
        u_rc = int(rc[u])
        for j in range(boff[u_rc], boff[u_rc + 1]):
            v = int(rc[by_tgt[j]])
            degs[v] -= 1
            cand = d[u] + int(by_len[j]) - ksize
            if cand > d[v]:
                d[v] = cand
            if d[v] > max_len:
                d[v] = max_len
            if degs[v] == 0:
                queue.append(v)
    return d, degs


def remove_tips_topo(g: AsmGraph, max_len: int = 1000) -> int:
    """Snapshot remove_tips_topo, same predicate as the Python oracle
    (basic.remove_tips_topo; reference src/basic_resolve.c:577-639)."""
    rc_node = g.node_rc.astype(np.int64)
    total = 0
    while True:
        d, degs_cyc = _topo_longest(g, max_len)
        eids, src, tgt, cov, lens, deg = _node_views(g)
        if len(eids) == 0:
            break
        covmax = _segmax(cov, src, g.n_v)
        lenmax = _segmax(lens, src, g.n_v)
        # extend flag: any out-edge continuing (cycle node or reaching
        # MIN_TIPS_LEG through its target's longest path)
        ext_e = (degs_cyc[tgt] != 0) | (d[tgt] + lens - g.ksize
                                        >= MIN_TIPS_LEG)
        ext = np.zeros(g.n_v, bool)
        np.logical_or.at(ext, src, ext_e)

        cov_fw = covmax[src]
        max_cov = np.maximum(cov_fw, covmax[rc_node[src]])
        extend_l = ext[src]
        extend_r = ext[rc_node[src]]
        len_fw = lenmax[src]
        len_rv = lenmax[rc_node[src]]
        my_reach = d[tgt] + lens - g.ksize
        is_tip = ((degs_cyc[tgt] == 0) & (cov < max_cov)
                  & (d[tgt] < TIPS_LEN_THRES) & (
            ((my_reach < TIPS_LEN_THRES)
             & ((extend_l & extend_r & (cov < TIPS_HARD_THRESHOLD))
                | (cov < cov_fw)))
            | ((cov < TIPS_COV_THRES) & (cov < max_cov * TIPS_RATIO_THRES))
            | ((len_fw >= MIN_TIPS_LEG) & (len_rv >= MIN_TIPS_LEG)
               & (cov < max_cov * TIPS_RATIO_THRES)
               & (cov < TIPS_COV_THRES))))
        rm = eids[is_tip]
        if len(rm) == 0:
            break
        total += _remove_pairs(g, rm)
    return total


def remove_chimeric(g: AsmGraph) -> int:
    rc_node = g.node_rc.astype(np.int64)
    total = 0
    while True:
        eids, src, tgt, cov, lens, deg = _node_views(g)
        if len(eids) == 0:
            break
        covmax = _segmax(cov, src, g.n_v)
        cov_fw = np.minimum(covmax[src], covmax[rc_node[src]])
        cov_rv = np.minimum(covmax[tgt], covmax[rc_node[tgt]])
        is_chim = (((cov < CHIMERIC_RATIO_THRES * cov_fw)
                    | (cov < CHIMERIC_RATIO_THRES * cov_rv))
                   & (lens < CHIMERIC_LEN_THRES) & (cov < 15))
        rm = eids[is_chim]
        if len(rm) == 0:
            break
        total += _remove_pairs(g, rm)
    return total


def resolve_simple_bubble(g: AsmGraph) -> int:
    """Parallel short edges between the same node pair: keep the longest
    (first max in edge-id order), sum counts onto it and its rc
    (reference bubble_keep_longest, src/basic_resolve.c:901-1012)."""
    rc_node = g.node_rc.astype(np.int64)
    alive = g.alive_mask()
    lens_all = g.edge_len()
    cand = (alive & (lens_all < MIN_NOTICE_LEN)
            & (g.edge_source != rc_node[np.clip(g.edge_target, 0,
                                                g.n_v - 1)]))
    eids = np.flatnonzero(cand)
    if len(eids) < 2:
        return 0
    key = g.edge_source[eids] * np.int64(g.n_v) + g.edge_target[eids]
    order = np.argsort(key, kind="stable")   # stable: ids ascend in group
    ek, kk = eids[order], key[order]
    starts = np.flatnonzero(np.concatenate([[True], kk[1:] != kk[:-1]]))
    ends = np.append(starts[1:], len(ek))
    groups = [(int(ek[s]), ek[s:e]) for s, e in zip(starts, ends)
              if e - s >= 2]
    # process in ascending min-edge-id order — the order the sequential
    # edge loop would first touch each bubble (rc groups interleave)
    groups.sort(key=lambda t: t[0])
    cnt = 0
    for _, grp in groups:
        branch = [int(e) for e in grp if g.edge_source[e] >= 0]
        if len(branch) < 2:
            continue
        blens = lens_all[branch]
        kept = branch[int(np.argmax(blens))]
        total = int(g.edge_count[branch].sum())
        for e in branch:
            if e != kept:
                g.edge_source[e] = -1
                g.edge_source[g.edge_rc[e]] = -1
        g.edge_count[kept] = total
        g.edge_count[g.edge_rc[kept]] = total
        cnt += len(branch) - 1
    return cnt
