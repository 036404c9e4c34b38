"""Basic simplification passes, faithful to src/basic_resolve.c.

Pass-by-pass provenance:
  remove_tips          — basic_resolve.c:641-696
  find_topo            — basic_resolve.c:541-575 (longest path to sink, capped)
  remove_tips_topo     — basic_resolve.c:577-639
  remove_chimeric      — basic_resolve.c:713-742
  check_simple_loop    — basic_resolve.c:744-875 (self loop / reverse loop /
                         double loop classification and unrolling)
  check_loop           — basic_resolve.c:1108-1181 (4-edge false loop)
  simple bubble        — basic_resolve.c:980-1012 (keep longest, sum counts)
  align bubble         — basic_resolve.c:929-977 (NW verification, gap -3,
                         +1/-1 match/mismatch; accept if score > 50% len and
                         len - score < 200)
  lazy condense        — basic_resolve.c:72-102 (in-place join of (1,1) nodes)

Thresholds come from config.GraphThresholds (assembly_graph.h:97-135).
The graphs here are post-level-0 and small; these passes run host-side.
The align-bubble DP is vectorized row-wise (the same recurrence later
backs the Pallas banded-DP kernel used by the mapper).
"""

from __future__ import annotations

import numpy as np

from ..config import GraphThresholds
from ..graph.mutable import MutableGraph

T = GraphThresholds()

MIN_NOTICE_LEN = T.min_notice_len
TIPS_RATIO_THRES = T.tips_ratio_thres
TIPS_COV_THRES = T.tips_cov_thres
TIPS_LEN_THRES = T.tips_len_thres
MIN_TIPS_LEG = T.min_tips_leg
TIPS_HARD_THRESHOLD = T.tips_hard_threshold
CHIMERIC_RATIO_THRES = T.chimeric_ratio_thres
CHIMERIC_LEN_THRES = T.chimeric_len_thres
MIN_UNROLL_LOOP = T.min_unroll_loop


def remove_tips(g: MutableGraph) -> int:
    cnt = 0
    for u in range(g.n_v):
        u_rc = g.node_rc[u]
        cov_fw = cov_rv = 0.0
        len_fw = len_rv = 0
        extend_left = extend_right = False
        for e in g.node_adj[u]:
            cov = g.edge_cov(e)
            cov_fw = max(cov_fw, cov)
            len_fw = max(len_fw, g.edges[e].seq_len)
            v = g.edges[e].target
            extend_left |= (g.deg(v) != 0 or g.edges[e].seq_len >= MIN_TIPS_LEG)
        for e in g.node_adj[u_rc]:
            cov = g.edge_cov(e)
            cov_rv = max(cov_rv, cov)
            len_rv = max(len_rv, g.edges[e].seq_len)
            v = g.edges[e].target
            extend_right |= (g.deg(v) != 0 or g.edges[e].seq_len >= MIN_TIPS_LEG)
        max_cov = max(cov_fw, cov_rv)
        j = 0
        adj = g.node_adj[u]
        while j < len(adj):
            e = adj[j]
            v = g.edges[e].target
            cov = g.edge_cov(e)
            if g.deg(v) == 0 and cov < max_cov and (
                (g.edges[e].seq_len < TIPS_LEN_THRES and extend_left and extend_right
                 and cov < TIPS_HARD_THRESHOLD)
                or (cov < TIPS_COV_THRES and cov < max_cov * TIPS_RATIO_THRES)
                or (len_fw >= MIN_TIPS_LEG and len_rv >= MIN_TIPS_LEG
                    and cov < max_cov * TIPS_RATIO_THRES)
            ):
                g.remove_edge_pair(e)
                cnt += 1
                # removal swaps in place; re-examine index j
            else:
                j += 1
    return cnt


def find_topo(g: MutableGraph, max_len: int = 1000):
    """Longest acyclic path length from each node to a sink, capped.
    Returns (d, degs): degs[v] > 0 marks nodes on cycles (never drained)."""
    n_v = g.n_v
    d = [0] * n_v
    degs = [g.deg(u) for u in range(n_v)]
    ksize = g.ksize
    queue = [u for u in range(n_v) if degs[u] == 0]
    qi = 0
    while qi < len(queue):
        u = queue[qi]; qi += 1
        u_rc = g.node_rc[u]
        for e in g.node_adj[u_rc]:
            v_rc = g.edges[e].target
            v = g.node_rc[v_rc]
            degs[v] -= 1
            cand = d[u] + g.edges[e].seq_len - ksize
            if cand > d[v]:
                d[v] = cand
            if d[v] > max_len:
                d[v] = max_len
            if degs[v] == 0:
                queue.append(v)
    return d, degs


def remove_tips_topo(g: MutableGraph) -> int:
    d, degs = find_topo(g, 1000)
    cnt = 0
    for u in range(g.n_v):
        u_rc = g.node_rc[u]
        cov_fw = cov_rv = 0.0
        len_fw = len_rv = 0
        extend_left = extend_right = False
        for e in g.node_adj[u]:
            cov = g.edge_cov(e)
            cov_fw = max(cov_fw, cov)
            len_fw = max(len_fw, g.edges[e].seq_len)
            v = g.edges[e].target
            extend_left |= (degs[v] != 0 or
                            d[v] + g.edges[e].seq_len - g.ksize >= MIN_TIPS_LEG)
        for e in g.node_adj[u_rc]:
            cov = g.edge_cov(e)
            cov_rv = max(cov_rv, cov)
            len_rv = max(len_rv, g.edges[e].seq_len)
            v = g.edges[e].target
            extend_right |= (degs[v] != 0 or
                             d[v] + g.edges[e].seq_len - g.ksize >= MIN_TIPS_LEG)
        max_cov = max(cov_fw, cov_rv)
        j = 0
        adj = g.node_adj[u]
        while j < len(adj):
            e = adj[j]
            v = g.edges[e].target
            cov = g.edge_cov(e)
            if (degs[v] == 0 and cov < max_cov and d[v] < TIPS_LEN_THRES and
                ((d[v] + g.edges[e].seq_len - g.ksize < TIPS_LEN_THRES and
                  ((extend_left and extend_right and cov < 30) or cov < cov_fw))
                 or (cov < TIPS_COV_THRES and cov < max_cov * TIPS_RATIO_THRES)
                 or (len_fw >= MIN_TIPS_LEG and len_rv >= MIN_TIPS_LEG
                     and cov < max_cov * TIPS_RATIO_THRES and cov < TIPS_COV_THRES))):
                g.remove_edge_pair(e)
                cnt += 1
            else:
                j += 1
    return cnt


def _max_out_cov(g: MutableGraph, u: int) -> float:
    cur = 0.0
    for e in g.node_adj[u]:
        if g.edges[e].source == -1:
            continue
        cur = max(cur, g.edge_cov(e))
    return cur


def remove_chimeric(g: MutableGraph) -> int:
    cnt = 0
    for e in range(g.n_e):
        ed = g.edges[e]
        if ed.source == -1:
            continue
        u, v = ed.source, ed.target
        u_rc, v_rc = g.node_rc[u], g.node_rc[v]
        cov = g.edge_cov(e)
        cov_fw = min(_max_out_cov(g, u), _max_out_cov(g, u_rc))
        cov_rv = min(_max_out_cov(g, v), _max_out_cov(g, v_rc))
        if ((cov < CHIMERIC_RATIO_THRES * cov_fw or cov < CHIMERIC_RATIO_THRES * cov_rv)
                and ed.seq_len < CHIMERIC_LEN_THRES and cov < 15):
            g.remove_edge_pair(e)
            cnt += 1
    return cnt


def _convert_cov_range(fcov: float):
    """reference convert_cov_range (src/assembly_graph.h:205-214)."""
    eps = 1e-6
    icov = int(fcov)
    if fcov + eps < icov + 0.25:
        return icov, icov
    elif fcov + eps > icov + 0.25 and fcov + eps < icov + 0.75:
        return icov, icov + 1
    return icov + 1, icov + 1


def check_simple_loop(g: MutableGraph, e: int) -> int:
    """0 none, 1 self-loop, 2 self-loop-reverse, 3 double-loop,
    -1 false loop removed (reference basic_resolve.c:744-875)."""
    if g.edges[e].seq_len >= MIN_NOTICE_LEN:
        return 0
    e_rc = g.edges[e].rc_id
    u, v = g.edges[e].source, g.edges[e].target
    u_rc, v_rc = g.node_rc[u], g.node_rc[v]
    cov = g.edge_cov(e)
    if u == v:  # self loop
        sum_cov, n_edges = 0.0, 0
        found = False
        for ee in g.node_adj[u_rc]:
            if ee != e_rc:
                sum_cov += g.edge_cov(g.edges[ee].rc_id)
                n_edges += 1
                found = True
        for ee in g.node_adj[u]:
            if ee != e:
                sum_cov += g.edge_cov(ee)
                n_edges += 1
                found = True
        if not found:
            return 0
        if cov < sum_cov / n_edges * 0.5:
            g.remove_edge_pair(e)
            return -1
        if g.deg(u_rc) > 2 or g.deg(u) > 2:
            return 0
        # split node: detach the loop from the through-path
        nv = g.create_node()
        nv_rc = g.node_rc[nv]
        g.edges[e].target = nv
        g.node_adj[u_rc].remove(e_rc)
        g.edges[e_rc].source = nv_rc
        g.node_adj[nv_rc].append(e_rc)
        g.node_adj[nv] = [x for x in g.node_adj[u] if x != e]
        g.node_adj[u] = [e]
        for e_t in g.node_adj[nv]:
            g.edges[e_t].source = nv
            g.edges[g.edges[e_t].rc_id].target = nv_rc
        return 1
    elif u == v_rc:  # self loop reverse (hairpin)
        sum_cov, n_edges = 0.0, 0
        for ee in g.node_adj[u_rc]:
            sum_cov += g.edge_cov(ee)
            n_edges += 1
        for ee in g.node_adj[u]:
            if ee != e and ee != e_rc:
                sum_cov += g.edge_cov(ee)
                n_edges += 1
        if n_edges and cov < sum_cov / n_edges * 0.5:
            g.remove_edge_pair(e)
            return -1
        return 0
    else:
        if (g.deg(u) != 1 or g.deg(v_rc) != 1 or
                g.deg(u_rc) > 2 or g.deg(v) > 2):
            return 0
        e1 = e2 = e_return = e_return_rc = -1
        for ee in g.node_adj[v]:
            if g.edges[ee].target == u:
                e_return = ee
            else:
                e2 = ee
        for ee in g.node_adj[u_rc]:
            if g.edges[ee].target == v_rc:
                e_return_rc = ee
            else:
                e1 = g.edges[ee].rc_id
        if e_return == -1 or e_return_rc == -1:
            return 0
        if g.edges[e_return].seq_len >= MIN_UNROLL_LOOP:
            return 0
        if e1 == -1 and e2 == -1:
            return 0
        if e1 == -1:
            mean_cov = g.edge_cov(e2)
        elif e2 == -1:
            mean_cov = g.edge_cov(e1)
        else:
            mean_cov = (g.edge_cov(e1) + g.edge_cov(e2)) / 2
        if mean_cov <= 0:
            return 0
        rcov_e = _convert_cov_range(cov / mean_cov)
        rcov_ret = _convert_cov_range(g.edge_cov(e_return) / mean_cov)
        rep = min(rcov_e[0] - 1, rcov_ret[0])
        if rep <= 0:
            rep = 1
        g.unroll_loop_forward(e, e_return, rep)
        g.unroll_loop_forward(e_rc, e_return_rc, rep)
        g.remove_edge_pair(e_return)
        return 3


def unroll_simple_loop(g: MutableGraph) -> int:
    cnt = 0
    for e in range(g.n_e):
        if g.edges[e].source == -1:
            continue
        if check_simple_loop(g, e) != 0:
            cnt += 1
    return cnt


def check_loop(g: MutableGraph, i_e2: int) -> int:
    """4-edge false-loop removal (reference basic_resolve.c:1108-1181)."""
    e2 = g.edges[i_e2]
    i_a, i_b = e2.source, e2.target
    i_a_rc, i_b_rc = g.node_rc[i_a], g.node_rc[i_b]
    if g.deg(i_a) != 1 or g.deg(i_b) != 1:
        return 0
    if g.deg(i_a_rc) != 2 or g.deg(i_b_rc) != 2:
        return 0
    b1 = False
    i_e4 = None
    for ee in g.node_adj[i_a_rc]:
        if g.edges[ee].target == i_b:
            b1 = True
    if not b1:
        return 0
    for ee in g.node_adj[i_b_rc]:
        if g.edges[ee].target == i_a:
            i_e4 = ee
        elif g.edges[ee].target != i_a_rc:
            return 0
    if i_e4 is None:
        return 0
    cov_e2 = g.edge_cov(i_e2)
    cov_e4 = g.edge_cov(i_e4)
    if cov_e2 < cov_e4:
        return 0
    if g.edges[i_e4].seq_len > 200:
        return 0
    g.remove_edge_pair(i_e4)
    return 1


def resolve_loop(g: MutableGraph) -> int:
    cnt = 0
    for e in range(g.n_e):
        if g.edges[e].source != -1:
            cnt += check_loop(g, e)
    return cnt


def _bubble_keep_longest(g: MutableGraph, branch) -> int:
    e_kept, max_len, sum_cnt = -1, 0, 0
    for e in branch:
        if g.edges[e].seq_len > max_len:
            max_len = g.edges[e].seq_len
            e_kept = e
        sum_cnt += g.edges[e].count
    for e in branch:
        if e != e_kept:
            g.remove_edge_pair(e)
    g.edges[e_kept].count = sum_cnt
    g.edges[g.edges[e_kept].rc_id].count = sum_cnt
    return len(branch) - 1


def nw_align_score(s1: np.ndarray, s2: np.ndarray) -> int:
    """Global alignment score, gap -3, match +1, mismatch -1 —
    the reference bubble DP (basic_resolve.c:929-953), row-vectorized:
    row[j] = max(b[j], max_{t<=j}(b[t] - 3*(j-t))) via running max."""
    m, n = len(s1), len(s2)
    prev = -3 * np.arange(n + 1)
    for i in range(1, m + 1):
        score = np.where(s2 == s1[i - 1], 1, -1)
        b = np.empty(n + 1, np.int64)
        b[0] = -3 * i
        b[1:] = np.maximum(prev[1:] - 3, prev[:-1] + score)
        t = b + 3 * np.arange(n + 1)
        row = np.maximum.accumulate(t) - 3 * np.arange(n + 1)
        prev = row
    return int(prev[n])


def _bubble_check_align(g: MutableGraph, e1: int, e2: int) -> bool:
    s1, s2 = g.edges[e1].seq, g.edges[e2].seq
    sc = nw_align_score(s1, s2)
    mx = max(len(s1), len(s2))
    return sc * 100 > 50 * mx and mx - sc < MIN_NOTICE_LEN * 2


def check_simple_bubble(g: MutableGraph, se: int) -> int:
    u, v = g.edges[se].source, g.edges[se].target
    if u == g.node_rc[v]:
        return 0
    branch = [e for e in g.node_adj[u]
              if g.edges[e].target == v and g.edges[e].seq_len < MIN_NOTICE_LEN]
    if len(branch) < 2:
        return 0
    return _bubble_keep_longest(g, branch)


def check_align_bubble(g: MutableGraph, se: int) -> int:
    u, v = g.edges[se].source, g.edges[se].target
    if u == g.node_rc[v]:
        return 0
    if g.edges[se].seq_len >= 1000:
        return 0
    branch = [se]
    for e in g.node_adj[u]:
        if (g.edges[e].seq_len < 1000 and g.edges[e].target == v and
                e != se and _bubble_check_align(g, se, e)):
            branch.append(e)
    if len(branch) < 2:
        return 0
    _bubble_keep_longest(g, branch)
    return len(branch)


def resolve_simple_bubble(g: MutableGraph) -> int:
    cnt = 0
    for e in range(g.n_e):
        if g.edges[e].source != -1:
            cnt += check_simple_bubble(g, e)
    return cnt


def resolve_align_bubble(g: MutableGraph) -> int:
    cnt = 0
    for e in range(g.n_e):
        if g.edges[e].source != -1:
            cnt += check_align_bubble(g, e)
    return cnt


def lazy_condense(g: MutableGraph) -> None:
    """In-place join of (1,1) nodes (reference asm_lazy_condense
    basic_resolve.c:72-102)."""
    for u in range(g.n_v):
        u_rc = g.node_rc[u]
        if g.deg(u) == 1 and g.deg(u_rc) == 1:
            e1 = g.node_adj[u][0]
            e2 = g.node_adj[u_rc][0]
            if e1 == e2 or e1 == g.edges[e2].rc_id:
                continue
            # chain through u_rc: rc(e1) -> u_rc -> e2; the reference calls
            # asm_join_edge(g, rc(e1), e1, e2, rc(e2)) which merges rc(e1)
            # followed by e2 (survivors rc(e1) and rc(e2))
            g.join_edge(g.edges[e1].rc_id, e2)
