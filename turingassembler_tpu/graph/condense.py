"""Graph condensation — rebuild keeping only branching nodes.

Faithful to the reference's `asm_condense` (src/basic_resolve.c:251-375):

- node kept iff it is a single-loop anchor (deg_fw==deg_rv==1 and the fw
  edge is the rc of the rv out-edge: a self-loop), or it is branching
  (NOT (1,1), NOT isolated, NOT a short dead-end per `is_dead_end`
  src/basic_resolve.c:54-70 — an isolated edge < 250 bp whose two
  endpoint nodes both have total degree 1 is dropped entirely);
- new edges walk chains of dropped (1,1) middle nodes, concatenating
  sequences with k-overlap and summing counts; each produces its rc
  clone, so edges stay in adjacent rc pairs (p, p+1).
"""

from __future__ import annotations

import numpy as np

from .structs import AsmGraph

DEAD_END_LEN = 250  # reference src/basic_resolve.c:69


def _is_dead_end(g: AsmGraph, u: int, deg, lens_h) -> bool:
    u_rc = int(g.node_rc[u])
    if deg[u] + deg[u_rc] != 1:
        return False
    e = int(g.node_adj(u)[0]) if deg[u] else int(g.node_adj(u_rc)[0])
    v = int(g.edge_target[e])
    v_rc = int(g.node_rc[v])
    if deg[v] + deg[v_rc] != 1:
        return False
    return lens_h[e] < DEAD_END_LEN


def asm_condense(g0: AsmGraph, return_map: bool = False):
    g0.rebuild_adjacency()
    deg = g0.node_deg()
    lens_h = g0.edge_lens_with_holes()

    node_id = np.full(g0.n_v, -1, np.int64)
    n_v = 0
    for u in range(g0.n_v):
        u_rc = int(g0.node_rc[u])
        deg_fw, deg_rv = int(deg[u]), int(deg[u_rc])
        is_single_loop = False
        if deg_fw == 1 and deg_rv == 1:
            fw_e = int(g0.node_adj(u)[0])
            rv_e = int(g0.edge_rc[int(g0.node_adj(u_rc)[0])])
            is_single_loop = fw_e == rv_e
        if not is_single_loop and (
            (deg_fw == 1 and deg_rv == 1)
            or deg_fw + deg_rv == 0
            or _is_dead_end(g0, u, deg, lens_h)
        ):
            continue
        node_id[u] = n_v
        n_v += 1

    new_node_rc = np.zeros(n_v, np.int64)
    for u in range(g0.n_v):
        if node_id[u] != -1:
            new_node_rc[node_id[u]] = node_id[int(g0.node_rc[u])]

    # walk chains
    consumed_rc = set()  # (v_rc, e_rc) adjacency entries already used
    new_edges = []  # dicts
    adj_sets = {}

    for u in range(g0.n_v):
        x = node_id[u]
        if x == -1:
            continue
        for e0 in g0.node_adj(u):
            e = int(e0)
            if (u, e) in consumed_rc:
                continue
            seq_parts = [g0.get_seq(e)]
            holes = list(_edge_holes(g0, e, 0))
            count = int(g0.edge_count[e])
            offset = g0.edge_len(e)
            while True:
                v = int(g0.edge_target[e])
                if node_id[v] == -1:
                    assert deg[v] == 1, "middle node degree != 1"
                    e = int(g0.node_adj(v)[0])
                    seq_parts.append(g0.get_seq(e)[g0.ksize:])
                    holes.extend(_edge_holes(g0, e, offset - g0.ksize))
                    count += int(g0.edge_count[e])
                    offset += g0.edge_len(e) - g0.ksize
                else:
                    break
            v_rc = int(g0.node_rc[v])
            e_rc = int(g0.edge_rc[e])
            consumed_rc.add((v_rc, e_rc))

            seq = np.concatenate(seq_parts)
            p = len(new_edges)
            q = p + 1
            y_rc = node_id[v_rc]
            new_edges.append(dict(source=x, target=node_id[v], rc_id=q,
                                  count=count, seq=seq, holes=holes))
            rc_seq = (3 - seq)[::-1]
            rc_holes = _mirror_holes(holes, len(seq))
            new_edges.append(dict(source=y_rc, target=new_node_rc[x], rc_id=p,
                                  count=count, seq=rc_seq, holes=rc_holes))

    g = AsmGraph(ksize=g0.ksize)
    g.node_rc = new_node_rc
    n_e = len(new_edges)
    g.edge_source = np.array([e["source"] for e in new_edges], np.int64) if n_e else np.zeros(0, np.int64)
    g.edge_target = np.array([e["target"] for e in new_edges], np.int64) if n_e else np.zeros(0, np.int64)
    g.edge_rc = np.array([e["rc_id"] for e in new_edges], np.int64) if n_e else np.zeros(0, np.int64)
    g.edge_count = np.array([e["count"] for e in new_edges], np.int64) if n_e else np.zeros(0, np.int64)
    seqs = [e["seq"] for e in new_edges]
    lens = np.array([len(s) for s in seqs], np.int64)
    g.seq_off = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    g.seq_data = np.concatenate(seqs) if seqs else np.zeros(0, np.uint8)
    for i, e in enumerate(new_edges):
        if e["holes"]:
            ph = np.array([p for p, _ in e["holes"]], np.int64)
            lh = np.array([l for _, l in e["holes"]], np.int64)
            g.holes[i] = (ph, lh)
    g.rebuild_adjacency()
    if return_map:
        # new node id -> old node id (reference asm_condense_map,
        # src/basic_resolve.c:377-505)
        new_to_old = np.zeros(n_v, np.int64)
        for u in range(g0.n_v):
            if node_id[u] != -1:
                new_to_old[node_id[u]] = u
        return g, new_to_old
    return g


def _edge_holes(g: AsmGraph, e: int, offset: int):
    if e in g.holes:
        ph, lh = g.holes[e]
        for p, l in zip(ph, lh):
            yield (int(p) + offset, int(l))


def _mirror_holes(holes, seq_len: int):
    """Hole after position p (0-based) in seq -> hole after position
    seq_len - 2 - p in the rc (reference asm_clone_seq_reverse)."""
    return [(seq_len - 2 - p, l) for p, l in reversed(holes)]
