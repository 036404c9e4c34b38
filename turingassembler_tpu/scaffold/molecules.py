"""Barcode-graph molecule analysis — rebuild of src/barcode_graph.c +
src/cluster_molecules.c (SURVEY.md §2.10, the metagenomics/debug path).

Flow (reference get_list_contig barcode_graph.c:635-707):
  1. per-barcode edge hit counts via the minimizer mapper
     (mm_hit_all_barcodes, minimizers.c:780-943) and edge-pair read-pair
     counts;
  2. shared-barcode pair counts (count_edge_link_shared_bc,
     count_barcodes.c:478-520);
  3. candidate pairs filtered by length >= 500 (MIN_EDGE_LEN), coverage
     <= 1.5x global, share/(len_u+len_v) >= 0.005
     (MIN_SHARED_BARCODE_RATIO, lengths clamped at MOLECULE_DENSITY=5000);
  4. pairs must be supported by read pairs or a graph path within
     4 kb / 30 edges (filter_shortest_path_and_readpair,
     barcode_graph.c:367);
  5. a simple digraph over surviving edges (links need >= 100 shared
     barcodes, MIN_BARCODE_EDGE_COUNT) is reduced to its DAG part;
     longest paths are extracted (cluster_molecules.c:303-500) and
     emitted as molecule contigs, stitched through graph shortest paths;
  6. untouched edges above 0.25x coverage are carried over
     (create_barcode_molecules :352-420).
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from ..config import Config
from ..graph.structs import ACGT, AsmGraph
from ..logging_utils import get_logger
from ..mapper.minimizers import EdgeMinimizerIndex, map_reads
from ..resolve.readpairs import shortest_path_edges

log = get_logger()

MIN_EDGE_LEN = 500             # cluster_molecules.h:4
MAX_RADIUS = 4000              # :5
MAX_PATH_LEN = 30              # :6
MIN_BARCODE_EDGE_COUNT = 100   # :9
MIN_COVERAGE_TO_BE_IGNORE = 0.25  # :10
MIN_SHARED_BARCODE_RATIO = 0.005  # barcode_graph.c:19
MOLECULE_DENSITY = 5000        # barcode_graph.c:20


def hit_all_barcodes(cfg: Config, g: AsmGraph, rpath,
                     index: Optional[EdgeMinimizerIndex] = None):
    """(bx_table, rp_table): per-barcode edge hits and edge-pair
    read-pair counts (reference mm_hit_all_barcodes)."""
    from ..barcode.builder import _iter_sorted_pairs
    if index is None:
        index = EdgeMinimizerIndex.build(g)
    bx_table: Dict[int, Dict[int, int]] = defaultdict(lambda: defaultdict(int))
    rp_table: Dict[Tuple[int, int], int] = defaultdict(int)
    BX_NONE = np.uint64(0xFFFFFFFFFFFFFFFF)
    for b1, l1, b2, l2, bcs in _iter_sorted_pairs(rpath):
        e1, _, _ = map_reads(index, b1, l1)
        e2, _, _ = map_reads(index, b2, l2)
        # (barcode, edge) hit counts via numpy group-by
        both_bc = np.concatenate([bcs, bcs])
        both_e = np.concatenate([e1, e2]).astype(np.int64)
        ok = (both_e >= 0) & (both_bc != BX_NONE)
        bb, ee = both_bc[ok], both_e[ok]
        if len(bb):
            order = np.lexsort((ee, bb))
            bb, ee = bb[order], ee[order]
            starts = np.ones(len(bb), bool)
            starts[1:] = (bb[1:] != bb[:-1]) | (ee[1:] != ee[:-1])
            idx = np.flatnonzero(starts)
            cnt = np.diff(np.append(idx, len(bb)))
            for bc_, e_, c_ in zip(bb[idx].tolist(), ee[idx].tolist(),
                                   cnt.tolist()):
                bx_table[bc_][e_] += c_
        # (edge1, edge2) read-pair counts
        pr = (e1 >= 0) & (e2 >= 0) & (e1 != e2) & \
            (g.edge_rc[np.clip(e1, 0, g.n_e - 1)] != e2)
        if pr.any():
            keys = e1[pr].astype(np.int64) * np.int64(1 << 32) + e2[pr]
            uk, uc = np.unique(keys, return_counts=True)
            for k_, c_ in zip(uk.tolist(), uc.tolist()):
                rp_table[(k_ >> 32, k_ & 0xFFFFFFFF)] += int(c_)
    return bx_table, rp_table


def count_edge_link_shared_bc(bx_table) -> Dict[Tuple[int, int], int]:
    """Shared-barcode counts per edge pair (reference
    count_edge_link_shared_bc, src/minimizers/count_barcodes.c:478-520).
    All pairs within each barcode's edge set, enumerated in numpy."""
    rows_bc, rows_e = [], []
    for bc, hits in bx_table.items():
        es = sorted(hits)
        rows_bc.append(np.full(len(es), len(rows_bc), np.int64))
        rows_e.append(np.asarray(es, np.int64))
    out: Dict[Tuple[int, int], int] = defaultdict(int)
    if not rows_bc:
        return out
    grp = np.concatenate(rows_bc)
    edge = np.concatenate(rows_e)
    sizes = np.bincount(grp)
    # within-group all-pairs (j < k): left index repeats each element
    # (size - 1 - position) times; right runs over the remainder
    starts = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
    pos = np.arange(len(edge)) - starts[grp]
    rep = (sizes[grp] - 1 - pos).astype(np.int64)
    left = np.repeat(np.arange(len(edge)), rep)
    # right offsets: 1..rep within each left element
    roff = np.arange(len(left)) - np.repeat(
        np.concatenate([[0], np.cumsum(rep)[:-1]]).astype(np.int64), rep)
    right = left + 1 + roff
    keys = edge[left] * np.int64(1 << 32) + edge[right]
    uk, uc = np.unique(keys, return_counts=True)
    for k_, c_ in zip(uk.tolist(), uc.tolist()):
        out[(k_ >> 32, k_ & 0xFFFFFFFF)] = int(c_)
    return out


def candidate_pairs(g: AsmGraph, all_count, rp_table) -> List[Tuple[int, int]]:
    lens = g.edge_len()
    cov = g.edge_cov()
    gcov = g.mean_coverage()
    pairs = []
    for (u, v), val in all_count.items():
        if u == v or int(g.edge_rc[u]) == u:
            continue
        if cov[u] > 1.5 * gcov or cov[v] > 1.5 * gcov:
            continue
        if lens[u] < MIN_EDGE_LEN or lens[v] < MIN_EDGE_LEN:
            continue
        lu = min(int(lens[u]), MOLECULE_DENSITY)
        lv = min(int(lens[v]), MOLECULE_DENSITY)
        if val / (lu + lv) < MIN_SHARED_BARCODE_RATIO:
            continue
        # orientation support: read pairs or a short graph path
        for (a, b) in ((u, v), (v, u),
                       (int(g.edge_rc[v]), int(g.edge_rc[u])),
                       (int(g.edge_rc[u]), int(g.edge_rc[v]))):
            if rp_table.get((a, b), 0) > 0 or \
                    shortest_path_edges(g, a, b, max_bp=MAX_RADIUS,
                                        max_edges=MAX_PATH_LEN) is not None:
                pairs.append((a, b))
    return pairs


def extract_molecules(g: AsmGraph, pairs: List[Tuple[int, int]],
                      all_count) -> List[List[int]]:
    """DAG reduction + longest paths over the barcode digraph
    (cluster_molecules.c:303-500)."""
    link: Dict[int, List[int]] = defaultdict(list)
    nodes: Set[int] = set()
    for a, b in pairs:
        key = (min(a, b), max(a, b))
        rc_key = (min(int(g.edge_rc[b]), int(g.edge_rc[a])),
                  max(int(g.edge_rc[b]), int(g.edge_rc[a])))
        val = max(all_count.get(key, 0), all_count.get(rc_key, 0))
        if val < MIN_BARCODE_EDGE_COUNT:
            continue
        link[a].append(b)
        nodes.add(a)
        nodes.add(b)

    # drop nodes on cycles (find_DAG / check_loop_dfs)
    on_loop: Set[int] = set()
    visited: Set[int] = set()

    def dfs_loop(v, stack):
        if v in stack:
            on_loop.add(v)
            return
        if v in visited:
            return
        visited.add(v)
        stack.add(v)
        for u in link.get(v, ()):
            dfs_loop(u, stack)
        stack.discard(v)

    for v in list(nodes):
        dfs_loop(v, set())

    # longest path per node (memoized DAG DP)
    path_len: Dict[int, int] = {}
    nxt: Dict[int, int] = {}

    def longest(v) -> int:
        if v in path_len:
            return path_len[v]
        best, bn = 0, -1
        for u in link.get(v, ()):
            if u in on_loop:
                continue
            l = longest(u)
            if l > best:
                best, bn = l, u
        path_len[v] = best + 1
        nxt[v] = bn
        return best + 1

    has_pred = {b for bs in link.values() for b in bs}
    roots = [v for v in nodes if v not in has_pred and v not in on_loop]
    roots.sort(key=lambda v: -longest(v))
    used: Set[int] = set()
    molecules = []
    for r in roots:
        if r in used:
            continue
        path = []
        v = r
        while v != -1 and v not in used:
            path.append(v)
            used.add(v)
            used.add(int(g.edge_rc[v]))
            v = nxt.get(v, -1)
        if len(path) >= 2:
            molecules.append(path)
    return molecules


def molecule_contigs(cfg: Config, g: AsmGraph, rpath,
                     out_dir: Optional[str] = None) -> str:
    """Full molecule pipeline; writes molecules.fasta (paths stitched
    through graph shortest paths + untouched edges)."""
    out_dir = out_dir or cfg.out_dir
    os.makedirs(out_dir, exist_ok=True)
    bx_table, rp_table = hit_all_barcodes(cfg, g, rpath)
    all_count = count_edge_link_shared_bc(bx_table)
    pairs = candidate_pairs(g, all_count, rp_table)
    molecules = extract_molecules(g, pairs, all_count)
    from ..resolve.readpairs import _stitch_path_seq
    gcov = g.mean_coverage()
    cov = g.edge_cov()
    touched = np.zeros(g.n_e, bool)
    out = os.path.join(out_dir, "molecules.fasta")
    n = 0
    with open(out, "w") as fp:
        for path in molecules:
            seq = _stitch_path_seq(g, path)
            for e in path:
                touched[e] = touched[int(g.edge_rc[e])] = True
            fp.write(f">MOL_{n}\n{seq}\n")
            n += 1
        for e in range(g.n_e):
            rc = int(g.edge_rc[e]) if g.edge_rc[e] >= 0 else e
            if e > rc or g.edge_source[e] < 0:
                continue
            if touched[e] and cov[e] <= MIN_COVERAGE_TO_BE_IGNORE * gcov:
                continue
            fp.write(f">MOL_{n}\n{ACGT[g.get_seq(e)].tobytes().decode()}\n")
            n += 1
    log.info("molecules: %d paths, %d total records", len(molecules), n)
    return out
