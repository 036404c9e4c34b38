"""Per-gap local graph construction, flank mapping, filtering, path search.

Rebuilds (reference files):
  get_reads_local_graph     barcode_resolve2.c:1600-1637 — reads whose
                            barcode is in the union of the two flanks'
                            lvl-1 barcode sets
  build_local_assembly_graph kmer_build.c:991 — DBG at lk=31 over those
                            reads (the reference also seeds "garbage"
                            k-mers from the flanks to stabilize counts;
                            we instead append the two flank sequences as
                            pseudo-reads, which plays the same role)
  find_match / map_contig.c — map a global contig into the local graph
                            by 100-mer window voting (WINDOW_SIZE=1000,
                            POINT_HIGH_THRESH=0.9, KSIZE=100)
  unrelated/connection/coverage filters — build_bridge.c:737-841
  get_all_paths_kmer_check  graph_search.c:244-328 — DFS path
                            enumeration with (lk+6)-mer read support
                            checks at branch points
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

import numpy as np

from ..config import Config
from ..graph.condense import asm_condense
from ..graph.mutable import MutableGraph
from ..graph.structs import ACGT, AsmGraph
from ..kmer.count import count_kedges_from_reads
from ..graph.build import build_graph_from_kedges
from ..logging_utils import get_logger
from ..resolve import resolve_local_graph_operation
from ..barcode.sort_read import ReadPath, fetch_reads_by_barcodes, parse_fastq_blob
from ..io.fastq import NT4

log = get_logger()

MAP_KSIZE = 100          # map_contig.h KSIZE
WINDOW_SIZE = 1000       # map_contig.h WINDOW_SIZE
POINT_HIGH_THRESH = 0.9  # map_contig.h POINT_HIGH_THRESH
MAX_PATH_COUNT = 100     # graph_search.h
MAX_VISITED_EDGE = 20000  # graph_search.c:7
MAX_DEPTH = 1000         # graph_search.c:9
MIN_PATH_LENGTH = 100    # build_bridge.h (path length in EDGES for bfs filter)
COV_FILTER_STRICT_LEN = 1000     # build_bridge.c:20
COV_FILTER_STRICT_THRESH = 0.6   # :21
COV_FILTER_MEDIUM_THRESH = 0.1   # :22


@dataclass
class SubseqPos:
    start: int = -1
    end: int = -1


@dataclass
class EdgeMap:
    gl_e: int
    lc_e: int = -1
    gpos: SubseqPos = field(default_factory=SubseqPos)
    lpos: SubseqPos = field(default_factory=SubseqPos)


# ---------------------------------------------------------------------------
# local graph build
# ---------------------------------------------------------------------------

def local_reads_for_pair(g: AsmGraph, rpath: ReadPath, bc_index,
                         e1: int, e2: int):
    """Fetch reads of the union of lvl-1 barcode sets of e1 and e2;
    returns (bases (N,L), lengths, n1) or None.  Rows [0, n1) are the
    R1 mates and rows [n1, n1+n1) the matching R2 mates, so row i pairs
    with row n1+i (path scoring needs the pairing)."""
    bcs = set(g.barcodes[e1][1]) | set(g.barcodes[e2][1])
    if not bcs:
        return None
    blob1, blob2 = fetch_reads_by_barcodes(rpath, bc_index, sorted(bcs))
    seqs = []
    n1 = 0
    for which, blob in enumerate((blob1, blob2)):
        _, ss, _, _ = parse_fastq_blob(blob)
        if which == 0:
            n1 = len(ss)
        seqs.extend(ss)
    if not seqs:
        return None
    L = max(len(s) for s in seqs)
    bases = np.full((len(seqs), L), 255, np.uint8)
    lengths = np.zeros(len(seqs), np.int32)
    for i, s in enumerate(seqs):
        arr = NT4[np.frombuffer(s, np.uint8)]
        bases[i, : len(arr)] = arr
        lengths[i] = len(arr)
    return bases, lengths, n1


def build_local_graph(cfg: Config, g: AsmGraph, rpath: ReadPath, bc_index,
                      e1: int, e2: int) -> Optional[AsmGraph]:
    """Local DBG at lk over barcode-selected reads + flank pseudo-reads."""
    lk = cfg.lk
    got = local_reads_for_pair(g, rpath, bc_index, e1, e2)
    if got is None:
        return None
    bases, lengths, _ = got
    # flank pseudo-reads (replaces the reference's add_garbage flank
    # k-mers, kmer_build.c:847-926): tail of e1 and head of e2
    flank_len = 3000
    flanks = []
    s1 = g.get_seq(e1)
    s2 = g.get_seq(e2)
    flanks.append(s1[-flank_len:])
    flanks.append(s2[:flank_len])
    L = max(bases.shape[1], max(len(f) for f in flanks))
    if L > bases.shape[1]:
        pad = np.full((len(bases), L - bases.shape[1]), 255, np.uint8)
        bases = np.concatenate([bases, pad], axis=1)
    fl = np.full((len(flanks), L), 255, np.uint8)
    fllen = np.zeros(len(flanks), np.int32)
    for i, f in enumerate(flanks):
        fl[i, : len(f)] = f
        fllen[i] = len(f)
    bases = np.concatenate([bases, fl])
    lengths = np.concatenate([lengths, fllen])

    # local jobs are tiny: host merge beats device LSM regardless of backend
    kedges, counts = count_kedges_from_reads(bases, lengths, lk,
                                             batch_size=4096, engine="np")
    if len(kedges) == 0:
        return None
    lg = build_graph_from_kedges(kedges, counts, lk)
    lg = resolve_local_graph_operation(lg)
    return lg


# ---------------------------------------------------------------------------
# flank mapping (map_contig)
# ---------------------------------------------------------------------------

def _seq_kmer_multiset(seq: np.ndarray, k: int) -> Dict[bytes, int]:
    out: Dict[bytes, int] = {}
    sb = seq.tobytes()
    for i in range(len(seq) - k + 1):
        key = sb[i : i + k]
        out[key] = out.get(key, 0) + 1
    return out


class MapContig:
    """Window-vote mapping of one global contig into a local graph
    (reference map_contig.c)."""

    def __init__(self, global_seq: np.ndarray, lg: AsmGraph):
        self.gseq = global_seq
        self.lg = lg
        self.edge_kmers = []
        for e in range(lg.n_e):
            if lg.edge_source[e] < 0:
                self.edge_kmers.append({})
            else:
                self.edge_kmers.append(_seq_kmer_multiset(lg.get_seq(e), MAP_KSIZE))
        self.is_match = np.zeros(lg.n_e, bool)
        self.best_match = -1
        self.best_window = -1

    def _match_window(self, pos: int) -> int:
        length = min(WINDOW_SIZE, len(self.gseq) - pos)
        if length < MAP_KSIZE:
            return -1
        wk = _seq_kmer_multiset(self.gseq[pos : pos + length], MAP_KSIZE)
        n_wk = max(1, length - MAP_KSIZE + 1)
        for e in range(self.lg.n_e):
            if self.lg.edge_len(e) < WINDOW_SIZE:
                continue
            ek = self.edge_kmers[e]
            pts = sum(min(c, ek.get(key, 0)) for key, c in wk.items())
            if pts >= POINT_HIGH_THRESH * n_wk:
                return e
        return -1

    def find_match(self) -> int:
        pos = 0
        while pos < len(self.gseq):
            e = self._match_window(pos)
            if e != -1:
                if self.best_match == -1:
                    self.best_match = e
                    self.best_window = pos
                self.is_match[e] = True
            pos += min(WINDOW_SIZE, len(self.gseq) - pos)
        return self.best_match

    def match_positions(self) -> Tuple[SubseqPos, SubseqPos]:
        """Approximate (gpos, lpos) of the matched run: extend the run of
        consecutive windows matching best_match, then locate the window
        inside the local edge by k-mer offset voting."""
        e = self.best_match
        g0 = self.best_window
        g1 = g0
        pos = g0
        while pos < len(self.gseq):
            length = min(WINDOW_SIZE, len(self.gseq) - pos)
            if self._match_window(pos) != e:
                break
            if length == WINDOW_SIZE:
                g1 = pos
            pos += length
        le_len = int(self.lg.edge_len(e))
        while g1 - g0 + WINDOW_SIZE > le_len:
            g1 -= WINDOW_SIZE
        g1 = max(g1, g0)
        # local offset: vote with positions of window k-mers on the edge
        eseq = self.lg.get_seq(e)
        epos: Dict[bytes, int] = {}
        sb = eseq.tobytes()
        for i in range(len(eseq) - MAP_KSIZE + 1):
            epos.setdefault(sb[i : i + MAP_KSIZE], i)
        gb = self.gseq.tobytes()

        def locate(gstart: int) -> int:
            votes = []
            length = min(WINDOW_SIZE, len(self.gseq) - gstart)
            for i in range(gstart, gstart + length - MAP_KSIZE + 1):
                p = epos.get(gb[i : i + MAP_KSIZE])
                if p is not None:
                    votes.append(p - (i - gstart))
            if not votes:
                return 0
            return int(np.median(votes))

        l0 = locate(g0)
        l1 = locate(g1)
        gpos = SubseqPos(g0, min(g1 + WINDOW_SIZE, len(self.gseq)) - 1)
        lpos = SubseqPos(max(l0, 0), min(max(l1 + WINDOW_SIZE, l0 + 1),
                                         le_len) - 1)
        return gpos, lpos


def get_local_edge_head(g: AsmGraph, lg: AsmGraph, e_id: int) -> EdgeMap:
    """Map flank contig e1 (its tail region) into the local graph
    (reference get_local_edge_head build_bridge.c:59-88: maps rc(e1) then
    mirrors coordinates)."""
    emap = EdgeMap(gl_e=e_id)
    e_rc = int(g.edge_rc[e_id])
    mct = MapContig(g.get_seq(e_rc), lg)
    emap.lc_e = mct.find_match()
    if emap.lc_e == -1:
        return emap
    gpos, lpos = mct.match_positions()
    # mirror back to the forward orientation of e_id
    elen = int(g.edge_len(e_id))
    lc = emap.lc_e
    emap.lc_e = int(lg.edge_rc[lc])
    lelen = int(lg.edge_len(emap.lc_e))
    g_start = elen - gpos.end - 1
    g_end = elen - gpos.start - 1
    l_start = lelen - lpos.end - 1
    l_end = lelen - lpos.start - 1
    emap.gpos = SubseqPos(g_start, g_end)
    emap.lpos = SubseqPos(max(l_start, 0), max(l_end, 0))
    if not _ok_range(emap.gpos, elen) or not _ok_range(emap.lpos, lelen):
        emap.lc_e = -1
    return emap


def get_local_edge_tail(g: AsmGraph, lg: AsmGraph, e_id: int) -> EdgeMap:
    emap = EdgeMap(gl_e=e_id)
    mct = MapContig(g.get_seq(e_id), lg)
    emap.lc_e = mct.find_match()
    if emap.lc_e == -1:
        return emap
    gpos, lpos = mct.match_positions()
    emap.gpos, emap.lpos = gpos, lpos
    if not _ok_range(emap.gpos, int(g.edge_len(e_id))) or \
            not _ok_range(emap.lpos, int(lg.edge_len(emap.lc_e))):
        emap.lc_e = -1
    return emap


def _ok_range(p: SubseqPos, length: int) -> bool:
    return 0 <= p.start <= p.end < length


# ---------------------------------------------------------------------------
# local-graph filters (operate in place via tombstones + condense)
# ---------------------------------------------------------------------------

def _remap(g: AsmGraph, lg: AsmGraph, emap1: EdgeMap, emap2: EdgeMap):
    e1 = get_local_edge_head(g, lg, emap1.gl_e)
    e2 = get_local_edge_tail(g, lg, emap2.gl_e)
    return e1, e2


def _condense_check_degenerate(g, lg, emap1, emap2):
    """Condense unless the two flanks collapse onto one local edge
    (reference condense_check_degenerate)."""
    lg1 = asm_condense(lg)
    m1, m2 = _remap(g, lg1, emap1, emap2)
    if m1.lc_e == -1 or m2.lc_e == -1:
        return lg, emap1, emap2  # degenerate; keep original
    return lg1, m1, m2


def unrelated_filter(g: AsmGraph, lg: AsmGraph, emap1: EdgeMap, emap2: EdgeMap,
                     scaffolds: List[int]) -> Tuple[AsmGraph, EdgeMap, EdgeMap]:
    bad = np.zeros(lg.n_e, bool)
    for c in scaffolds:
        mct = MapContig(g.get_seq(int(c)), lg)
        mct.find_match()
        for j in range(lg.n_e):
            rc = int(lg.edge_rc[j]) if lg.edge_rc[j] >= 0 else j
            bad[j] |= mct.is_match[j] or (rc >= 0 and mct.is_match[rc])
    for e in (emap1.lc_e, emap2.lc_e):
        if e >= 0:
            bad[e] = bad[int(lg.edge_rc[e])] = False
    if bad.any():
        for e in np.flatnonzero(bad):
            if lg.edge_source[e] >= 0:
                lg.edge_source[e] = -1
                lg.edge_source[int(lg.edge_rc[e])] = -1
        lg.rebuild_adjacency()
    return _condense_check_degenerate(g, lg, emap1, emap2)


def _bfs_edge_hops(lg: AsmGraph, start_e: int) -> np.ndarray:
    """Edge-hop BFS distance from edge start_e following target-node
    adjacency (reference bfs graph_search.c:380)."""
    dist = np.full(lg.n_e, -1, np.int64)
    dist[start_e] = 0
    q = [start_e]
    qi = 0
    while qi < len(q):
        u = q[qi]; qi += 1
        tg = int(lg.edge_target[u])
        for v in lg.node_adj(tg):
            v = int(v)
            if dist[v] == -1:
                dist[v] = dist[u] + 1
                q.append(v)
    return dist


def connection_filter(g: AsmGraph, lg: AsmGraph, emap1: EdgeMap, emap2: EdgeMap):
    fwd = _bfs_edge_hops(lg, emap1.lc_e)
    bwd = _bfs_edge_hops(lg, int(lg.edge_rc[emap2.lc_e]))
    bad = np.zeros(lg.n_e, bool)
    for i in range(lg.n_e):
        l1 = fwd[i]
        l2 = bwd[int(lg.edge_rc[i])] if lg.edge_rc[i] >= 0 else -1
        if l1 == -1 or l2 == -1 or l1 + l2 > MIN_PATH_LENGTH:
            bad[i] = True
    for i in range(lg.n_e):
        if lg.edge_rc[i] >= 0 and not bad[int(lg.edge_rc[i])]:
            bad[i] = False
    for e in (emap1.lc_e, emap2.lc_e):
        bad[e] = bad[int(lg.edge_rc[e])] = False
    if bad.any():
        for e in np.flatnonzero(bad):
            if lg.edge_source[e] >= 0:
                lg.edge_source[e] = -1
                lg.edge_source[int(lg.edge_rc[e])] = -1
        lg.rebuild_adjacency()
    return _condense_check_degenerate(g, lg, emap1, emap2)


def coverage_filter(g: AsmGraph, lg: AsmGraph, emap1: EdgeMap, emap2: EdgeMap):
    cov = lg.edge_cov()
    avg = (cov[emap1.lc_e] + cov[emap2.lc_e]) / 2
    if avg <= 0:
        return lg, emap1, emap2
    lens = lg.edge_len()
    ratio = cov / avg
    bad = np.where(lens >= COV_FILTER_STRICT_LEN,
                   ratio < COV_FILTER_STRICT_THRESH,
                   ratio < COV_FILTER_MEDIUM_THRESH)
    for e in (emap1.lc_e, emap2.lc_e):
        bad[e] = bad[int(lg.edge_rc[e])] = False
    if bad.any():
        for e in np.flatnonzero(bad & (lg.edge_source >= 0)):
            lg.edge_source[e] = -1
            lg.edge_source[int(lg.edge_rc[e])] = -1
        lg.rebuild_adjacency()
    return _condense_check_degenerate(g, lg, emap1, emap2)


# ---------------------------------------------------------------------------
# path search with k-mer read-support checks
# ---------------------------------------------------------------------------

def read_kmer_set(bases: np.ndarray, lengths: np.ndarray, k: int) -> Set[bytes]:
    """Set of k-mer byte-strings occurring in the local reads (reference
    get_kmer_hash kmer_hash.c:4-58; set membership is all the checks
    use)."""
    out: Set[bytes] = set()
    for i in range(len(bases)):
        s = bases[i, : lengths[i]].tobytes()
        for j in range(len(s) - k + 1):
            w = s[j : j + k]
            if b"\xff" in w or b"\x04" in w:
                continue
            out.add(w)
    return out


def _max_consec_missing(first: np.ndarray, second: np.ndarray, overlap: int,
                        k: int, kset: Set[bytes]) -> int:
    """reference count_max_consecutive_zero_kmer (kmer_hash.c:166-198):
    join tail(first, k) + head(second[overlap:], k-overlap...) and count
    the longest run of k-windows absent from the read k-mer set."""
    m = min(k, len(first))
    join = np.concatenate([
        first[len(first) - m :],
        second[overlap : min(len(second), k)],
    ])
    jb = join.tobytes()
    best = cur = 0
    for i in range(len(jb) - k + 1):
        if jb[i : i + k] not in kset:
            cur += 1
            best = max(best, cur)
        else:
            cur = 0
    return best


def get_all_paths_kmer_check(lg: AsmGraph, emap1: EdgeMap, emap2: EdgeMap,
                             check_k: int, kset: Set[bytes]) -> List[List[int]]:
    """DFS all paths lc_e1 -> lc_e2 with branch-point read-support checks
    (reference find_all_paths_kmer_check graph_search.c:286-328)."""
    lc_e1, lc_e2 = emap1.lc_e, emap2.lc_e
    trash = {lc_e1, int(lg.edge_rc[lc_e1]), int(lg.edge_rc[lc_e2])}
    paths: List[List[int]] = []
    visited: Set[int] = set()
    n_visited = [0]
    deg = lg.node_deg()

    def dfs(u: int, path: List[int]):
        if len(paths) >= MAX_PATH_COUNT or n_visited[0] >= MAX_VISITED_EDGE \
                or len(path) > MAX_DEPTH:
            return
        n_visited[0] += 1
        path.append(u)
        if u == lc_e2:
            paths.append(list(path))
            path.pop()
            return
        tg = int(lg.edge_target[u])
        first = lg.get_seq(u)
        for v in lg.node_adj(tg):
            v = int(v)
            if v in trash and v != lc_e2:
                continue
            if v in visited:
                continue
            if deg[tg] > 1:
                mc = _max_consec_missing(first, lg.get_seq(v), lg.ksize,
                                         check_k, kset)
                if mc >= 1:
                    continue
            visited.add(v)
            dfs(v, path)
            visited.discard(v)
        path.pop()

    dfs(lc_e1, [])
    return paths
