"""Per-edge barcode aux-info builder — rebuild of src/barcode_builder.c.

The reference BWA-maps every read pair against a FASTA of all edges and
attaches the pair's barcode to the hit edge's barcode sets by mapped
position (read_mapper, barcode_builder.c:737-912):

  lvl0 / lvl1 / lvl2   pos <= 500 / 3000 / 10000
                       (CONTIG_LEVEL_0/1/2, assembly_graph.h:112-114)
  barcodes_cov         3000 < pos <= 10000
  barcodes_scaf        pos < min(5000, len/2) and the mapping is unique
  read-pair counts     (edge(r1), edge(r2)) tallies for candidates

Here the mapper is the batched minimizer voter (mapper/minimizers.py);
each edge and its rc are separate index targets, so a read near the tail
of e maps near the head of rc(e) — the same head-window effect the
reference gets from indexing both strand records.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from ..config import Config
from ..graph.structs import AsmGraph
from ..io.fastq import NT4, decode_barcode_seq
from ..logging_utils import get_logger
from ..mapper.minimizers import EdgeMinimizerIndex, map_reads
from .sort_read import ReadPath, load_barcode_index, parse_fastq_blob

log = get_logger()

CONTIG_LEVEL_0 = 500      # reference assembly_graph.h:112
CONTIG_LEVEL_1 = 3000     # :113
CONTIG_LEVEL_2 = 10000    # :114
MIN_CONTIG_BARCODE = 5000  # :121


def _iter_sorted_pairs(rpath: ReadPath, batch_size: int = 8192, pad_to: int = 256):
    """Stream (bases1, len1, bases2, len2, barcodes) batches from the
    sorted archive."""
    from ..io.fastq import read_fastq_batches
    g1 = read_fastq_batches(rpath.R1_path, batch_size, pad_to, keep_text=True)
    g2 = read_fastq_batches(rpath.R2_path, batch_size, pad_to, keep_text=True)
    for b1 in g1:
        b2 = next(g2)
        bcs = np.zeros(len(b1.bases), np.uint64)
        for i, cm in enumerate(b1.comments):
            if cm.startswith(b"BX:Z:"):
                bcs[i] = decode_barcode_seq(cm.split()[0][5:])
            else:
                bcs[i] = np.uint64(0xFFFFFFFFFFFFFFFF)
        yield b1.bases, b1.lengths, b2.bases, b2.lengths, bcs


def init_barcode_structs(g: AsmGraph) -> None:
    g.barcodes = [[{}, {}, {}] for _ in range(g.n_e)]
    g.barcodes_scaf = [{} for _ in range(g.n_e)]
    g.barcodes_cov = [{} for _ in range(g.n_e)]
    g.aux_flag |= 0x1  # ASM_HAVE_BARCODE


def _attach(g: AsmGraph, lens, e: int, pos: int, bc: int) -> None:
    if pos <= CONTIG_LEVEL_0:
        for lvl in (0, 1, 2):
            d = g.barcodes[e][lvl]
            d[bc] = d.get(bc, 0) + 1
    elif pos <= CONTIG_LEVEL_1:
        for lvl in (1, 2):
            d = g.barcodes[e][lvl]
            d[bc] = d.get(bc, 0) + 1
    elif pos <= CONTIG_LEVEL_2:
        d = g.barcodes[e][2]
        d[bc] = d.get(bc, 0) + 1
    if CONTIG_LEVEL_1 < pos <= CONTIG_LEVEL_2:
        d = g.barcodes_cov[e]
        d[bc] = d.get(bc, 0) + 1
    if pos < min(MIN_CONTIG_BARCODE, int(lens[e]) // 2):
        d = g.barcodes_scaf[e]
        d[bc] = d.get(bc, 0) + 1


def construct_aux_info(cfg: Config, g: AsmGraph, rpath: ReadPath,
                       index: Optional[EdgeMinimizerIndex] = None,
                       build_readpairs: bool = True) -> AsmGraph:
    """Map all sorted read pairs; attach barcode sets + read-pair counts."""
    if index is None:
        index = EdgeMinimizerIndex.build(g)
    init_barcode_structs(g)
    lens = g.edge_len()
    BX_NONE = 0xFFFFFFFFFFFFFFFF
    n_pairs = n_mapped = 0
    for b1, l1, b2, l2, bcs in _iter_sorted_pairs(rpath):
        e1, h1, p1 = map_reads(index, b1, l1)
        e2, h2, p2 = map_reads(index, b2, l2)
        n_pairs += len(b1)
        for i in range(len(b1)):
            bc = int(bcs[i])
            for e, p in ((int(e1[i]), int(p1[i])), (int(e2[i]), int(p2[i]))):
                if e < 0:
                    continue
                n_mapped += 1
                if bc != BX_NONE:
                    _attach(g, lens, e, p, bc)
            if build_readpairs and e1[i] >= 0 and e2[i] >= 0 and e1[i] != e2[i] \
                    and g.edge_rc[e1[i]] != e2[i]:
                key = (int(e1[i]), int(e2[i]))
                nr, np_ = g.candidates.get(key, (0, 0))
                g.candidates[key] = (nr, np_ + 1)
    log.info("aux info: %d pairs, %d mapped reads, %d candidate pairs",
             n_pairs, n_mapped, len(g.candidates))
    return g


def get_read_pair_counts(cfg: Config, g: AsmGraph, rpath: ReadPath,
                         index: Optional[EdgeMinimizerIndex] = None
                         ) -> Dict[Tuple[int, int], int]:
    """Edge-pair read-pair counts (reference get_all_read_pairs_count,
    src/barcode_builder.c:287; feeds read_pairs_resolve)."""
    if index is None:
        index = EdgeMinimizerIndex.build(g)
    counts: Dict[Tuple[int, int], int] = {}
    for b1, l1, b2, l2, bcs in _iter_sorted_pairs(rpath):
        e1, _, _ = map_reads(index, b1, l1)
        e2, _, _ = map_reads(index, b2, l2)
        ok = (e1 >= 0) & (e2 >= 0)
        for i in np.flatnonzero(ok):
            key = (int(e1[i]), int(e2[i]))
            counts[key] = counts.get(key, 0) + 1
    return counts
