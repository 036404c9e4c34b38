"""Staged pipeline orchestration — the rebuild of src/process.c.

Every stage mirrors the reference's disk-checkpoint discipline
(save_graph_info, process.c:516-532): it ends by writing
`graph_k_<k>_<suffix>.{bin,gfa,fasta}` into the output directory, so any
stage can be re-run standalone from its input file (checkpoint/resume,
SURVEY.md §5.4).

Stage map (reference assembly3_process, process.c:585-701):
  build_0        FASTQ -> counted (k+1)-mers -> level_0 graph
  build_0_1      level_0 -> basic resolve fixpoint -> level_1
  build_1_2      level_1 -> simple+complex bulges -> level_2
  sort_read      barcode-sorted read archive + barcode.idx
  build_barcode  map reads, attach per-edge barcode sets
  scaffolding    shared-barcode greedy paths -> scaffolds.fasta
  build_bridge   per-gap local assembly -> scaffold.full.fasta
"""

from __future__ import annotations

import os
import time
from typing import List, Optional, Tuple

import numpy as np

from .config import Config
from .graph.build import build_graph_from_kedges
from .graph.condense import asm_condense
from .graph.invariants import check_graph
from .graph.structs import AsmGraph
from .io import asmg
from .io.fasta import write_fasta, write_gfa
from .io.fastq import read_fastq_batches
from .kmer.count import count_kedges_from_batches
from .logging_utils import get_logger

log = get_logger()


def graph_path(out_dir: str, k: int, suffix: str, ext: str = "bin") -> str:
    return os.path.join(out_dir, f"graph_k_{k}_{suffix}.{ext}")


def save_graph_info(g: AsmGraph, out_dir: str, suffix: str) -> None:
    """reference save_graph_info (process.c:516-532): bin + gfa + fasta."""
    os.makedirs(out_dir, exist_ok=True)
    asmg.save_graph(g, graph_path(out_dir, g.ksize, suffix, "bin"))
    write_gfa(g, graph_path(out_dir, g.ksize, suffix, "gfa"))
    write_fasta(g, graph_path(out_dir, g.ksize, suffix, "fasta"))
    log.info("saved graph level '%s': n_v=%d n_e=%d", suffix, g.n_v, g.n_e)


def batch_width(lengths: np.ndarray, lo: int = 64) -> int:
    """Bucket a batch's max read length to a multiple of 8: a uniform
    library yields one width (150 bp -> 152, the same shape the bench
    executables use), and every 8 columns of padding above the true
    read length would be dead sentinel lanes through the count sorts
    (64-column bucketing shipped 192 for 150 bp reads = +27% lanes)."""
    m = int(lengths.max()) if len(lengths) else lo
    return max(lo, -(-m // 8) * 8)


def _genomic_batches(cfg: Config, batch_size: int = 4096, pad_to: int = 256):
    """Yield (bases, lengths) batches over all genomic reads (R1 + R2).

    10X libraries carry barcode+UMI in the first 23 bp of R1
    (reference get_barcode_10x, src/sort_read.c:62-79) — trimmed here
    before counting."""
    from .config import LIB_TYPE_10X
    from .io.native_loader import read_fastq_batches_native
    for i, path in enumerate(list(cfg.files_1) + list(cfg.files_2)):
        is_r1 = i < len(cfg.files_1)
        for bases, lengths, _ in read_fastq_batches_native(
                path, batch_size=batch_size, pad_to=pad_to):
            if cfg.lib_type == LIB_TYPE_10X and is_r1:
                # trim, then re-pad so R1/R2 batch widths stay equal
                bases = np.concatenate(
                    [bases[:, 23:],
                     np.full((len(bases), 23), 255, np.uint8)], axis=1)
                lengths = np.maximum(lengths - 23, 0)
            if len(bases) < batch_size:
                pad = batch_size - len(bases)
                bases = np.concatenate([bases, np.full((pad, bases.shape[1]), 255, np.uint8)])
                lengths = np.concatenate([lengths, np.zeros(pad, np.int32)])
            yield np.ascontiguousarray(
                bases[:, : batch_width(lengths)]), lengths


def build_0(cfg: Config, out_dir: Optional[str] = None) -> AsmGraph:
    """FASTQ -> level-0 graph (reference build_0_KMC process.c:47 ->
    build_initial_graph kmer_build.c:839)."""
    out_dir = out_dir or cfg.out_dir
    k = cfg.k0
    if not (cfg.files_1 or cfg.files_2):
        raise SystemExit("build_0: no input reads (use -1/-2)")
    t0 = time.time()
    # -sm drives the counting memory budget (the reference hands it to
    # KMC, src/main.c:234-236): beyond mmem_gb of host-resident count
    # runs the megasort engine spills to disk and k-way merges
    os.environ.setdefault("TA_SORT_HOST_MB", str(cfg.mmem_gb * 1024))
    os.environ.setdefault("TA_SPILL_DIR", os.path.join(out_dir, "spill"))
    import jax
    if jax.default_backend() != "cpu":
        # TPU: table stays on device and feeds the device unitig build —
        # the 6-7M-row k-edge pull + host walk was build_0's second wall
        from .graph.device_build import build_graph_on_device
        from .kmer.megasort import count_kedges_megasort_device
        res = count_kedges_megasort_device(
            _genomic_batches(cfg), k, min_count=cfg.device.min_kmer_count)
        if len(res) == 3:
            uniq_d, counts_d, n_u = res
            log.info("counted %d unique (k+1)-mers in %.1fs (device table)",
                     n_u, time.time() - t0)
            t0 = time.time()
            # error-laden libraries run ~1 unitig per 10 k-edges; start
            # head_cap high enough that the doubling retry (a fresh
            # compile per head_cap) almost never fires
            head_cap = 1 << max(16, int(max(n_u // 8, 1) - 1).bit_length())
            g = build_graph_on_device(uniq_d, counts_d, n_u, k,
                                      head_cap=head_cap)
        else:                     # -sm spill forced the table to host
            kedges, counts = res
            log.info("counted %d unique (k+1)-mers in %.1fs (spilled)",
                     len(kedges), time.time() - t0)
            t0 = time.time()
            g = build_graph_from_kedges(kedges, counts, k)
    else:
        kedges, counts = count_kedges_from_batches(
            _genomic_batches(cfg), k, min_count=cfg.device.min_kmer_count)
        log.info("counted %d unique (k+1)-mers in %.1fs",
                 len(kedges), time.time() - t0)
        t0 = time.time()
        g = build_graph_from_kedges(kedges, counts, k)
    log.info("level-0 build in %.1fs: n_v=%d n_e=%d", time.time() - t0,
             g.n_v, g.n_e)
    t0 = time.time()
    check_graph(g, check_seq=False)
    save_graph_info(g, out_dir, "level_0")
    log.info("check+save in %.1fs", time.time() - t0)
    return g


def build_0_1(cfg: Config, g: Optional[AsmGraph] = None,
              out_dir: Optional[str] = None) -> AsmGraph:
    """level_0 -> level_1 via the basic-resolve fixpoint (reference
    build_0_1 process.c:121 -> resolve_graph_operation)."""
    from .resolve import resolve_graph_operation
    out_dir = out_dir or cfg.out_dir
    if g is None:
        g = asmg.load_graph(graph_path(out_dir, cfg.k0, "level_0"))
    g = resolve_graph_operation(g, log=log.info)
    check_graph(g, check_seq=False)
    save_graph_info(g, out_dir, "level_1")
    return g


def build_1_2(cfg: Config, g: Optional[AsmGraph] = None,
              out_dir: Optional[str] = None) -> AsmGraph:
    """level_1 -> level_2: simple bulges + complex bulges + condense
    (reference resolve_local_process process.c:493)."""
    from .resolve.bulges import resolve_simple_bulges_ite, resolve_complex_bulges_ite
    out_dir = out_dir or cfg.out_dir
    if g is None:
        g = asmg.load_graph(graph_path(out_dir, cfg.k0, "level_1"))
    g = resolve_simple_bulges_ite(g)
    g = resolve_complex_bulges_ite(g)
    g = asm_condense(g)
    check_graph(g, check_seq=False)
    save_graph_info(g, out_dir, "level_2")
    return g


def assembly_basic(cfg: Config) -> AsmGraph:
    """Stages 0-2 (the graph-only part of assembly3)."""
    from .logging_utils import set_log_stage
    set_log_stage("build_0")
    g = build_0(cfg)
    set_log_stage("build_0_1")
    g = build_0_1(cfg, g)
    set_log_stage("build_1_2")
    g = build_1_2(cfg, g)
    return g


def assembly3(cfg: Config, extend: bool = True) -> str:
    """Full pipeline -> scaffold path file (reference assembly3_process
    process.c:585-701).  Returns the final fasta path.

    Stage order mirrors the reference: graph levels 0-2, read sort,
    read-pair counting + greedy extension into graph_k_<k>_extend.fasta,
    reload as a contig graph, k=31 coverage recount, barcode aux info,
    scaffolding, and per-gap local-assembly bridging."""
    from .barcode.sort_read import sort_reads
    from .barcode.builder import construct_aux_info, get_read_pair_counts
    from .logging_utils import set_log_stage
    from .scaffold.scaffolding import scaffolding as scaffold_stage
    from .localasm.bridge import build_bridge

    out_dir = cfg.out_dir
    g = assembly_basic(cfg)

    set_log_stage("sort_read")
    rpath = sort_reads(cfg)
    log.info("sorted read archive: %s", rpath.idx_path)
    # archive integrity invariant (reference test_same_barcode,
    # src/barcode_resolve2.c:1554-1588): sampled post-sort check that
    # every indexed span is aligned FASTQ of exactly its barcode
    from .barcode.sort_read import verify_read_archive
    n_checked = verify_read_archive(rpath, max_barcodes=256)
    log.info("read archive integrity: %d barcodes verified", n_checked)

    if extend and int(g.alive_mask().sum()) > 2:
        from .graph.from_contigs import graph_from_contigs
        from .io.fasta import read_fasta
        from .kmer.coverage import recount_coverage
        from .mapper.minimizers import EdgeMinimizerIndex
        from .resolve.readpairs import get_long_contigs_by_readpairs

        set_log_stage("readpair_extend")
        rp_counts = get_read_pair_counts(cfg, g, rpath)
        ext_path = graph_path(out_dir, cfg.k0, "extend", "fasta")
        get_long_contigs_by_readpairs(g, rp_counts, ext_path)
        seqs = [s for _, s in read_fasta(ext_path)]
        if seqs:
            g = graph_from_contigs(seqs, cfg.k0)
            from .kmer.coverage import recount_coverage_from_batches
            g = recount_coverage_from_batches(g, _genomic_batches(cfg))
            check_graph(g, check_seq=False)

    set_log_stage("build_barcode")
    g = construct_aux_info(cfg, g, rpath)
    asmg.save_graph(g, graph_path(out_dir, cfg.k0, "added_barcode"))

    set_log_stage("scaffolding")
    scaf_path = scaffold_stage(cfg, g, out_dir)
    log.info("scaffold paths: %s", scaf_path)

    set_log_stage("build_bridge")
    final = build_bridge(cfg, g, rpath, scaf_path)
    log.info("final assembly: %s", final)
    set_log_stage("done")
    return final


