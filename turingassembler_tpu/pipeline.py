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


# ---------------------------------------------------------------------------
# multi-process plumbing (SURVEY.md §5.8): under `jax.distributed` (the
# CLI's --dist-* flags or JAX_COORDINATOR_ADDRESS), assembly3 runs its
# full-library stages data-parallel over process stripes — counting, the
# read-pair-count map, and the aux-info map each reduce to associative
# key-sum tables that merge on rank 0 (the KMC partition-merge posture,
# reference src/KMC_reader.c:287-310, scaled to processes) — while graph
# transforms run on rank 0 between barriers over the shared out_dir.
# ---------------------------------------------------------------------------

def _dist_info() -> Tuple[int, int]:
    import jax
    try:
        return jax.process_index(), jax.process_count()
    except RuntimeError:
        return 0, 1


def _dist_barrier(tag: str) -> None:
    pid, n = _dist_info()
    if n > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def _striped(batches, pid: int, n: int):
    """Every n-th batch, offset pid — the process's input stripe."""
    for i, b in enumerate(batches):
        if i % n == pid:
            yield b


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
    pid, nproc = _dist_info()
    if nproc > 1:
        # N-process counting: each rank counts its batch stripe with its
        # own engine, rank 0 key-sum merges the runs and builds
        from .ops.sortops import np_merge_count_runs
        dist_dir = os.path.join(out_dir, "dist")
        os.makedirs(dist_dir, exist_ok=True)
        kedges, counts = count_kedges_from_batches(
            _striped(_genomic_batches(cfg), pid, nproc), k, min_count=1)
        np.savez(os.path.join(dist_dir, f"count_rank{pid}.npz"),
                 kedges=kedges, counts=counts)
        log.info("rank %d/%d counted %d unique (k+1)-mers in %.1fs",
                 pid, nproc, len(kedges), time.time() - t0)
        _dist_barrier("count_runs")
        if pid != 0:
            return None
        runs = []
        for r in range(nproc):
            z = np.load(os.path.join(dist_dir, f"count_rank{r}.npz"))
            runs.append((z["kedges"], z["counts"].astype(np.int64)))
        kedges, counts = np_merge_count_runs(runs)
        mc = cfg.device.min_kmer_count
        if mc > 1 and len(counts):
            keep = counts >= mc
            kedges, counts = kedges[keep], counts[keep]
        g = build_graph_from_kedges(kedges, counts, k)
        log.info("merged %d-rank count: %d unique; level-0 n_v=%d n_e=%d",
                 nproc, len(kedges), g.n_v, g.n_e)
        check_graph(g, check_seq=False)
        save_graph_info(g, out_dir, "level_0")
        return g
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


def assembly_basic(cfg: Config) -> Optional[AsmGraph]:
    """Stages 0-2 (the graph-only part of assembly3).  Multi-process:
    counting is striped over ranks (build_0); the graph transforms run
    on rank 0 while the others wait at the level_2 barrier (returns
    None on non-zero ranks)."""
    from .logging_utils import set_log_stage
    set_log_stage("build_0")
    g = build_0(cfg)
    pid, nproc = _dist_info()
    if nproc > 1 and pid != 0:
        _dist_barrier("level_2")
        return None
    set_log_stage("build_0_1")
    g = build_0_1(cfg, g)
    set_log_stage("build_1_2")
    g = build_1_2(cfg, g)
    if nproc > 1:
        _dist_barrier("level_2")
    return g


def assembly3(cfg: Config, extend: bool = True) -> str:
    """Full pipeline -> scaffold path file (reference assembly3_process
    process.c:585-701).  Returns the final fasta path.

    Stage order mirrors the reference: graph levels 0-2, read sort,
    read-pair counting + greedy extension into graph_k_<k>_extend.fasta,
    reload as a contig graph, k=31 coverage recount, barcode aux info,
    scaffolding, and per-gap local-assembly bridging."""
    from .barcode.sort_read import ReadPath, sort_reads
    from .barcode.builder import construct_aux_info, get_read_pair_counts
    from .config import LIB_TYPE_SORTED
    from .logging_utils import set_log_stage
    from .scaffold.scaffolding import scaffolding as scaffold_stage
    from .localasm.bridge import build_bridge

    out_dir = cfg.out_dir
    pid, nproc = _dist_info()
    dist_dir = os.path.join(out_dir, "dist")
    g = assembly_basic(cfg)

    set_log_stage("sort_read")
    if nproc > 1 and pid != 0:
        _dist_barrier("sorted")
        # the archive lives at deterministic paths in the shared out_dir
        rpath = (ReadPath.from_sorted(cfg) if cfg.lib_type == LIB_TYPE_SORTED
                 else ReadPath(os.path.join(out_dir, "R1.sorted.fq"),
                               os.path.join(out_dir, "R2.sorted.fq"),
                               os.path.join(out_dir, "barcode.idx")))
        g = asmg.load_graph(graph_path(out_dir, cfg.k0, "level_2"))
    else:
        rpath = sort_reads(cfg)
        log.info("sorted read archive: %s", rpath.idx_path)
        # archive integrity invariant (reference test_same_barcode,
        # src/barcode_resolve2.c:1554-1588): sampled post-sort check that
        # every indexed span is aligned FASTQ of exactly its barcode
        from .barcode.sort_read import verify_read_archive
        n_checked = verify_read_archive(rpath, max_barcodes=256)
        log.info("read archive integrity: %d barcodes verified", n_checked)
        if nproc > 1:
            _dist_barrier("sorted")

    if extend and int(g.alive_mask().sum()) > 2:
        from .graph.from_contigs import graph_from_contigs
        from .io.fasta import read_fasta
        from .mapper.minimizers import EdgeMinimizerIndex
        from .resolve.readpairs import get_long_contigs_by_readpairs

        set_log_stage("readpair_extend")
        if nproc > 1:
            # striped rp-count map, key-sum merged on rank 0
            rp_local = get_read_pair_counts(cfg, g, rpath,
                                            stripe=(pid, nproc))
            os.makedirs(dist_dir, exist_ok=True)
            np.savez(os.path.join(dist_dir, f"rp_rank{pid}.npz"),
                     k=np.array([[a, b] for a, b in rp_local.keys()],
                                np.int64).reshape(-1, 2),
                     v=np.array(list(rp_local.values()), np.int64))
            _dist_barrier("rp_counts")
            rp_counts = {}
            if pid == 0:
                for r in range(nproc):
                    z = np.load(os.path.join(dist_dir, f"rp_rank{r}.npz"))
                    for (a, b), v in zip(z["k"], z["v"]):
                        key = (int(a), int(b))
                        rp_counts[key] = rp_counts.get(key, 0) + int(v)
        else:
            rp_counts = get_read_pair_counts(cfg, g, rpath)
        if pid == 0:
            ext_path = graph_path(out_dir, cfg.k0, "extend", "fasta")
            get_long_contigs_by_readpairs(g, rp_counts, ext_path)
            seqs = [s for _, s in read_fasta(ext_path)]
            if seqs:
                g = graph_from_contigs(seqs, cfg.k0)
                from .kmer.coverage import recount_coverage_from_batches
                g = recount_coverage_from_batches(g, _genomic_batches(cfg))
                check_graph(g, check_seq=False)
            if nproc > 1:
                save_graph_info(g, out_dir, "extend_graph")
        if nproc > 1:
            _dist_barrier("extended")
            if pid != 0:
                g = asmg.load_graph(
                    graph_path(out_dir, cfg.k0, "extend_graph"))

    set_log_stage("build_barcode")
    if nproc > 1:
        from .barcode.builder import aux_tables_striped, merge_attach_tables
        table, cands = aux_tables_striped(cfg, g, rpath, (pid, nproc))
        os.makedirs(dist_dir, exist_ok=True)
        np.savez(os.path.join(dist_dir, f"aux_rank{pid}.npz"),
                 s=table[0], e=table[1], b=table[2], c=table[3],
                 ck=np.array([[a, b] for a, b in cands.keys()],
                             np.int64).reshape(-1, 2),
                 cv=np.array(list(cands.values()), np.int64))
        _dist_barrier("aux_tables")
        if pid == 0:
            from .parallel.sharded_aux import apply_aux_tables
            tables, cands_all = [], {}
            for r in range(nproc):
                z = np.load(os.path.join(dist_dir, f"aux_rank{r}.npz"))
                tables.append((z["s"], z["e"], z["b"], z["c"]))
                for (a, b), v in zip(z["ck"], z["cv"]):
                    key = (int(a), int(b))
                    cands_all[key] = cands_all.get(key, 0) + int(v)
            apply_aux_tables(g, merge_attach_tables(tables), cands_all)
            log.info("aux info merged from %d ranks: %d candidate pairs",
                     nproc, len(cands_all))
    else:
        g = construct_aux_info(cfg, g, rpath)
    if pid == 0:
        asmg.save_graph(g, graph_path(out_dir, cfg.k0, "added_barcode"))

    set_log_stage("scaffolding")
    if pid == 0:
        scaf_path = scaffold_stage(cfg, g, out_dir)
        log.info("scaffold paths: %s", scaf_path)
    else:
        scaf_path = os.path.join(out_dir, "local_assembly_scaffold_path.txt")
    if nproc > 1:
        _dist_barrier("scaffolded")

    set_log_stage("build_bridge")
    if nproc > 1:
        # every rank builds its stripe of the per-gap local assemblies
        # into the shared cache dirs; rank 0's bridging loop then runs
        # on cache hits only
        from .localasm.bridge import prebuild_local_graphs_striped
        if pid != 0:
            # non-zero ranks need the aux-complete graph for gap mapping
            g = asmg.load_graph(graph_path(out_dir, cfg.k0,
                                           "added_barcode"))
        n_built = prebuild_local_graphs_striped(cfg, g, rpath, scaf_path,
                                                out_dir, (pid, nproc))
        log.info("rank %d built %d local gap graphs", pid, n_built)
        _dist_barrier("gaps_prebuilt")
        if pid != 0:
            set_log_stage("done")
            return ""
    final = build_bridge(cfg, g, rpath, scaf_path)
    log.info("final assembly: %s", final)
    set_log_stage("done")
    return final


