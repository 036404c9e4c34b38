"""Command-line interface mirroring the reference CLI (src/main.c:426-503).

Same subcommand names and flag vocabulary as the reference parser
(parse_proc_option, main.c:178-286): `-1/-2/-I` file lists, `-l` library
type, `-k0` global k, `-lk` local k, `-o` output dir, `-i` graph.bin,
`-f` fasta, `-t` threads, `-sm` sort memory GB, `-v/-vv` verbosity,
`-metagenomics`.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

from .config import Config, LIB_TYPE_NAMES
from .logging_utils import init_logger, set_log_stage


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("-1", dest="files_1", nargs="+", default=[], help="forward reads")
    p.add_argument("-2", dest="files_2", nargs="+", default=[], help="reverse reads")
    p.add_argument("-I", dest="files_I", nargs="+", default=[], help="index (barcode) reads")
    p.add_argument("-l", dest="lib_type", choices=list(LIB_TYPE_NAMES), default="ust")
    p.add_argument("-k0", dest="k0", type=int, default=45)
    p.add_argument("-lk", dest="lk", type=int, default=31)
    p.add_argument("-o", dest="out_dir", default=".")
    p.add_argument("-i", dest="in_file", default=None, help="input graph .bin")
    p.add_argument("-f", dest="in_fasta", default=None, help="input fasta")
    p.add_argument("-lc", dest="in_contig_file", default=None, help="scaffold contig fasta")
    p.add_argument("-ref", dest="ref_fasta", default=None,
                   help="truth genome fasta (for `evaluate`)")
    p.add_argument("-t", dest="n_threads", type=int, default=4)
    p.add_argument("-sm", dest="mmem_gb", type=int, default=32)
    p.add_argument("-mc", dest="min_kmer_count", type=int, default=1,
                   help="drop (k+1)-mers below this count")
    p.add_argument("-v", dest="verbose", action="count", default=0)
    p.add_argument("-metagenomics", dest="metagenomics", action="store_true")
    # multi-process launch (SURVEY.md §5.8): every rank runs the same
    # command with its own --dist-pid; heavy stages stripe over ranks
    # and merge on rank 0 (pipeline.py), which writes the final output
    p.add_argument("--dist-coordinator", dest="dist_coordinator",
                   default=None, help="host:port of rank 0")
    p.add_argument("--dist-nproc", dest="dist_nproc", type=int, default=None)
    p.add_argument("--dist-pid", dest="dist_pid", type=int, default=None)


def _cfg_from_args(a) -> Config:
    cfg = Config(
        n_threads=a.n_threads,
        k0=a.k0, lk=a.lk,
        out_dir=a.out_dir,
        mmem_gb=a.mmem_gb,
        lib_type=LIB_TYPE_NAMES[a.lib_type],
        metagenomics=a.metagenomics,
        files_1=tuple(a.files_1), files_2=tuple(a.files_2),
        files_I=tuple(a.files_I),
        in_file=a.in_file, in_fasta=a.in_fasta,
        in_contig_file=a.in_contig_file,
        ref_fasta=a.ref_fasta,
    )
    import dataclasses
    cfg = cfg.replace(device=dataclasses.replace(cfg.device,
                                                 min_kmer_count=a.min_kmer_count))
    return cfg


COMMANDS = {}


def command(name):
    def deco(fn):
        COMMANDS[name] = fn
        return fn
    return deco


@command("assembly3")
def cmd_assembly3(cfg: Config):
    from .pipeline import assembly3
    set_log_stage("assembly3")
    assembly3(cfg)


@command("basic")
def cmd_basic(cfg: Config):
    """Graph-only pipeline: build_0 + build_0_1 + build_1_2."""
    from .pipeline import assembly_basic
    set_log_stage("basic")
    assembly_basic(cfg)


@command("build_0")
def cmd_build_0(cfg: Config):
    from .pipeline import build_0
    set_log_stage("build_0")
    build_0(cfg)


@command("build_0_1")
def cmd_build_0_1(cfg: Config):
    from .pipeline import build_0_1
    set_log_stage("build_0_1")
    build_0_1(cfg)


@command("build_1_2")
def cmd_build_1_2(cfg: Config):
    from .pipeline import build_1_2
    set_log_stage("build_1_2")
    build_1_2(cfg)


@command("sort_read")
def cmd_sort_read(cfg: Config):
    from .barcode.sort_read import sort_reads
    set_log_stage("sort_read")
    sort_reads(cfg)


@command("build_barcode")
def cmd_build_barcode(cfg: Config):
    from .barcode.builder import construct_aux_info
    from .barcode.sort_read import ReadPath
    from .io import asmg
    from .pipeline import graph_path
    set_log_stage("build_barcode")
    g = asmg.load_graph(cfg.in_file)
    rpath = ReadPath.from_sorted(cfg)
    g = construct_aux_info(cfg, g, rpath)
    asmg.save_graph(g, graph_path(cfg.out_dir, g.ksize, "added_barcode"))


@command("scaffold")
def cmd_scaffold(cfg: Config):
    from .io import asmg
    from .scaffold.scaffolding import scaffolding
    set_log_stage("scaffold")
    g = asmg.load_graph(cfg.in_file)
    scaffolding(cfg, g, cfg.out_dir)


@command("local_assembly")
def cmd_local_assembly(cfg: Config):
    from .barcode.sort_read import ReadPath
    from .io import asmg
    from .localasm.bridge import build_bridge
    import os
    set_log_stage("local_assembly")
    g = asmg.load_graph(cfg.in_file)
    rpath = ReadPath.from_sorted(cfg)
    scaf = os.path.join(cfg.out_dir, "local_assembly_scaffold_path.txt")
    build_bridge(cfg, g, rpath, scaf)


@command("resolve_n_m")
def cmd_resolve_n_m(cfg: Config):
    """Barcode-guided n-m bridge resolution on an added_barcode graph
    (reference resolve_n_m_simple / resolve_complex entry points)."""
    from .io import asmg
    from .pipeline import save_graph_info
    from .resolve.barcodes import resolve_n_m_bridges, resolve_n_m_simple
    set_log_stage("resolve_n_m")
    g = asmg.load_graph(cfg.in_file)
    g = resolve_n_m_simple(g)
    g = resolve_n_m_bridges(g)
    save_graph_info(g, cfg.out_dir, "n_m_resolved")


@command("build_3_4")
def cmd_build_3_4(cfg: Config):
    """level_3 -> level_4: barcode n-m simple resolution (reference
    build_3_4, src/process.c:228-236 -> resolve_n_m_simple)."""
    from .io import asmg
    from .pipeline import save_graph_info
    from .resolve.barcodes import resolve_n_m_simple
    set_log_stage("build_3_4")
    g = asmg.load_graph(cfg.in_file)
    g = resolve_n_m_simple(g)
    save_graph_info(g, cfg.out_dir, "level_4")


@command("build_4_5")
def cmd_build_4_5(cfg: Config):
    """level_4 -> level_5: complex-jungle barcode joins (reference
    build_4_5, src/process.c:238-246 -> resolve_complex)."""
    from .io import asmg
    from .pipeline import save_graph_info
    from .resolve.barcodes import resolve_complex
    set_log_stage("build_4_5")
    g = asmg.load_graph(cfg.in_file)
    g = resolve_complex(g)
    save_graph_info(g, cfg.out_dir, "level_5")


@command("resolve_dump")
def cmd_resolve_dump(cfg: Config):
    """Dump-loop duplication + 2-branch collapse passes (reference
    asm_resolve_dump_loop_ite / asm_resolve_dump_branch,
    src/basic_resolve.c:1198-1317)."""
    from .graph.condense import asm_condense
    from .graph.mutable import MutableGraph
    from .io import asmg
    from .pipeline import save_graph_info
    from .resolve.basic import resolve_dump_branch, resolve_dump_loop
    set_log_stage("resolve_dump")
    g = asmg.load_graph(cfg.in_file)
    mg = MutableGraph.from_asm(g)
    n_loop = 0
    while True:
        r = resolve_dump_loop(mg)
        if not r:
            break
        n_loop += r
    n_branch = resolve_dump_branch(mg)
    from .logging_utils import get_logger
    get_logger().info("resolve_dump: %d loop(s) duplicated, "
                      "%d branch(es) collapsed", n_loop, n_branch)
    save_graph_info(asm_condense(mg.to_asm()), cfg.out_dir, "dump_resolved")


@command("resolve_bulges")
def cmd_resolve_bulges(cfg: Config):
    """Simple-bulge pass on a graph file (reference
    resolve_simple_bulges_process, src/process.c:430-440)."""
    from .io import asmg
    from .pipeline import save_graph_info
    from .resolve.bulges import resolve_simple_bulges_ite
    set_log_stage("resolve_bulges")
    g = asmg.load_graph(cfg.in_file)
    g = resolve_simple_bulges_ite(g)
    save_graph_info(g, cfg.out_dir, "bulges_resolved")


@command("resolve_complex_bulges")
def cmd_resolve_complex_bulges(cfg: Config):
    """Complex-bulge pass on a graph file (reference
    resolve_complex_bulges_process, src/process.c:416-424)."""
    from .io import asmg
    from .pipeline import save_graph_info
    from .resolve.bulges import resolve_complex_bulges_ite
    set_log_stage("resolve_complex_bulges")
    g = asmg.load_graph(cfg.in_file)
    g = resolve_complex_bulges_ite(g)
    save_graph_info(g, cfg.out_dir, "complex_bulges_resolved")


@command("resolve_212_cov")
def cmd_resolve_212_cov(cfg: Config):
    """2-1-2 repeat resolution by coverage matching (reference
    resolve_212_cov_process, src/process.c:206-210)."""
    from .graph.mutable import MutableGraph
    from .graph.condense import asm_condense
    from .io import asmg
    from .pipeline import save_graph_info
    from .resolve.big import resolve_212_by_cov
    set_log_stage("resolve_212_cov")
    g = asmg.load_graph(cfg.in_file)
    mg = MutableGraph.from_asm(g)
    resolve_212_by_cov(mg)
    g = asm_condense(mg.to_asm())
    save_graph_info(g, cfg.out_dir, "212_resolved")


@command("build_coverage")
def cmd_build_coverage(cfg: Config):
    """k=31 coverage recount (reference build_coverage_process)."""
    from .io import asmg
    from .kmer.coverage import recount_coverage_from_batches
    from .pipeline import _genomic_batches, graph_path
    set_log_stage("build_coverage")
    g = asmg.load_graph(cfg.in_file)
    g = recount_coverage_from_batches(g, _genomic_batches(cfg))
    asmg.save_graph(g, graph_path(cfg.out_dir, g.ksize, "recount"))


@command("count_bx")
def cmd_count_bx(cfg: Config):
    from .barcode.frequency import count_bx_freq
    set_log_stage("count_bx")
    print(count_bx_freq(cfg))


@command("minimizers_hit")
def cmd_minimizers_hit(cfg: Config):
    """All-barcode minimizer sweep -> barcode_hits.csv (reference
    minimizers_hit -> mm_hit_all_barcodes, src/main.c:492-493)."""
    import os
    from .barcode.sort_read import ReadPath
    from .io import asmg
    from .scaffold.molecules import hit_all_barcodes
    set_log_stage("minimizers_hit")
    g = asmg.load_graph(cfg.in_file)
    rpath = ReadPath.from_sorted(cfg)
    bx_table, rp_table = hit_all_barcodes(cfg, g, rpath)
    out = os.path.join(cfg.out_dir, "barcode_hits.csv")
    with open(out, "w") as fp:
        for bc in sorted(bx_table):
            for e, c in sorted(bx_table[bc].items()):
                fp.write(f"{bc},{e},{c}\n")
    print(out)


@command("reduce_reads")
def cmd_reduce_reads(cfg: Config):
    from .barcode.frequency import reduce_reads
    from .graph.from_contigs import graph_from_contigs
    from .io.fasta import read_fasta
    set_log_stage("reduce_reads")
    contigs = graph_from_contigs([s for _, s in read_fasta(cfg.in_fasta)],
                                 cfg.k0)
    for o1, o2 in reduce_reads(cfg, contigs):
        print(o1, o2)


@command("get_rp_count")
def cmd_get_rp_count(cfg: Config):
    """Dump read-pair edge-pair counts (reference get_rp_count cmd)."""
    import os
    from .barcode.builder import get_read_pair_counts
    from .barcode.sort_read import ReadPath
    from .io import asmg
    set_log_stage("get_rp_count")
    g = asmg.load_graph(cfg.in_file)
    rpath = ReadPath.from_sorted(cfg)
    counts = get_read_pair_counts(cfg, g, rpath)
    out = os.path.join(cfg.out_dir, "readpair_counts.txt")
    with open(out, "w") as fp:
        for (e1, e2), c in sorted(counts.items()):
            fp.write(f"{e1} {e2} {c}\n")
    print(out)


@command("barcode_graph")
def cmd_barcode_graph(cfg: Config):
    """Molecule analysis: barcode digraph -> molecules.fasta (reference
    debug_get_barcode_graph / split_molecules paths)."""
    from .barcode.sort_read import ReadPath
    from .io import asmg
    from .scaffold.molecules import molecule_contigs
    set_log_stage("barcode_graph")
    g = asmg.load_graph(cfg.in_file)
    rpath = ReadPath.from_sorted(cfg)
    print(molecule_contigs(cfg, g, rpath))


@command("barcode_hit")
def cmd_barcode_hit(cfg: Config):
    """One-barcode debug mapping: fetch the barcode's reads, map them,
    report hit edges (reference smart_load.c:127-225 / barcode_hit cmd).
    Pass the barcode sequence via -f."""
    import numpy as np
    from .barcode.sort_read import (ReadPath, fetch_reads_by_barcodes,
                                    load_barcode_index, parse_fastq_blob)
    from .io import asmg
    from .io.fastq import NT4, decode_barcode_seq
    from .mapper.minimizers import EdgeMinimizerIndex, map_reads
    set_log_stage("barcode_hit")
    g = asmg.load_graph(cfg.in_file)
    rpath = ReadPath.from_sorted(cfg)
    index = load_barcode_index(rpath.idx_path)
    bc = decode_barcode_seq(cfg.in_fasta.encode())
    blob1, blob2 = fetch_reads_by_barcodes(rpath, index, [bc])
    mm = EdgeMinimizerIndex.build(g)
    for blob in (blob1, blob2):
        _, seqs, _, _ = parse_fastq_blob(blob)
        if not seqs:
            continue
        L = max(len(s) for s in seqs)
        bases = np.full((len(seqs), L), 255, np.uint8)
        lens = np.zeros(len(seqs), np.int32)
        for i, s in enumerate(seqs):
            arr = NT4[np.frombuffer(s, np.uint8)]
            bases[i, : len(arr)] = arr
            lens[i] = len(arr)
        edges, hits, starts = map_reads(mm, bases, lens)
        for e in sorted(set(int(x) for x in edges if x >= 0)):
            n = int((edges == e).sum())
            print(f"edge {e} ({int(g.edge_rc[e])}): {n} reads")


@command("split_molecules")
def cmd_split_molecules(cfg: Config):
    """Per-barcode molecule report: order each barcode's edge hits into
    molecules (reference split_molecules_process, process.c:271-365)."""
    from .barcode.sort_read import ReadPath
    from .io import asmg
    from .scaffold.molecules import hit_all_barcodes
    from .scaffold.molecules import order_molecule_edges
    set_log_stage("split_molecules")
    g = asmg.load_graph(cfg.in_file)
    rpath = ReadPath.from_sorted(cfg)
    bx_table, _ = hit_all_barcodes(cfg, g, rpath)
    import os
    out = os.path.join(cfg.out_dir, "molecules_by_barcode.txt")
    with open(out, "w") as fp:
        for bc in sorted(bx_table):
            # ordered molecules (reference order_edges writes barcode +
            # the chain of edge ids, split_molecules.c:145-185)
            for chain in order_molecule_edges(g, sorted(bx_table[bc])):
                fp.write(f"{bc}\n{' '.join(map(str, chain))}\n")
    print(out)


@command("build_2_3")
def cmd_build_2_3(cfg: Config):
    """level_2 -> level_3 (reference build_2_3, src/process.c:218-226:
    the resolve_chain body is commented out upstream, so the pass is a
    verified copy of the graph saved under the level_3 suffix)."""
    from .graph.invariants import check_graph
    from .io import asmg
    from .pipeline import save_graph_info
    set_log_stage("build_2_3")
    g = asmg.load_graph(cfg.in_file)
    check_graph(g, check_seq=False)
    save_graph_info(g, cfg.out_dir, "level_3")


@command("build_3_4_nobc")
def cmd_build_3_4_nobc(cfg: Config):
    """build_3_4 without rebuilding barcode aux info: the input graph
    .bin must already carry barcodes (reference
    build_3_4_no_bc_rebuild_process, src/process.c:757-765)."""
    from .io import asmg
    from .pipeline import save_graph_info
    from .resolve.barcodes import resolve_n_m_simple
    set_log_stage("build_3_4_nobc")
    g = asmg.load_graph(cfg.in_file)
    g = resolve_n_m_simple(g)
    save_graph_info(g, cfg.out_dir, "level_4")


@command("build_barcode_coverage")
def cmd_build_barcode_coverage(cfg: Config):
    """Barcode aux info + k=31 coverage recount in one pass (reference
    build_barcode_coverage -> build_barcode_read, src/process.c:256-264,
    the ASM_BUILD_COVERAGE variant of build_barcode)."""
    from .barcode.builder import construct_aux_info
    from .barcode.sort_read import ReadPath
    from .io import asmg
    from .kmer.coverage import recount_coverage_from_batches
    from .pipeline import _genomic_batches, graph_path
    set_log_stage("build_barcode_coverage")
    g = asmg.load_graph(cfg.in_file)
    g = recount_coverage_from_batches(g, _genomic_batches(cfg))
    rpath = ReadPath.from_sorted(cfg)
    g = construct_aux_info(cfg, g, rpath)
    from .io.asmg import save_graph
    save_graph(g, graph_path(cfg.out_dir, g.ksize, "added_barcode"))


@command("build_barcode_fasta")
def cmd_build_barcode_fasta(cfg: Config):
    """Build a contig graph from a FASTA and attach barcode aux info
    (reference build_barcode_process_fasta, src/process.c:787-809:
    load_asm_graph_fasta + longest-edge report + construct_aux_info)."""
    import numpy as np
    from .barcode.builder import construct_aux_info
    from .barcode.sort_read import ReadPath
    from .graph.from_contigs import graph_from_contigs
    from .io.asmg import save_graph
    from .io.fasta import read_fasta
    from .pipeline import graph_path, save_graph_info
    set_log_stage("build_barcode_fasta")
    g = graph_from_contigs([s for _, s in read_fasta(cfg.in_fasta)], cfg.k0)
    lens = g.edge_len()
    if g.n_e:
        le = int(np.argmax(lens))
        from .logging_utils import get_logger
        get_logger().info("Longest edge %d_%d, length %d",
                          le, int(g.edge_rc[le]), int(lens[le]))
    save_graph_info(g, cfg.out_dir, "from_fasta")
    rpath = ReadPath.from_sorted(cfg)
    g = construct_aux_info(cfg, g, rpath)
    save_graph(g, graph_path(cfg.out_dir, g.ksize, "added_barcode"))


@command("build_barcode_fastg")
def cmd_build_barcode_fastg(cfg: Config):
    """Load a FASTG graph, attach barcodes, run the n-m simple resolve
    (reference build_barcode_process_fastg, src/process.c:811-822:
    load_asm_graph_fastg + build_barcode_read + build_3_4 -> level_4)."""
    from .barcode.builder import construct_aux_info
    from .barcode.sort_read import ReadPath
    from .io.fastg import load_fastg
    from .pipeline import save_graph_info
    from .resolve.barcodes import resolve_n_m_simple
    set_log_stage("build_barcode_fastg")
    g = load_fastg(cfg.in_fasta, cfg.k0)
    rpath = ReadPath.from_sorted(cfg)
    g = construct_aux_info(cfg, g, rpath)
    g = resolve_n_m_simple(g)
    save_graph_info(g, cfg.out_dir, "level_4")


@command("build_bridge")
def cmd_build_bridge(cfg: Config):
    """Scaffold-gap bridging via local assembly (reference build_bridge
    / local_assembly both dispatch to build_bridge_process,
    src/main.c:458-461); identical to the local_assembly subcommand."""
    cmd_local_assembly(cfg)


@command("build_scaffolding_1_2")
def cmd_build_scaffolding_1_2(cfg: Config):
    """Scaffolding stage under its reference name (reference
    build_scaffolding_1_2_process, src/process.c:158-177 ->
    scaffolding() -> scaffolds.fasta); identical to `scaffold`."""
    cmd_scaffold(cfg)


@command("debug_current")
def cmd_debug_current(cfg: Config):
    """Read-pair greedy extension dump (reference debug_current ->
    debug_process -> get_long_contigs_by_readpairs,
    src/read_pairs_resolve.c:298-393): counts read pairs over the graph,
    extends long well-covered edges, writes graph_k_<k>_extend.fasta."""
    from .barcode.builder import get_read_pair_counts
    from .barcode.sort_read import ReadPath
    from .io import asmg
    from .pipeline import graph_path
    from .resolve.readpairs import get_long_contigs_by_readpairs
    set_log_stage("debug_current")
    g = asmg.load_graph(cfg.in_file)
    rpath = ReadPath.from_sorted(cfg)
    rp_counts = get_read_pair_counts(cfg, g, rpath)
    out = graph_path(cfg.out_dir, g.ksize, "extend", "fasta")
    print(get_long_contigs_by_readpairs(g, rp_counts, out))


@command("debug_get_barcode_graph")
def cmd_debug_get_barcode_graph(cfg: Config):
    """Reference name for the barcode-graph molecule dump (reference
    debug_get_barcode_graph -> print_barcode_graph_process,
    src/main.c:480-481); identical to `barcode_graph`."""
    cmd_barcode_graph(cfg)


@command("debug_split_molecules")
def cmd_debug_split_molecules(cfg: Config):
    """Split molecules for the barcodes listed in a frequency file
    (reference split_molecules_wrapper, src/process.c:271-305: reads
    '<barcode>\\t<count>' lines from -f, caps at 50,000 barcodes)."""
    import os
    from .barcode.sort_read import ReadPath
    from .io import asmg
    from .scaffold.molecules import hit_all_barcodes, order_molecule_edges
    set_log_stage("debug_split_molecules")
    g = asmg.load_graph(cfg.in_file)
    rpath = ReadPath.from_sorted(cfg)
    wanted = set()
    with open(cfg.in_fasta) as fp:
        for line in fp:
            parts = line.split()
            if not parts:
                continue
            tok = parts[0]
            if tok.isdigit():
                wanted.add(int(tok))
            else:
                from .io.fastq import decode_barcode_seq
                wanted.add(decode_barcode_seq(tok.encode()))
            if len(wanted) >= 50000:   # reference cap, process.c:294
                break
    bx_table, _ = hit_all_barcodes(cfg, g, rpath)
    out = os.path.join(cfg.out_dir, "molecules_by_barcode.txt")
    with open(out, "w") as fp:
        for bc in sorted(wanted & set(bx_table)):
            for chain in order_molecule_edges(g, sorted(bx_table[bc])):
                fp.write(f"{bc}\n{' '.join(map(str, chain))}\n")
    print(out)


@command("dirty")
def cmd_dirty(cfg: Config):
    """Load-and-validate no-op (the reference's dirty() body is empty,
    src/scaffolding/scaffolding.c:900-902; the subcommand exists only to
    exercise graph loading)."""
    from .graph.invariants import check_graph
    from .io import asmg
    set_log_stage("dirty")
    g = asmg.load_graph(cfg.in_file)
    check_graph(g, check_seq=False)
    print(f"loaded graph: n_v={g.n_v}, n_e={g.n_e}, k={g.ksize}")


@command("resolve_local")
def cmd_resolve_local(cfg: Config):
    """Pre-scaffolding local resolution: simple + complex bulge passes,
    then condense -> level_2 (reference resolve_local_process,
    src/process.c:493-514)."""
    from .graph.condense import asm_condense
    from .io import asmg
    from .pipeline import save_graph_info
    from .resolve.bulges import (resolve_complex_bulges_ite,
                                 resolve_simple_bulges_ite)
    set_log_stage("resolve_local")
    g = asmg.load_graph(cfg.in_file)
    g = resolve_simple_bulges_ite(g)
    g = resolve_complex_bulges_ite(g)
    g = asm_condense(g)
    save_graph_info(g, cfg.out_dir, "level_2")


@command("resolve_molecule")
def cmd_resolve_molecule(cfg: Config):
    """Long-contig extraction through the barcode graph (reference
    resolve_molecule_process -> get_long_contig -> get_list_contig,
    src/process.c:212-216, src/barcode_graph.c:635-732); same flow as
    `barcode_graph`."""
    cmd_barcode_graph(cfg)


@command("mm_index")
def cmd_mm_index(cfg: Config):
    """Dump minimizer-index statistics for a graph (reference mm_index
    debug cmd; singleton stats mm_singleton_stats minimizers.c:577)."""
    from .io import asmg
    from .mapper.minimizers import EdgeMinimizerIndex
    set_log_stage("mm_index")
    g = asmg.load_graph(cfg.in_file)
    idx = EdgeMinimizerIndex.build(g)
    n = len(idx.keys)
    singles = int(idx.singleton.sum())
    print(f"minimizers: {n} distinct, {singles} singletons "
          f"({100.0 * singles / max(n, 1):.1f}%), k={idx.k} w={idx.w}")


@command("evaluate")
def cmd_evaluate(cfg: Config):
    """QUAST-style quality report for an assembly against a known truth
    genome: NGA50, aligned blocks, misassemblies, genome fraction per
    truth record (the metrics of the reference's published claim,
    /root/reference/README.md:13-15, which it obtains from external
    QUAST).  Usage: evaluate -f assembly.fasta -ref truth.fasta"""
    from .evaluate import evaluate_assembly
    from .io.fasta import read_fasta
    if not cfg.in_fasta or not cfg.ref_fasta:
        print("evaluate needs -f assembly.fasta and -ref truth.fasta",
              file=sys.stderr)
        return 2
    contigs = [s for _, s in read_fasta(cfg.in_fasta)]
    total = sum(len(c) for c in contigs)
    print(f"assembly: {len(contigs)} contigs, {total:,} bp "
          f"(largest {max(map(len, contigs), default=0):,})")
    # one combined anchor index over ALL truth records: a contig joining
    # two records is a translocation and must count as a misassembly
    # (QUAST's extensive inter-record class)
    records = list(read_fasta(cfg.ref_fasta))
    res = evaluate_assembly(contigs, records)
    print(f"truth: {len(records)} records, "
          f"{sum(len(g) for _, g in records):,} bp")
    print(res)
    for name, frac in res.record_fraction:
        print(f"  {name}: fraction {frac:.3f}")
    return 0 if res.n_misassemblies == 0 else 1


@command("bin2text")
def cmd_bin2text(cfg: Config):
    """Graph round-trip debug dump (reference process.c:31-45)."""
    from .io import asmg
    from .io.fasta import write_fasta_all
    g = asmg.load_graph(cfg.in_file)
    out = cfg.in_file + ".fasta"
    write_fasta_all(g, out)
    print(f"wrote {out} (n_v={g.n_v}, n_e={g.n_e}, k={g.ksize})")


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: first-run compiles over the remote
    TPU tunnel cost minutes (a cold 500 kb assembly3 spends ~80% of its
    wall clock compiling); every later run reuses the executables."""
    import os
    import jax
    cache = os.environ.get(
        "TA_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "turingassembler_tpu", "xla"))
    if cache and cache != "0":
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main(argv=None) -> int:
    # honor JAX_PLATFORMS even though the container's sitecustomize
    # imports jax (and registers the axon backend) before env vars are
    # read — config.update is the only way to force a platform here
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    from .ops.hostmem import tune_host_malloc
    tune_host_malloc()
    _enable_compile_cache()
    argv = argv if argv is not None else sys.argv[1:]
    parser = argparse.ArgumentParser(
        prog="turingassembler_tpu",
        description="TPU-native read-cloud genome assembler")
    sub = parser.add_subparsers(dest="cmd", required=True)
    for name in COMMANDS:
        sp = sub.add_parser(name)
        _add_common(sp)
    a = parser.parse_args(argv)
    cfg = _cfg_from_args(a)
    level = logging.DEBUG if a.verbose else logging.INFO
    init_logger(cfg.out_dir, level)
    if a.dist_nproc is not None:
        from .parallel.distributed import init_distributed
        init_distributed(coordinator=a.dist_coordinator,
                         num_processes=a.dist_nproc,
                         process_id=a.dist_pid)
    try:
        rc = COMMANDS[a.cmd](cfg)
    except FileNotFoundError as e:
        print(f"{a.cmd}: file not found: {e}", file=sys.stderr)
        return 1
    return int(rc) if rc is not None else 0


if __name__ == "__main__":
    raise SystemExit(main())
