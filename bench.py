"""Headline benchmark: reads/s through k-mer count + level-0 DBG build
+ read->edge mapping — the pipeline's two dominant wall-clock stages
plus the graph build that joins them (VERDICT r2 #2 widened the scope
from count+build).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}

Baseline (the reference publishes no throughput numbers, BASELINE.md,
and its KMC binary is stripped so it cannot be run; the estimates and
their assumptions):
  - count+build: 250,000 reads/s — KMC2-class counters sustain ~1-4 M
    (k+1)-mers/s/thread on 150 bp reads; 250 k reads/s * ~105
    kmers/read / 4 threads ~ 6.6 M kmers/s/thread is a generous
    ceiling for the 4-thread C pipeline (kmer count + DBG build).
  - map: 45,000 reads/s — BWA-MEM runs ~5-15 k reads/s/thread on
    150 bp reads against a small reference, and the reference rescores
    every hit with ksw_global2 (src/barcode_builder.c:448-563); ~11 k
    reads/s/thread * 4 threads is again generous.
  - combined (stages run sequentially over the same reads):
    1 / (1/250000 + 1/45000) = 38,135 reads/s.
vs_baseline divides by the combined estimate; treat it with the error
bars of both estimates and of this rig's 4-450 MB/s host<->device
tunnel jitter (NOTES_ROUND2).

Workload: synthetic 2 Mbp genome, 1M 150 bp error-free reads (~79x;
read clouds run high-coverage — the reference's E. coli library is
60M pairs on 4.6 Mbp), k = 45 (the reference's default k0,
src/main.c:141).  Stages:
  1. count+build: threaded H2D of packed read chunks -> device
     canonical (k+1)-mer extraction -> device sort + run-length count
     (kmer/megasort.py) -> device level-0 unitig build
     (graph/device_build.py) -> host graph pull.
  2. map: all 1M reads voted + gapless-DP-verified against the graph
     ASSEMBLED in stage 1 (mapper/minimizers.py) — the aux-info /
     extension hot kernel.  The map consumes the count stage's
     device-resident ship records: reads cross the host<->device
     tunnel ONCE per pipeline (paid inside the count timing), where
     the reference re-streams the FASTQ from disk per stage
     (src/process.c:585-701).  Index build is one-time per assembly
     and reported separately on stderr (the reference's bwa_idx_build
     analogue).
Per-stage seconds go to stderr so stage shares are trackable round
over round.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # output table sized for this workload's ~2M unique (k+1)-mers
    os.environ.setdefault("TA_SORT_OUT_LOG2", "22")
    # keep large host blocks on a persistent heap (page faults ~34us each)
    from turingassembler_tpu.ops.hostmem import tune_host_malloc
    tune_host_malloc()
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    cache_marks = _preage_cache_atimes()

    from turingassembler_tpu import testing as tt

    k = int(os.environ.get("TA_BENCH_K", 45))
    read_len = 150
    batch = int(os.environ.get("TA_BENCH_BATCH", 8192))
    n_batches = int(os.environ.get("TA_BENCH_NBATCHES", 128))
    genome_size = int(os.environ.get("TA_BENCH_GENOME", 2_000_000))
    with_map = os.environ.get("TA_BENCH_MAP", "1") == "1"

    # the axon backend goes UNAVAILABLE for long stretches on this rig;
    # a crash records nothing, so fall back to an honestly-labeled CPU
    # measurement on a reduced workload
    cpu_fallback = False
    try:
        devs = jax.devices()
        log(f"devices: {devs}")
        if not any("tpu" in str(d).lower() for d in devs):
            cpu_fallback = True
    except RuntimeError as e:
        log(f"TPU backend unavailable ({e}); falling back to CPU")
        jax.config.update("jax_platforms", "cpu")
        cpu_fallback = True
        log(f"devices: {jax.devices()}")
    if cpu_fallback:
        n_batches = min(n_batches, 16)
        genome_size = min(genome_size, 500_000)
        with_map = False
    genome = tt.random_genome(genome_size, seed=0)
    n_reads = batch * n_batches
    # pad length +2 so shapes differ from test shapes (cache separation)
    reads, lengths = tt.sim_reads(
        genome, coverage=n_reads * read_len / genome_size,
        read_len=read_len, seed=1, pad_to=read_len + 2)
    reads, lengths = reads[:n_reads], lengths[:n_reads].astype(np.int32)
    log(f"reads: {reads.shape}")

    if cpu_fallback:
        from turingassembler_tpu.graph.build import build_graph_from_kedges
        from turingassembler_tpu.kmer import count as kc

        def run_once():
            t0 = time.time()
            kedges, counts = kc.count_kedges_from_reads(
                reads, lengths, k, batch_size=batch, engine="np")
            t1 = time.time()
            g = build_graph_from_kedges(kedges, counts, k)
            t2 = time.time()
            return t1 - t0, t2 - t1, len(kedges), (g, None)
    else:
        from turingassembler_tpu.graph.device_build import build_graph_on_device
        from turingassembler_tpu.kmer.megasort import count_reads_device

        def run_once():
            t0 = time.time()
            # keep the ship records device-resident: the map stage
            # consumes them so reads cross the tunnel ONCE per pipeline
            # (the count pass pays the full wire cost, measured here)
            uniq, counts, n, recs = count_reads_device(
                reads, lengths, k, return_chunks=True)
            t1 = time.time()
            g = build_graph_on_device(uniq, counts, n, k)
            t2 = time.time()
            return t1 - t0, t2 - t1, n, (g, recs)

    # warmup/compile pass: compiles every executable and faults in the
    # host heap working set once so the timed pass is steady-state
    t_start = time.time()
    _, _, _, (g_asm, recs_asm) = run_once()
    t_compile = time.time() - t_start
    log(f"compile+warmup: {t_compile:.1f}s")

    # tunnel weather probe (VERDICT r4 #9): this rig's host<->device
    # relay swings 4-450 MB/s between sessions, which dominates
    # round-over-round deltas; record the measured bandwidth WITH the
    # result so a regression reading is attributable without archaeology
    weather = {}
    if not cpu_fallback:
        try:
            probe = np.zeros(32 * 1024 * 1024, np.uint8)
            d = jax.device_put(probe); d.block_until_ready()   # warm path
            t0 = time.time()
            d = jax.device_put(probe); d.block_until_ready()
            h2d = probe.nbytes / (time.time() - t0) / 1e6
            np.asarray(d)     # warm the pull path (first pull compiles)
            # a fresh device array for the timed pull — re-pulling `d`
            # would read jax's cached host copy, not the wire
            d2 = jax.device_put(probe[::-1].copy()); d2.block_until_ready()
            t0 = time.time()
            np.asarray(d2)
            d2h = probe.nbytes / (time.time() - t0) / 1e6
            del d2
            weather = {"h2d_MBps": round(h2d, 1), "d2h_MBps": round(d2h, 1)}
            log(f"tunnel: h2d {h2d:.0f} MB/s, d2h {d2h:.0f} MB/s")
            del d
        except Exception as ex:
            log(f"tunnel probe failed: {ex}")

    # best of up to 5 timed passes: the host<->device tunnel on this rig
    # has multi-second jitter between otherwise-identical runs AND
    # minute-scale per-process program-load stalls on bad days — stop
    # early if the time budget is burning so a JSON line always lands
    budget = float(os.environ.get("TA_BENCH_BUDGET_S", 480))
    best = None
    count_passes, build_passes = [], []
    for i in range(5):
        t_count, t_build, n_uniq, (g, recs) = run_once()
        count_passes.append(round(t_count, 2))
        build_passes.append(round(t_build, 2))
        log(f"pass {i}: count {t_count:.2f}s + build {t_build:.2f}s"
            f"  ({n_uniq:,} unique (k+1)-mers, n_v={g.n_v}, n_e={g.n_e})")
        if best is None or t_count + t_build < best[0] + best[1]:
            best = (t_count, t_build)
            g_asm, recs_asm = g, recs
        if time.time() - t_start > budget:
            log(f"budget {budget:.0f}s exhausted after pass {i}")
            break
    t_count, t_build = best

    # stage 2: map the SAME reads against the assembled graph — vote +
    # on-device gapless verification, host DP only on remainder lanes
    # (the reference's read_mapper with asm_reg2aln rescoring,
    # src/barcode_builder.c:737-912)
    # ALWAYS attempt at least one map pass even when the compile/tunnel
    # weather burned the budget: dropping the stage silently changes the
    # headline metric's scope between rounds (the count+build sub-metric
    # stays comparable either way, but the wide metric should too)
    t_map = None
    map_passes = []
    if with_map:
        try:
            from turingassembler_tpu.mapper.minimizers import (
                EdgeMinimizerIndex, map_reads)
            t0 = time.time()
            idx = EdgeMinimizerIndex.build(g_asm)
            log(f"minimizer index: {len(idx.keys):,} keys over "
                f"{g_asm.n_e} edges in {time.time()-t0:.1f}s "
                f"(one-time per assembly; bwa_idx_build analogue)")
            # map from the count stage's device-resident ship records:
            # the reads paid the tunnel once, in the count timing above
            nw = int(recs_asm[0][1].shape[0])
            map_reads(idx, reads[:nw], lengths[:nw], graph=g_asm,
                      shipped=recs_asm[:1])
            for i in range(3):
                t0 = time.time()
                e, _, _ = map_reads(idx, reads, lengths, graph=g_asm,
                                    shipped=recs_asm, with_hits=False)
                dt = time.time() - t0
                map_passes.append(round(dt, 2))
                log(f"map pass {i}: {n_reads} reads in {dt:.2f}s = "
                    f"{n_reads/dt:,.0f} reads/s "
                    f"({(e >= 0).mean()*100:.1f}% mapped, DP-verified, "
                    f"device-resident reads)")
                if t_map is None or dt < t_map:
                    t_map = dt
                if time.time() - t_start > budget + 120:
                    break
        except Exception as ex:   # never let the map stage kill the JSON
            log(f"map stage failed: {ex}")
            t_map = None

    # the north-star sub-metric (BASELINE.json: "reads/s per chip, k-mer
    # count + graph build") rides in the SAME JSON line every round so it
    # is comparable round-over-round regardless of headline-metric scope
    # (VERDICT r3 #2)
    cb_value = n_reads / (t_count + t_build)
    cb_baseline = 250_000.0
    if t_map is not None:
        total = t_count + t_build + t_map
        value = n_reads / total
        baseline = 1.0 / (1.0 / 250_000.0 + 1.0 / 45_000.0)
        metric = ("reads/s (k45 count + level-0 DBG build + DP-verified "
                  "read->edge map, 150bp reads, 1 chip)")
        log(f"stage shares: count {t_count:.2f}s ({t_count/total*100:.0f}%) "
            f"build {t_build:.2f}s ({t_build/total*100:.0f}%) "
            f"map {t_map:.2f}s ({t_map/total*100:.0f}%)")
    else:
        total = t_count + t_build
        value = cb_value
        baseline = cb_baseline
        metric = "reads/s (k45 count + level-0 DBG build, 150bp reads, 1 chip)"
        if cpu_fallback:
            metric = ("reads/s (k45 count + level-0 DBG build, 150bp reads, "
                      "CPU FALLBACK - TPU backend unavailable)")
    # weather context rides in the same line (VERDICT r4 #9): measured
    # tunnel MB/s + full pass spreads + compile wall make a 0.93x
    # reading distinguishable from a real regression
    weather.update({
        "compile_warmup_s": round(t_compile, 1),
        "count_s": count_passes,
        "build_s": build_passes,
        "map_s": map_passes,
    })
    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(value / baseline, 3),
        "value_count_build": round(cb_value, 1),
        "vs_baseline_count_build": round(cb_value / cb_baseline, 3),
        "weather": weather,
    }))
    prune_jax_cache(cache_marks)


def _cache_dir() -> str:
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".jax_cache")


def _preage_cache_atimes():
    """Move every cache entry's atime behind its mtime so this run's
    cache READS are observable: under relatime the kernel bumps atime
    on read when stored atime <= mtime.  Returns {path: aged_atime}."""
    cache = _cache_dir()
    marks = {}
    if not os.path.isdir(cache):
        return marks
    for f in os.listdir(cache):
        p = os.path.join(cache, f)
        try:
            st = os.stat(p)
            aged = st.st_mtime - 2 * 86400
            os.utime(p, (aged, st.st_mtime))
            marks[p] = aged
        except OSError:
            pass
    return marks


def prune_jax_cache(marks):
    """Keep only cache entries this bench run READ (atime moved past
    the pre-aged mark) or WROTE (new file).  The repo-committed
    .jax_cache serves bench.py alone (the CLI uses ~/.cache), so the
    bench-hot set is exactly what must survive — experiment/scratch
    executables rotate out instead of accreting ~150 MB/round
    (VERDICT r2 weak #7 / ADVICE r2)."""
    cache = _cache_dir()
    if not os.path.isdir(cache):
        return
    kept = pruned = 0
    for f in os.listdir(cache):
        p = os.path.join(cache, f)
        try:
            st = os.stat(p)
        except OSError:
            continue
        if p not in marks:              # written during this run
            kept += 1
            continue
        if st.st_atime > marks[p] + 1:  # read during this run
            kept += 1
            continue
        try:
            sz = st.st_size
            os.unlink(p)
            pruned += 1
            log(f"pruned unused cache entry {f} ({sz/1e6:.1f} MB)")
        except OSError:
            pass
    log(f"cache prune: kept {kept}, pruned {pruned}")


if __name__ == "__main__":
    main()
