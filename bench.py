"""Headline benchmark: reads/s through k-mer count + level-0 DBG build.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "reads/s", "vs_baseline": N}

Baseline: the reference publishes no throughput numbers (BASELINE.md) and
its KMC binary is stripped from the repo, so the 4-thread C baseline is
estimated at 250,000 reads/s (KMC2-class counters sustain ~1-4 M
(k+1)-mers/s/thread on 150 bp reads incl. graph build overhead;
250 k reads/s * ~105 kmers/read / 4 threads ≈ 6.6 M kmers/s/thread is a
generous ceiling for the C pipeline).  vs_baseline = value / 250000.

Workload: synthetic 2 Mbp genome, 150 bp error-free reads at ~38x,
k = 45 (the reference's default k0, src/main.c:141), full path:
host batch -> device canonical (k+1)-mer extraction -> device sort +
run-length count -> host merge of per-batch runs -> level-0 unitig graph.
"""

import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # hash-table sizing tuned for this workload's ~2M unique (k+1)-mers;
    # the relay D2H runs ~10 MB/s so the pull volume matters
    os.environ.setdefault("TA_HASH_CAP_LOG2", "25")
    os.environ.setdefault("TA_HASH_OUT_LOG2", "22")
    # this VM's minor page faults cost ~34us/page; keep large blocks on a
    # persistent heap so the host-side build faults its pages exactly once
    from turingassembler_tpu.ops.hostmem import tune_host_malloc
    tune_host_malloc()
    import jax

    # axon remote-compile costs minutes per shape; persist compiled
    # executables so repeated bench runs (and pipeline runs) skip it
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from turingassembler_tpu import testing as tt
    from turingassembler_tpu.graph.build import build_graph_from_kedges
    from turingassembler_tpu.kmer import count as kc

    k = int(os.environ.get("TA_BENCH_K", 45))
    read_len = 150
    # tile = batch*(read_len-k) rows; keep lax.sort modest (876k rows)
    batch = int(os.environ.get("TA_BENCH_BATCH", 8192))
    n_batches = int(os.environ.get("TA_BENCH_NBATCHES", 64))
    genome_size = int(os.environ.get("TA_BENCH_GENOME", 2_000_000))

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
    genome = tt.random_genome(genome_size, seed=0)
    n_reads = batch * n_batches
    # pad length +2 so shapes differ from test shapes (cache separation)
    reads, lengths = tt.sim_reads(
        genome, coverage=n_reads * read_len / genome_size,
        read_len=read_len, seed=1, pad_to=read_len + 2)
    reads, lengths = reads[:n_reads], lengths[:n_reads]
    log(f"reads: {reads.shape}")

    # warmup/compile: one full pass compiles the tile sort + every LSM
    # merge level so the timed pass measures steady-state throughput; the
    # warmup build additionally faults in the host heap working set once
    # (page faults on this VM are ~34us each and would otherwise land in
    # the timed region)
    t0 = time.time()
    wk, wc = kc.count_kedges_from_reads(reads, lengths, k, batch_size=batch)
    build_graph_from_kedges(wk, wc, k)
    log(f"compile+warmup: {time.time()-t0:.1f}s")

    t0 = time.time()
    kedges, counts = kc.count_kedges_from_reads(reads, lengths, k, batch_size=batch)
    t_count = time.time() - t0
    log(f"count: {t_count:.2f}s  ({len(kedges):,} unique (k+1)-mers)")

    t0 = time.time()
    g = build_graph_from_kedges(kedges, counts, k)
    t_build = time.time() - t0
    log(f"graph build: {t_build:.2f}s  (n_v={g.n_v}, n_e={g.n_e})")

    total = t_count + t_build
    value = n_reads / total
    baseline = 250_000.0
    metric = "reads/s (k45 count + level-0 DBG build, 150bp reads, 1 chip)"
    if cpu_fallback:
        metric = ("reads/s (k45 count + level-0 DBG build, 150bp reads, "
                  "CPU FALLBACK - TPU backend unavailable)")
    print(json.dumps({
        "metric": metric,
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(value / baseline, 3),
    }))


if __name__ == "__main__":
    main()
