#!/usr/bin/env python
"""Real-library-scale spill exercise (VERDICT r4 #7).

The reference's out-of-core machinery is its external barcode sort
(per-thread memory budget + spill runs + k-way merge,
/root/reference/src/sort_read.c:81-288,567-658) and KMC's -sm counting
budget (src/main.c:234-236).  This repo's twins — the native external
sorter (native/sort_read.cpp, TA_SORT_MEM_BYTES) and the megasort
LSM spill (kmer/megasort.py, TA_SORT_HOST_MB) — were byte-identity
tested at toy sizes; this tool drives them at real-library scale
(default 10M pairs = 2.4 Gbp, the order of the reference's E. coli
TELL-Seq library) under a constrained budget, verifies the spilled
archive against the simulation's own barcode assignment on a sample,
and records reads/s + peak RSS.

Usage:
    python tools/spill_scale.py --pairs 10000000 --out /tmp/spill \
        --report SPILL_r05.json
"""

import argparse
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

READ_LEN = 120
CHUNK_PAIRS = 500_000


def write_library(out_dir: str, genome, n_pairs: int, seed: int):
    """Chunked simulation + FASTQ write; returns (paths, bcs array)."""
    from turingassembler_tpu import testing as tt
    from turingassembler_tpu.io.fastq import encode_barcode
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    qual = "I" * READ_LEN
    qual16 = "I" * 16
    paths = [os.path.join(out_dir, n) for n in ("R1.fq", "R2.fq", "I1.fq")]
    os.makedirs(out_dir, exist_ok=True)
    all_bcs = []
    ridx = 0
    bc_base = 0
    mols_per_chunk = CHUNK_PAIRS // 20
    with open(paths[0], "w") as f1, open(paths[1], "w") as f2, \
            open(paths[2], "w") as fI:
        while ridx < n_pairs:
            want = min(CHUNK_PAIRS, n_pairs - ridx)
            r1, r2, l1, l2, bcs = tt.sim_barcoded_pairs_fast(
                genome, molecule_len=20_000,
                n_molecules=-(-want // 20), reads_per_molecule=20,
                read_len=READ_LEN, insert=300,
                seed=seed + ridx, error_rate=0.002)
            r1, r2, bcs = r1[:want], r2[:want], bcs[:want] + bc_base
            bc_base += mols_per_chunk + 10
            all_bcs.append(bcs)
            s1 = ACGT[r1]
            s2 = ACGT[r2]
            buf1, buf2, bufI = [], [], []
            bc_seqs = {}
            for j in range(want):
                i = ridx + j
                bc = int(bcs[j])
                bseq = bc_seqs.get(bc)
                if bseq is None:
                    bseq = encode_barcode(bc + 1, 16).decode()
                    bc_seqs[bc] = bseq
                buf1.append(f"@r{i}\n{s1[j].tobytes().decode()}\n+\n{qual}\n")
                buf2.append(f"@r{i}\n{s2[j].tobytes().decode()}\n+\n{qual}\n")
                bufI.append(f"@r{i}\n{bseq}\n+\n{qual16}\n")
            f1.write("".join(buf1))
            f2.write("".join(buf2))
            fI.write("".join(bufI))
            ridx += want
            print(f"  simulated {ridx:,}/{n_pairs:,} pairs", file=sys.stderr)
    return paths, np.concatenate(all_bcs)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=10_000_000)
    ap.add_argument("--out", default="/tmp/spill_scale")
    ap.add_argument("--report", default="SPILL_report.json")
    ap.add_argument("--sort-budget-mb", type=int, default=256,
                    help="external-sort budget; 10M pairs ~ 5.6 GB of "
                         "records, so 256 MB forces ~20+ spill runs")
    ap.add_argument("--count-budget-mb", type=int, default=512,
                    help="megasort host-table budget for the count A/B")
    ap.add_argument("--count-pairs", type=int, default=1_000_000,
                    help="subset for the spilled==in-memory count A/B")
    ap.add_argument("--seed", type=int, default=21)
    ap.add_argument("--keep-reads", action="store_true")
    args = ap.parse_args(argv)

    # this main() is driven in-process by the suite: restore every env
    # knob it touches so later tests keep their own budgets
    _env_keys = ("TA_SORT_MEM_BYTES", "TA_SORT_HOST_MB", "TA_SPILL_DIR")
    _env_saved = {k: os.environ.get(k) for k in _env_keys}
    try:
        return _run(args)
    finally:
        for k, v in _env_saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _run(args):

    from turingassembler_tpu import testing as tt
    from turingassembler_tpu.barcode.sort_read import (
        ReadPath, sort_reads, load_barcode_index, fetch_reads_by_barcodes,
        parse_fastq_blob, verify_read_archive)
    from turingassembler_tpu.config import Config, LIB_TYPE_UST

    genome = tt.random_genome(5_000_000, seed=args.seed)
    t0 = time.time()
    bcs_path = os.path.join(args.out, "truth_bcs.npy")
    if args.keep_reads and os.path.exists(bcs_path):
        paths = [os.path.join(args.out, n) for n in ("R1.fq", "R2.fq", "I1.fq")]
        bcs = np.load(bcs_path)
    else:
        paths, bcs = write_library(args.out, genome, args.pairs,
                                   args.seed + 1)
        np.save(bcs_path, bcs)
    sim_s = time.time() - t0
    n_pairs = len(bcs)
    print(f"library: {n_pairs:,} pairs in {sim_s:.0f}s", file=sys.stderr)

    # --- external barcode sort under a constrained budget -------------
    out_dir = os.path.join(args.out, "sorted")
    os.environ["TA_SORT_MEM_BYTES"] = str(args.sort_budget_mb << 20)
    cfg = Config(files_1=[paths[0]], files_2=[paths[1]], files_I=[paths[2]],
                 lib_type=LIB_TYPE_UST, out_dir=out_dir)
    t1 = time.time()
    rpath = sort_reads(cfg)
    sort_s = time.time() - t1
    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(f"sort_read: {n_pairs:,} pairs in {sort_s:.0f}s = "
          f"{n_pairs/sort_s:,.0f} pairs/s under a "
          f"{args.sort_budget_mb} MB budget (peak RSS {peak_rss_mb:.0f} MB)",
          file=sys.stderr)

    # --- verify the spilled archive -----------------------------------
    # (a) structural integrity on a barcode sample (reference
    #     test_same_barcode, src/barcode_resolve2.c:1554-1588)
    index = load_barcode_index(rpath.idx_path)
    n_checked = verify_read_archive(rpath, index=index, max_barcodes=512)
    # (b) content: for sampled barcodes, the read-id set fetched through
    #     the index must equal the simulation's own assignment
    rng = np.random.default_rng(7)
    sample = rng.choice(np.unique(bcs), size=32, replace=False)
    truth = {}
    for b in sample:
        truth[int(b)] = set(np.flatnonzero(bcs == b).tolist())
    # the I1 index read encodes sim barcode b as b+1 (0 is the
    # no-barcode sentinel), so the archive keys are b+1
    blob1, _ = fetch_reads_by_barcodes(rpath, index,
                                       [b + 1 for b in sorted(truth)])
    names, seqs, _, _ = parse_fastq_blob(blob1)
    got_ids = {int(n.decode().split()[0][1:]) for n in names}
    want_ids = set().union(*truth.values())
    assert got_ids == want_ids, (
        f"archive sample mismatch: {len(got_ids)} fetched vs "
        f"{len(want_ids)} simulated")
    print(f"archive verified: {n_checked} barcodes structurally, "
          f"{len(sample)} barcodes content-exact ({len(want_ids)} reads)",
          file=sys.stderr)

    # --- count spill A/B on a subset ----------------------------------
    from turingassembler_tpu.io.fastq import NT4
    sub = args.count_pairs
    reads = np.full((2 * sub, READ_LEN), 255, np.uint8)
    with open(paths[0]) as f1, open(paths[1]) as f2:
        for which, fh in enumerate((f1, f2)):
            for i in range(sub):
                fh.readline()
                s = fh.readline().strip().encode()
                fh.readline(); fh.readline()
                reads[which * sub + i, : len(s)] = NT4[
                    np.frombuffer(s, np.uint8)]
    lengths = np.full(2 * sub, READ_LEN, np.int32)

    from turingassembler_tpu.kmer.megasort import count_kedges_megasort

    def batches():
        for lo in range(0, len(reads), 8192):
            yield reads[lo : lo + 8192], lengths[lo : lo + 8192]

    t2 = time.time()
    os.environ["TA_SORT_HOST_MB"] = "100000"
    k_mem, c_mem = count_kedges_megasort(batches(), 45)
    mem_s = time.time() - t2
    t3 = time.time()
    os.environ["TA_SORT_HOST_MB"] = str(args.count_budget_mb)
    os.environ["TA_SPILL_DIR"] = os.path.join(args.out, "count_spill")
    k_sp, c_sp = count_kedges_megasort(batches(), 45)
    spill_s = time.time() - t3
    os.environ["TA_SORT_HOST_MB"] = "100000"
    assert (k_mem == k_sp).all() and (c_mem == c_sp).all(), \
        "spilled count != in-memory count"
    print(f"count A/B on {2*sub:,} reads: in-memory {mem_s:.0f}s == "
          f"spilled {spill_s:.0f}s under {args.count_budget_mb} MB "
          f"({len(k_mem):,} unique)", file=sys.stderr)

    report = {
        "round": "r05",
        "n_pairs": n_pairs,
        "read_len": READ_LEN,
        "sort": {
            "budget_mb": args.sort_budget_mb,
            "wall_s": round(sort_s, 1),
            "pairs_per_s": round(n_pairs / sort_s, 1),
            "peak_rss_mb": round(peak_rss_mb, 1),
            "verified_barcodes_structural": n_checked,
            "verified_barcodes_content": len(sample),
        },
        "count_ab": {
            "reads": 2 * sub,
            "budget_mb": args.count_budget_mb,
            "in_memory_s": round(mem_s, 1),
            "spilled_s": round(spill_s, 1),
            "unique_kedges": len(k_mem),
            "equal": True,
        },
        "sim_s": round(sim_s, 1),
    }
    with open(args.report, "w") as f:
        json.dump(report, f, indent=2)
        f.write("\n")
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
