"""Two-process jax.distributed exercise of the multi-host counting path.

The reference is single-host (SURVEY.md §5.8); our scale-out design is
jax.distributed + a global mesh + the all_to_all k-mer shuffle
(parallel/sharded_count.py).  This test actually RUNS two OS processes
(2 CPU devices each -> a 4-device global mesh over Gloo collectives):
each process contributes its local read shard via
`global_read_batch` (make_array_from_process_local_data), one
`sharded_count_step` routes k-mers across process boundaries, and the
merged per-shard tables must equal the single-process numpy count.
"""

import os
import socket
import subprocess
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_PROC = 2
DEV_PER_PROC = 2
K = 21
READ_LEN = 64


def _reads():
    sys.path.insert(0, ROOT)
    from turingassembler_tpu import testing as tt
    genome = tt.random_genome(3000, seed=7)
    reads, lens = tt.sim_reads(genome, coverage=8, read_len=READ_LEN, seed=8)
    D = N_PROC * DEV_PER_PROC
    B = (len(reads) // (D * N_PROC)) * (D * N_PROC)
    return reads[:B], lens[:B].astype(np.int32)


def _worker(pid: int, port: int, tmp: str) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from turingassembler_tpu.parallel.distributed import (
        global_read_batch, init_distributed)
    init_distributed(coordinator=f"localhost:{port}",
                     num_processes=N_PROC, process_id=pid)
    assert jax.process_count() == N_PROC
    assert jax.device_count() == N_PROC * DEV_PER_PROC
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh

    from turingassembler_tpu.parallel.sharded_count import sharded_count_step

    reads, lens = _reads()
    B = len(reads)
    lo, hi = pid * (B // N_PROC), (pid + 1) * (B // N_PROC)
    mesh = Mesh(np.array(jax.devices()), ("shard",))
    gb, gl = global_read_batch(reads[lo:hi], lens[lo:hi], mesh)
    assert gb.shape == (B, READ_LEN)
    D = N_PROC * DEV_PER_PROC
    cap = int(2.5 * (B // D) * (READ_LEN - K) / D) + 64
    uniq, counts, n_unique, dropped, total = sharded_count_step(
        gb, gl, mesh=mesh, k=K, cap_per_dest=cap)
    assert int(dropped) == 0
    per_dev = uniq.shape[0] // D
    # dump this process's addressable shard tables
    for ushard, cshard, nshard in zip(uniq.addressable_shards,
                                      counts.addressable_shards,
                                      n_unique.addressable_shards):
        d = ushard.index[0].start // per_dev
        n = int(np.asarray(nshard.data)[0])
        np.savez(os.path.join(tmp, f"shard_{d}.npz"),
                 uniq=np.asarray(ushard.data)[:n],
                 counts=np.asarray(cshard.data)[:n])
    multihost_utils.sync_global_devices("shards_dumped")
    if pid == 0:
        from turingassembler_tpu.kmer.count import count_kedges_from_reads
        from turingassembler_tpu.ops.sortops import np_merge_count_runs
        runs = []
        for d in range(D):
            z = np.load(os.path.join(tmp, f"shard_{d}.npz"))
            runs.append((z["uniq"], z["counts"].astype(np.int64)))
        kedges, cnts = np_merge_count_runs(runs)
        exp_k, exp_c = count_kedges_from_reads(reads, lens, K, engine="np")
        assert np.array_equal(kedges, exp_k), "kedge tables differ"
        assert np.array_equal(cnts, exp_c), "count tables differ"

        # END-TO-END build_0 (VERDICT r2 #4): the level-0 graph built
        # from the cross-process table must equal the single-process
        # build — per-process FASTQ shards -> all_to_all k-mer shuffle
        # -> merged table -> DBG (reference per-thread KMC prefix
        # ranges, src/KMC_reader.c:287-310, scaled out to processes)
        from turingassembler_tpu.graph.build import build_graph_from_kedges
        g_dist = build_graph_from_kedges(kedges, cnts, K)
        g_single = build_graph_from_kedges(exp_k, exp_c, K)

        def key(g):
            return sorted(
                (g.get_seq(int(e)).tobytes(), int(g.edge_count[e]))
                for e in np.flatnonzero(g.alive_mask()))
        assert key(g_dist) == key(g_single), "level-0 graphs differ"
        assert g_dist.n_e == g_single.n_e and g_dist.n_v == g_single.n_v

        # DEVICE build from the cross-process table (VERDICT r3 #5): the
        # production level-0 builder (graph/device_build.py) consumes
        # the sharded count output — the 2-process e2e must exercise it,
        # not just the numpy oracle (reference src/kmer_build.c:421-542)
        from turingassembler_tpu.graph.device_build import (
            build_graph_on_device)
        n = len(kedges)
        capK = 1 << max(int(n - 1).bit_length(), 10)
        pad = np.full((capK - n, kedges.shape[1]), 0xFFFFFFFF, np.uint32)
        uniq_d = jnp.asarray(np.concatenate([kedges, pad]))
        cnts_d = jnp.asarray(np.concatenate(
            [cnts.astype(np.int32), np.zeros(capK - n, np.int32)]))
        g_dev = build_graph_on_device(uniq_d, cnts_d, n, K)
        assert key(g_dev) == key(g_single), "device-built graph differs"
        assert g_dev.n_e == g_single.n_e and g_dev.n_v == g_single.n_v
        with open(os.path.join(tmp, "OK"), "w") as f:
            f.write(f"{len(kedges)} {g_dist.n_e}\n")


def test_two_process_sharded_count(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": f"--xla_force_host_platform_device_count={DEV_PER_PROC}"}
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i),
         str(port), str(tmp_path)],
        env=env, cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(N_PROC)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i]}"
    ok = os.path.join(tmp_path, "OK")
    assert os.path.exists(ok), f"no OK marker; worker 0 said:\n{outs[0]}"
    assert int(open(ok).read().split()[0]) > 100




def _aux_worker(pid: int, port: int, tmp: str) -> None:
    """Distributed aux-info (VERDICT r3 #4): each process contributes its
    local read-pair shard to ONE global-mesh verified map; barcode attach
    tables and rp candidate tallies reduce per process and key-sum merge
    on process 0, where they must equal the single-process tables."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from turingassembler_tpu.parallel.distributed import init_distributed
    init_distributed(coordinator=f"localhost:{port}",
                     num_processes=N_PROC, process_id=pid)
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh

    from turingassembler_tpu import testing as tt
    from turingassembler_tpu.graph.from_contigs import graph_from_contigs
    from turingassembler_tpu.mapper.minimizers import EdgeMinimizerIndex
    from turingassembler_tpu.parallel.sharded_aux import aux_tables_local

    rng = np.random.default_rng(17)
    genome = rng.integers(0, 4, 8000).astype(np.uint8)
    ACGT = np.frombuffer(b"ACGT", np.uint8)
    contigs = [ACGT[genome[:4500]].tobytes().decode(),
               ACGT[genome[4500:]].tobytes().decode()]
    g = graph_from_contigs(contigs, 45)
    idx = EdgeMinimizerIndex.build(g)

    # simulated read pairs with barcodes: FR pairs, frag ~280
    n_pairs = 256
    frag = 280
    rl = 100
    starts = rng.integers(0, len(genome) - frag, n_pairs)
    b1 = np.stack([genome[s : s + rl] for s in starts]).astype(np.uint8)
    b2r = np.stack([genome[s + frag - rl : s + frag]
                    for s in starts]).astype(np.uint8)
    b2 = (3 - b2r)[:, ::-1].astype(np.uint8)          # rc mate
    l1 = np.full(n_pairs, rl, np.int32)
    l2 = np.full(n_pairs, rl, np.int32)
    bcs = (starts // 40).astype(np.uint64)            # molecule-ish tags

    lo, hi = pid * (n_pairs // N_PROC), (pid + 1) * (n_pairs // N_PROC)
    mesh = Mesh(np.array(jax.devices()), ("shard",))
    table, cands = aux_tables_local(
        g, idx, b1[lo:hi], l1[lo:hi], b2[lo:hi], l2[lo:hi], bcs[lo:hi],
        mesh=mesh)
    np.savez(os.path.join(tmp, f"aux_{pid}.npz"),
             s=table[0], e=table[1], b=table[2], c=table[3],
             ck=np.array([[a, b_] for (a, b_) in cands.keys()],
                         np.int64).reshape(-1, 2),
             cv=np.array(list(cands.values()), np.int64))
    multihost_utils.sync_global_devices("aux_dumped")
    if pid == 0:
        from turingassembler_tpu.barcode.builder import merge_attach_tables
        from turingassembler_tpu.parallel.sharded_aux import apply_aux_tables
        tables, cands_all = [], {}
        for d in range(N_PROC):
            z = np.load(os.path.join(tmp, f"aux_{d}.npz"))
            tables.append((z["s"], z["e"], z["b"], z["c"]))
            for (a, b_), v in zip(z["ck"], z["cv"]):
                cands_all[(int(a), int(b_))] = (
                    cands_all.get((int(a), int(b_)), 0) + int(v))
        merged = merge_attach_tables(tables)
        g_dist = g.clone()
        apply_aux_tables(g_dist, merged, cands_all)

        # single-process reference over the full arrays, no mesh
        t1, c1 = aux_tables_local(g, idx, b1, l1, b2, l2, bcs, mesh=None)
        g_ref = g.clone()
        apply_aux_tables(g_ref, t1, c1)

        assert g_dist.barcodes == g_ref.barcodes
        assert g_dist.barcodes_scaf == g_ref.barcodes_scaf
        assert g_dist.barcodes_cov == g_ref.barcodes_cov
        assert g_dist.candidates == g_ref.candidates
        n_attached = sum(len(t[2]) for t in [merged])
        assert any(len(lvl) for sets in g_dist.barcodes for lvl in sets), \
            "no barcodes attached"
        with open(os.path.join(tmp, "AUX_OK"), "w") as f:
            f.write(f"{n_attached} {len(cands_all)}\n")


def test_two_process_aux_info(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": f"--xla_force_host_platform_device_count={DEV_PER_PROC}"}
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--aux-worker", str(i),
         str(port), str(tmp_path)],
        env=env, cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(N_PROC)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"aux worker {i} failed:\n{outs[i]}"
    ok = os.path.join(tmp_path, "AUX_OK")
    assert os.path.exists(ok), f"no AUX_OK; worker 0 said:\n{outs[0]}"
    n_attached, n_cand = map(int, open(ok).read().split())
    assert n_attached > 100 and n_cand > 0


if __name__ == "__main__" and len(sys.argv) >= 5 and sys.argv[1] == "--worker":
    sys.path.insert(0, ROOT)
    _worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

if __name__ == "__main__" and len(sys.argv) >= 5 and sys.argv[1] == "--aux-worker":
    sys.path.insert(0, ROOT)
    _aux_worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
