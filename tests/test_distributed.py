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


if __name__ == "__main__" and len(sys.argv) >= 5 and sys.argv[1] == "--worker":
    sys.path.insert(0, ROOT)
    _worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
