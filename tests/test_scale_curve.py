"""Virtual-device scaling curve for the sharded count (VERDICT r3 #3).

BASELINE.json's scaling target (>=80% efficiency at 2 hosts) is
unmeasurable on this one-chip rig; the recorded, asserted stand-in is
the D=1/2/4 virtual CPU device curve of `sharded_count_step` — the same
program that shards the sort AND the per-host ingest on real hardware
(reference per-thread KMC prefix ranges, src/KMC_reader.c:287-310).
Round-3 measurement: 11.6k -> 22.8k -> 44.0k reads/s at D=1/2/4 (D=8
flat: host cores exhausted, the expected ceiling for VIRTUAL devices
sharing one CPU).

Runs in a subprocess so the 4-device XLA flag doesn't fight the
8-device conftest mesh.
"""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _curve_worker() -> None:
    import time

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from jax.sharding import Mesh

    from turingassembler_tpu import testing as tt
    from turingassembler_tpu.parallel.sharded_count import (
        device_put_sharded_batch, sharded_count_step)

    k = 31
    read_len = 100
    genome = tt.random_genome(200_000, seed=3)
    reads, lens = tt.sim_reads(genome, coverage=24, read_len=read_len,
                               seed=4)
    B = (len(reads) // 4) * 4
    reads, lens = reads[:B], lens[:B].astype(np.int32)

    out = {}
    for D in (1, 2, 4):
        mesh = Mesh(np.array(jax.devices()[:D]), ("shard",))
        cap = int(2.5 * (B // D) * (read_len - k) / D) + 64
        db, dl = device_put_sharded_batch(reads, lens, mesh)
        # warm the executable
        r = sharded_count_step(db, dl, mesh=mesh, k=k, cap_per_dest=cap)
        jax.block_until_ready(r[:2])
        assert int(r[3]) == 0
        best = None
        for _ in range(4):
            t0 = time.time()
            r = sharded_count_step(db, dl, mesh=mesh, k=k, cap_per_dest=cap)
            n_u = int(np.asarray(r[2]).sum())   # gate on a host pull
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[D] = {"s": best, "reads_per_s": B / best, "n_unique": n_u}
    print("CURVE " + json.dumps(out))


def test_sharded_count_scaling_curve():
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4"}
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--curve"],
        env=env, cwd=ROOT, capture_output=True, text=True, timeout=600)
    assert p.returncode == 0, p.stdout + p.stderr
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("CURVE ")]
    assert line, p.stdout
    curve = {int(k): v for k, v in json.loads(line[0][6:]).items()}
    t1, t2, t4 = curve[1]["s"], curve[2]["s"], curve[4]["s"]
    eff2 = t1 / (2 * t2)
    eff4 = t1 / (4 * t4)
    print(f"\nscaling curve: D=1 {curve[1]['reads_per_s']:,.0f} r/s, "
          f"D=2 {curve[2]['reads_per_s']:,.0f} (eff {eff2:.2f}), "
          f"D=4 {curve[4]['reads_per_s']:,.0f} (eff {eff4:.2f})")
    # the measurable stand-in for BASELINE.json's >=80%-at-2-hosts target
    assert eff2 >= 0.8, (t1, t2)
    # sanity: all three device counts agree on the k-mer table size
    assert curve[1]["n_unique"] == curve[2]["n_unique"] == curve[4]["n_unique"]


if __name__ == "__main__" and "--curve" in sys.argv:
    sys.path.insert(0, ROOT)
    _curve_worker()
