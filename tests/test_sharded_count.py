"""Sharded k-mer counting on the 8-device virtual CPU mesh: results must
exactly equal the single-device counter."""

import jax
import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.kmer.count import count_kedges_from_reads
from turingassembler_tpu.parallel.mesh import make_mesh
from turingassembler_tpu.parallel.sharded_count import sharded_count_to_host


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_matches_single(n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    genome = tt.random_genome(3000, seed=5)
    reads, lengths = tt.sim_reads(genome, coverage=30.0, read_len=100, seed=8)
    # pad read count to a multiple of devices
    n = (len(reads) // n_devices) * n_devices
    reads, lengths = reads[:n], lengths[:n]
    k = 31

    mesh = make_mesh(n_devices)
    kedges_s, counts_s = sharded_count_to_host(reads, lengths, mesh, k)
    kedges_1, counts_1 = count_kedges_from_reads(reads, lengths, k, batch_size=100000)
    np.testing.assert_array_equal(kedges_s, kedges_1)
    np.testing.assert_array_equal(counts_s, counts_1)


def test_sharded_overflow_detected():
    mesh = make_mesh(2)
    genome = tt.random_genome(500, seed=1)
    reads, lengths = tt.sim_reads(genome, coverage=10.0, read_len=100, seed=2)
    n = (len(reads) // 2) * 2
    with pytest.raises(RuntimeError, match="dropped"):
        sharded_count_to_host(reads[:n], lengths[:n], mesh, 31, cap_per_dest=8)


def test_sharded_hash_counter_matches_single():
    from turingassembler_tpu.parallel.sharded_count import ShardedHashCounter
    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    genome = tt.random_genome(3000, seed=15)
    reads, lengths = tt.sim_reads(genome, coverage=25.0, read_len=100, seed=3)
    n = (len(reads) // 4) * 4
    reads, lengths = reads[:n], lengths[:n]
    k = 31
    mesh = make_mesh(4)
    ctr = ShardedHashCounter(mesh, k, capacity_log2=16, cap_per_dest=16384)
    half = (n // 2) // 4 * 4
    ctr.insert_batch(reads[:half], lengths[:half])
    ctr.insert_batch(reads[half:half + (n - half) // 4 * 4],
                     lengths[half:half + (n - half) // 4 * 4])
    reads = reads[:half + (n - half) // 4 * 4]
    lengths = lengths[:len(reads)]
    ks, cs = ctr.finalize()
    k1, c1 = count_kedges_from_reads(reads, lengths, k, engine="np",
                                     batch_size=100000)
    np.testing.assert_array_equal(ks, k1)
    np.testing.assert_array_equal(cs, c1)
