"""Mesh-parallel read->edge mapping must bit-equal the single-device
mapper on the 8-device virtual CPU mesh."""

import jax
import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.graph.from_contigs import graph_from_contigs
from turingassembler_tpu.mapper.minimizers import EdgeMinimizerIndex, map_reads
from turingassembler_tpu.parallel.mesh import make_mesh
from turingassembler_tpu.parallel.sharded_map import map_reads_sharded


def _fixture(seed=21):
    genome = tt.random_genome(12000, seed=seed)
    contigs = [tt.codes_to_str(genome[:5000]),
               tt.codes_to_str(genome[5000:9000]),
               tt.codes_to_str(genome[9000:])]
    g = graph_from_contigs(contigs, 45)
    idx = EdgeMinimizerIndex.build(g)
    reads, lengths = tt.sim_reads(genome, coverage=6.0, read_len=100,
                                  error_rate=0.01, seed=seed + 1)
    return g, idx, reads, lengths


@pytest.mark.parametrize("n_devices", [2, 8])
def test_sharded_map_matches_single(n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    _, idx, reads, lengths = _fixture()
    mesh = make_mesh(n_devices)
    e1, h1, s1 = map_reads(idx, reads, lengths, batch_size=512)
    eD, hD, sD = map_reads_sharded(idx, reads, lengths, mesh, batch_size=512)
    np.testing.assert_array_equal(e1, eD)
    np.testing.assert_array_equal(h1, hD)
    np.testing.assert_array_equal(s1, sD)
    assert (e1 >= 0).sum() > len(reads) * 0.5


def test_sharded_map_uneven_tail():
    """N not a multiple of the (rounded) batch is padded correctly."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    _, idx, reads, lengths = _fixture(seed=33)
    n = len(reads) - 3
    mesh = make_mesh(8)
    e1, _, s1 = map_reads(idx, reads[:n], lengths[:n], batch_size=512)
    eD, _, sD = map_reads_sharded(idx, reads[:n], lengths[:n], mesh,
                                  batch_size=500)  # rounds to 504
    np.testing.assert_array_equal(e1, eD)
    np.testing.assert_array_equal(s1, sD)
