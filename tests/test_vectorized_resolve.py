"""Vectorized mask->tombstone resolve passes vs the per-edge Python
oracles (resolve/basic.py), plus metagenome-scale readiness."""

import time

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.graph.build import build_graph_from_kedges
from turingassembler_tpu.graph.condense import asm_condense
from turingassembler_tpu.graph.mutable import MutableGraph
from turingassembler_tpu.kmer.count import count_kedges_from_reads
from turingassembler_tpu.resolve import basic
from turingassembler_tpu.resolve import vectorized as V
from turingassembler_tpu.resolve.driver import resolve_graph_operation


def _error_graph(genome_bp, seed, coverage=30.0, error_rate=0.01, k=31):
    genome = tt.random_genome(genome_bp, seed=seed)
    reads, lengths = tt.sim_reads(genome, coverage=coverage, read_len=100,
                                  error_rate=error_rate, seed=seed + 1)
    ke, c = count_kedges_from_reads(reads, lengths, k, engine="np",
                                    batch_size=100000)
    return build_graph_from_kedges(ke, c, k)


def _py_fixpoint(g, fn):
    """Run a python pass to its own fixpoint on a MutableGraph copy."""
    mg = MutableGraph.from_asm(g)
    total = 0
    while True:
        c = fn(mg)
        total += c
        if c == 0:
            break
    return mg.to_asm(), total


def _alive_key(g):
    """Canonical live-edge fingerprint: sorted (seq bytes, count)."""
    out = []
    for e in np.flatnonzero(g.alive_mask()):
        out.append((g.get_seq(int(e)).tobytes(), int(g.edge_count[e])))
    return sorted(out)


@pytest.mark.parametrize("seed", [3, 11, 27])
@pytest.mark.parametrize("passname", ["tips", "topo", "chimeric", "bubble"])
def test_pass_equivalence(passname, seed):
    g = _error_graph(20000, seed)
    py_fn = {"tips": basic.remove_tips, "topo": basic.remove_tips_topo,
             "chimeric": basic.remove_chimeric,
             "bubble": basic.resolve_simple_bubble}[passname]
    vec_fn = {"tips": V.remove_tips, "topo": V.remove_tips_topo,
              "chimeric": V.remove_chimeric,
              "bubble": V.resolve_simple_bubble}[passname]
    g_py, n_py = _py_fixpoint(g, py_fn)
    g_vec = g.clone()
    n_vec = vec_fn(g_vec)
    while passname != "bubble":
        more = vec_fn(g_vec)   # already fixpoint internally; must be 0
        n_vec += more
        break
    assert n_py == n_vec, (passname, n_py, n_vec)
    assert _alive_key(g_py) == _alive_key(g_vec)


@pytest.mark.parametrize("seed", [5, 19])
def test_driver_equivalence(seed, monkeypatch):
    """Full resolve with the vectorized prepass vs pure python: same
    final contig multiset."""
    from turingassembler_tpu.resolve import driver
    g = _error_graph(15000, seed)
    assert g.n_e > 100
    monkeypatch.setattr(driver, "VEC_MIN_EDGES", 10)
    r_vec = resolve_graph_operation(g.clone())
    monkeypatch.setattr(driver, "VEC_MIN_EDGES", 1 << 60)
    r_py = resolve_graph_operation(g.clone())
    assert _alive_key(r_vec) == _alive_key(r_py)


@pytest.mark.slow
def test_scale_100k_edges():
    """Metagenome-scale readiness: a >=100k-edge error-laden graph
    resolves through the vectorized prepass much faster than the python
    oracle pass, with the same pass outcome."""
    g = _error_graph(400000, seed=7, coverage=25.0, error_rate=0.01)
    n0 = int(g.alive_mask().sum())
    assert n0 >= 100_000, n0

    t0 = time.time()
    g_vec = g.clone()
    n_vec = V.remove_tips(g_vec)
    t_vec = time.time() - t0

    t0 = time.time()
    g_py, n_py = _py_fixpoint(g, basic.remove_tips)
    t_py = time.time() - t0

    assert n_vec == n_py
    assert _alive_key(asm_condense(g_vec)) == _alive_key(asm_condense(g_py))
    assert t_vec < t_py, (t_vec, t_py)
    print(f"\n100k-edge remove_tips: vectorized {t_vec:.2f}s vs "
          f"python {t_py:.2f}s ({t_py / max(t_vec, 1e-9):.0f}x)")

    # and the full driver finishes the big graph in reasonable time
    t0 = time.time()
    r = resolve_graph_operation(g.clone())
    t_full = time.time() - t0
    assert int(r.alive_mask().sum()) < n0 // 10
    print(f"full resolve on {n0}-edge graph: {t_full:.1f}s "
          f"-> {int(r.alive_mask().sum())} edges")
