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


def _condense_key(g):
    """FULL structural fingerprint for condense parity: exact arrays."""
    return (g.node_rc.tolist(), g.edge_source.tolist(), g.edge_target.tolist(),
            g.edge_rc.tolist(), g.edge_count.tolist(), g.seq_off.tolist(),
            g.seq_data.tobytes(),
            {e: (p.tolist(), l.tolist()) for e, (p, l) in sorted(g.holes.items())})


@pytest.mark.parametrize("seed", [3, 11, 27, 42])
def test_condense_fast_parity(seed):
    from turingassembler_tpu.graph.condense import asm_condense_fast, asm_condense_py
    g = _error_graph(20000, seed)
    gf, mf = asm_condense_fast(g.clone(), return_map=True)
    gp, mp = asm_condense_py(g.clone(), return_map=True)
    assert _condense_key(gf) == _condense_key(gp)
    assert mf.tolist() == mp.tolist()


def test_condense_fast_parity_with_holes_and_tombstones(seed=7):
    from turingassembler_tpu.graph.condense import asm_condense_fast, asm_condense_py
    g = _error_graph(15000, seed)
    rng = np.random.default_rng(seed)
    # tombstone a few rc pairs
    live = np.flatnonzero(g.alive_mask())
    for e in rng.choice(live, size=min(6, len(live)), replace=False):
        g.remove_edge(int(e))
    # sprinkle holes on a few surviving long edges
    lens = g.edge_len()
    cand = [int(e) for e in np.flatnonzero(g.alive_mask()) if lens[e] > 40][:4]
    for e in cand:
        g.holes[e] = (np.array([10, 20], np.int64), np.array([5, 3], np.int64))
        rc = int(g.edge_rc[e])
        if rc != e and rc not in g.holes:
            L = int(lens[rc])
            g.holes[rc] = (np.array([L - 2 - 20, L - 2 - 10], np.int64),
                           np.array([3, 5], np.int64))
    gf = asm_condense_fast(g.clone())
    gp = asm_condense_py(g.clone())
    assert _condense_key(gf) == _condense_key(gp)


def test_condense_fast_empty():
    from turingassembler_tpu.graph.condense import asm_condense_fast
    from turingassembler_tpu.graph.structs import AsmGraph
    g = AsmGraph(ksize=31)
    g2 = asm_condense_fast(g)
    assert g2.n_e == 0 and g2.n_v == 0


@pytest.mark.parametrize("seed", [3, 11, 27])
def test_simple_bulges_equivalence(seed):
    """Array-graph simple bulges == MutableGraph oracle (VERDICT r2 #7)."""
    from turingassembler_tpu.resolve.bulges import resolve_simple_bulges_ite
    from turingassembler_tpu.resolve.vectorized import resolve_simple_bulges
    g = _error_graph(20000, seed)
    g = resolve_graph_operation(g)      # bulges run post-tips in the pipeline
    r_vec = resolve_simple_bulges(g.clone())
    r_py = resolve_simple_bulges_ite(g.clone())
    assert _alive_key(r_vec) == _alive_key(r_py)


def _bulge_heavy_graph(n_copies=60, seg=4000, rep=1500, seed=5):
    """Graph dominated by real bulges: near-identical repeat copies
    diverge into parallel paths that tips/chimeric never remove."""
    genome = tt.genome_with_repeat_family(
        n_segments=n_copies, segment_len=seg, repeat_len=rep,
        identity=0.97, seed=seed)
    reads, lengths = tt.sim_reads(genome, coverage=25.0, read_len=100,
                                  error_rate=0.002, seed=seed + 1)
    ke, c = count_kedges_from_reads(reads, lengths, 31, engine="np",
                                    batch_size=200000)
    return build_graph_from_kedges(ke, c, 31)


@pytest.mark.slow
def test_scale_bulges():
    """Bulge-heavy graph: the array pass must clear it in seconds and
    match the oracle (the 100k-edge 'build_0_1 + bulges within seconds'
    gate)."""
    from turingassembler_tpu.resolve.bulges import resolve_simple_bulges_ite
    from turingassembler_tpu.resolve.vectorized import resolve_simple_bulges
    g0 = _bulge_heavy_graph()
    t0 = time.time()
    g = resolve_graph_operation(g0.clone())
    t_resolve = time.time() - t0
    n_res = int(g.alive_mask().sum())

    t0 = time.time()
    r_vec = resolve_simple_bulges(g.clone())
    t_vec = time.time() - t0
    r_py = resolve_simple_bulges_ite(g.clone())
    assert _alive_key(r_vec) == _alive_key(r_py)
    print(f"\nbulge-heavy: n_e0={int(g0.alive_mask().sum())} "
          f"resolve {t_resolve:.1f}s -> {n_res}; simple bulges "
          f"{t_vec:.2f}s -> {int(r_vec.alive_mask().sum())}")
    assert t_resolve + t_vec < 60
