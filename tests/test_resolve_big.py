"""2-1-2 repeat resolution via span k-mers and coverage."""

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.graph.build import build_graph_from_kedges
from turingassembler_tpu.graph.invariants import check_graph
from turingassembler_tpu.graph.mutable import MutableGraph
from turingassembler_tpu.kmer.count import count_kedges_from_reads
from turingassembler_tpu.resolve.big import (
    SpanKmerTable,
    is_case_2_1_2,
    resolve_212_pair_kmer_all,
)


def make_212_genome(seed=2, rep_len=60, k=21):
    """Two sequences sharing a short middle repeat: A0-R-B0 and A1-R-B1
    creates a 2-in/1-mid/2-out junction at R (rep shorter than
    DISTANCE_KMER + 51 - 2 - 2k so the span check applies)."""
    rng = np.random.default_rng(seed)
    A0 = rng.integers(0, 4, 3000).astype(np.uint8)
    A1 = rng.integers(0, 4, 3000).astype(np.uint8)
    B0 = rng.integers(0, 4, 3000).astype(np.uint8)
    B1 = rng.integers(0, 4, 3000).astype(np.uint8)
    R = rng.integers(0, 4, rep_len).astype(np.uint8)
    h0 = np.concatenate([A0, R, B0])
    h1 = np.concatenate([A1, R, B1])
    return h0, h1


def test_212_span_kmer_resolution():
    k = 21
    h0, h1 = make_212_genome(rep_len=60, k=k)
    r0, l0 = tt.sim_reads(h0, coverage=35, read_len=150, seed=3)
    r1, l1 = tt.sim_reads(h1, coverage=35, read_len=150, seed=4)
    reads = np.concatenate([r0, r1])
    lengths = np.concatenate([l0, l1])
    ke, c = count_kedges_from_reads(reads, lengths, k)
    g = build_graph_from_kedges(ke, c, k)
    check_graph(g)

    mg = MutableGraph.from_asm(g)
    mid = [e for e in range(mg.n_e) if is_case_2_1_2(mg, e)]
    assert len(mid) >= 1, "no 2-1-2 junction formed"

    table = SpanKmerTable.build(reads, lengths)
    n = resolve_212_pair_kmer_all(mg, table)
    assert n >= 1, "span-kmer resolution failed"
    g2 = mg.to_asm()
    check_graph(g2, check_seq=True)
    # the two haplotype sequences should now exist end-to-end
    seqs = {tt.canonical_str(tt.codes_to_str(g2.get_seq(e)))
            for e in range(g2.n_e) if g2.edge_source[e] >= 0}
    want0 = tt.canonical_str(tt.codes_to_str(h0))
    want1 = tt.canonical_str(tt.codes_to_str(h1))
    joined = "".join(seqs)
    # ends may be unsampled; check long containment
    def contained(w):
        return any(w[50:-50] in s or w[50:-50] in _rc(s) for s in seqs)
    def _rc(s):
        comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
        return "".join(comp[c] for c in reversed(s))
    assert contained(want0) and contained(want1)


def test_212_cov_worklist_equals_oracle():
    """The worklist resolve_212_by_cov must produce the exact graph of
    the full-rescan `while resolve_212_by_cov_1step` fixpoint, on a
    junction the coverage test actually resolves (haplotypes simulated
    at 2x differing depth so legs split >1.7x)."""
    from turingassembler_tpu.resolve.big import (resolve_212_by_cov,
                                                 resolve_212_by_cov_1step)

    k = 21
    h0, h1 = make_212_genome(rep_len=60, k=k)
    r0, l0 = tt.sim_reads(h0, coverage=50, read_len=150, seed=3)
    r1, l1 = tt.sim_reads(h1, coverage=20, read_len=150, seed=4)
    reads = np.concatenate([r0, r1])
    lengths = np.concatenate([l0, l1])
    ke, c = count_kedges_from_reads(reads, lengths, k)
    g = build_graph_from_kedges(ke, c, k)

    mg_o = MutableGraph.from_asm(g)
    n_o = 0
    while True:
        r = resolve_212_by_cov_1step(mg_o)
        if not r:
            break
        n_o += r
    mg_w = MutableGraph.from_asm(g)
    n_w = resolve_212_by_cov(mg_w)
    assert n_o == n_w and n_o >= 1, (n_o, n_w)

    def key(mgx):
        gx = mgx.to_asm()
        return sorted((gx.get_seq(int(e)).tobytes(), int(gx.edge_count[e]))
                      for e in np.flatnonzero(gx.alive_mask()))
    assert key(mg_o) == key(mg_w)
