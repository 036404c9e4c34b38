"""SPAdes fastg loader round-trip on a tiny hand-built graph."""

import numpy as np

from turingassembler_tpu.io.fastg import load_fastg


def test_load_fastg_adjacency(tmp_path):
    # A -> B and A -> C': simple branch, k=3 overlaps
    k = 3
    A = "ACGTACG"
    B = "ACGGGTT"
    C = "AACCCGT"  # C' (rc) follows A
    p = tmp_path / "g.fastg"
    p.write_text(
        f">EDGE_1_length_7_cov_10:EDGE_2_length_7_cov_5,EDGE_3_length_7_cov_5';\n{A}\n"
        f">EDGE_1_length_7_cov_10';\n" + _rc(A) + "\n"
        f">EDGE_2_length_7_cov_5;\n{B}\n"
        f">EDGE_2_length_7_cov_5';\n" + _rc(B) + "\n"
        f">EDGE_3_length_7_cov_5:EDGE_1_length_7_cov_10';\n{C}\n"
        f">EDGE_3_length_7_cov_5';\n" + _rc(C) + "\n"
    )
    g = load_fastg(str(p), k)
    from turingassembler_tpu.graph.invariants import check_graph
    # seq-level invariants don't apply (no shared k-prefix guarantee in fastg)
    check_graph(g, check_seq=False)
    assert g.n_e == 6
    # A's fw target node has out-degree 2 (B fw, C rc)
    lens = g.edge_len()
    a_fw = 0
    tgt = int(g.edge_target[a_fw])
    assert len(g.node_adj(tgt)) == 2


def _rc(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))
