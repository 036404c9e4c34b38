"""Serialization round-trips: asmg binary, binseq packing, FASTA/GFA."""

import numpy as np

from turingassembler_tpu import testing as tt
from turingassembler_tpu.graph.build import build_graph_from_kedges
from turingassembler_tpu.graph.invariants import check_graph
from turingassembler_tpu.io import asmg
from turingassembler_tpu.io.binseq import pack_binseq, unpack_binseq
from turingassembler_tpu.io.fasta import read_fasta, write_fasta, write_fasta_all, write_gfa
from turingassembler_tpu.kmer.count import count_kedges_from_reads

rng = np.random.default_rng(0)


def make_graph(glen=3000, k=31):
    genome = tt.random_genome(glen, seed=77)
    reads, lengths = tt.sim_reads(genome, coverage=30.0, read_len=100, seed=6)
    kedges, counts = count_kedges_from_reads(reads, lengths, k, batch_size=8192)
    return build_graph_from_kedges(kedges, counts, k)


def test_binseq_roundtrip():
    for n in [1, 15, 16, 17, 100, 1000]:
        codes = rng.integers(0, 4, n).astype(np.uint8)
        words = pack_binseq(codes)
        assert len(words) == (n + 15) // 16
        np.testing.assert_array_equal(unpack_binseq(words, n), codes)
        # reference __binseq_get layout: base i at bits (i%16)*2 of word i//16
        for i in sorted({0, min(1, n - 1), n - 1}):
            assert (int(words[i >> 4]) >> ((i & 15) << 1)) & 3 == codes[i]


def test_asmg_roundtrip(tmp_path):
    g = make_graph()
    check_graph(g)
    path = str(tmp_path / "graph.bin")
    asmg.save_graph(g, path)
    g2 = asmg.load_graph(path)
    check_graph(g2)
    assert g2.ksize == g.ksize
    assert g2.n_v == g.n_v and g2.n_e == g.n_e
    np.testing.assert_array_equal(g2.edge_source, g.edge_source)
    np.testing.assert_array_equal(g2.edge_target, g.edge_target)
    np.testing.assert_array_equal(g2.edge_rc, g.edge_rc)
    np.testing.assert_array_equal(g2.edge_count, g.edge_count)
    np.testing.assert_array_equal(g2.seq_data, g.seq_data)
    np.testing.assert_array_equal(g2.adj_list, g.adj_list)


def test_fasta_writers(tmp_path):
    g = make_graph()
    p1 = str(tmp_path / "a.fasta")
    write_fasta(g, p1)
    recs = list(read_fasta(p1))
    assert len(recs) >= 1
    name, seq = recs[0]
    assert name.startswith("SEQ_")
    assert set(seq) <= set("ACGTN")
    # header length field matches sequence length
    assert int(name.split("_")[4]) == len(seq)

    p2 = str(tmp_path / "b.fasta")
    write_fasta_all(g, p2)
    assert len(list(read_fasta(p2))) == int((g.edge_source >= 0).sum())


def test_gfa_writer(tmp_path):
    g = make_graph()
    p = str(tmp_path / "g.gfa")
    write_gfa(g, p)
    lines = open(p).read().splitlines()
    s_lines = [l for l in lines if l.startswith("S\t")]
    l_lines = [l for l in lines if l.startswith("L\t")]
    assert len(s_lines) >= 1
    for l in l_lines:
        parts = l.split("\t")
        assert parts[5] == f"{g.ksize}M"


def test_asmg_barcode_roundtrip(tmp_path):
    """ASM_HAVE_BARCODE serialization: five hash tables per live edge
    (reference save_asm_graph src/assembly_graph.c:1196-1248)."""
    g = make_graph()
    g.barcodes = [[{1: 2, 99: 1}, {3: 4}, {}] for _ in range(g.n_e)]
    g.barcodes_scaf = [{7: 1, 123456789: 3} for _ in range(g.n_e)]
    g.barcodes_cov = [{} for _ in range(g.n_e)]
    g.aux_flag |= 1
    path = str(tmp_path / "bc.bin")
    asmg.save_graph(g, path)
    g2 = asmg.load_graph(path)
    assert g2.aux_flag & 1
    for e in range(g2.n_e):
        if g2.edge_source[e] < 0:
            continue
        assert g2.barcodes[e][0] == {1: 2, 99: 1}
        assert g2.barcodes[e][1] == {3: 4}
        assert g2.barcodes[e][2] == {}
        assert g2.barcodes_scaf[e] == {7: 1, 123456789: 3}
        assert g2.barcodes_cov[e] == {}
