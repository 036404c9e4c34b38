"""Minimizer mapper: index properties + mapping accuracy on synthetic data."""

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.graph.build import build_graph_from_kedges
from turingassembler_tpu.kmer.count import count_kedges_from_reads
from turingassembler_tpu.mapper.minimizers import (
    MM_K,
    MM_W,
    EdgeMinimizerIndex,
    map_reads,
    minimizer_mask,
)
from turingassembler_tpu.ops import limbs as lbops

rng = np.random.default_rng(0)


def brute_minimizers(seq, k=MM_K, w=MM_W):
    """Oracle: leftmost min-hash per window, via the same hash."""
    import jax.numpy as jnp
    P = len(seq) - k + 1
    kms = [seq[i : i + k] for i in range(P)]
    packed = np.stack([np.asarray(lbops.pack_bases(km[None, :], k))[0] for km in kms])
    hashes = np.asarray(lbops.hash_limbs(packed))
    out = set()
    for i in range(len(seq) - k - w + 2):
        window = hashes[i : i + w]
        out.add(i + int(np.argmin(window)))
    return out


def test_minimizer_mask_oracle():
    L = 80
    seqs = rng.integers(0, 4, (6, L)).astype(np.uint8)
    lengths = np.full(6, L, np.int32)
    km, h, is_mm = minimizer_mask(seqs, lengths)
    is_mm = np.asarray(is_mm)
    for b in range(6):
        want = brute_minimizers(seqs[b])
        got = set(np.flatnonzero(is_mm[b]).tolist())
        assert got == want


def test_minimizer_mask_respects_length():
    L = 80
    seqs = rng.integers(0, 4, (2, L)).astype(np.uint8)
    lengths = np.array([L, 40], np.int32)
    km, h, is_mm = minimizer_mask(seqs, lengths)
    is_mm = np.asarray(is_mm)
    want = brute_minimizers(seqs[1][:40])
    got = set(np.flatnonzero(is_mm[1]).tolist())
    assert got == want


def make_two_contig_graph(seed=3):
    rng2 = np.random.default_rng(seed)
    g1 = rng2.integers(0, 4, 3000).astype(np.uint8)
    g2 = rng2.integers(0, 4, 2500).astype(np.uint8)
    genome = np.concatenate([g1, np.full(0, 0, np.uint8), g2])
    # build two separate components by counting reads from each part
    r1, l1 = tt.sim_reads(g1, coverage=30, read_len=100, seed=1)
    r2, l2 = tt.sim_reads(g2, coverage=30, read_len=100, seed=2)
    reads = np.concatenate([r1, r2])
    lengths = np.concatenate([l1, l2])
    ke, c = count_kedges_from_reads(reads, lengths, 31)
    g = build_graph_from_kedges(ke, c, 31)
    return g, g1, g2


def test_map_reads_to_correct_edge():
    g, g1, g2 = make_two_contig_graph()
    assert g.n_e == 4  # two contigs, rc pairs
    idx = EdgeMinimizerIndex.build(g)
    assert len(idx.keys) > 0
    assert idx.singleton.sum() > 0

    # fresh reads from genome 1 must vote for the edge matching g1
    reads, lengths = tt.sim_reads(g1, coverage=3, read_len=120, seed=9, pad_to=128)
    edges, hits, starts = map_reads(idx, reads, lengths, batch_size=256)
    mapped = edges >= 0
    assert mapped.mean() > 0.9
    # figure out which edge pair is g1 (longer contig)
    lens = g.edge_len()
    g1_pair = {e for e in range(g.n_e) if abs(lens[e] - 3000) < 50}
    assert set(edges[mapped].tolist()) <= g1_pair
    # positions sane
    ok = starts[mapped]
    assert (ok >= 0).all() and (ok < 3000).all()


def test_map_reads_position_accuracy():
    g, g1, g2 = make_two_contig_graph()
    idx = EdgeMinimizerIndex.build(g)
    lens = g.edge_len()
    # take fw reads at known positions from g1's edge sequence itself
    eid = int(np.argmax(lens * g.alive_mask()))
    eseq = g.get_seq(eid)
    B, L = 32, 100
    starts_true = rng.integers(0, len(eseq) - L, B)
    reads = np.stack([eseq[s : s + L] for s in starts_true]).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    edges, hits, starts = map_reads(idx, reads, lengths, batch_size=32)
    good = edges == eid
    assert good.mean() > 0.9
    err = np.abs(starts[good] - starts_true[good])
    assert np.median(err) <= 2


def test_sortless_tally_matches_sort_oracle():
    """The open-addressing (read, edge) tally must reproduce the
    sort-based formulation exactly (edge, hits, and start estimates)."""
    import jax.numpy as jnp
    from turingassembler_tpu.mapper import minimizers as mm

    g, g1, g2 = make_two_contig_graph()
    idx = EdgeMinimizerIndex.build(g)
    lens = g.edge_len()
    eid = int(np.argmax(lens * g.alive_mask()))
    eseq = g.get_seq(eid)
    B, L = 64, 100
    sts = rng.integers(0, len(eseq) - L, B)
    reads = np.stack([eseq[s : s + L] for s in sts]).astype(np.uint8)
    # mix in random (unmappable) and short/pad reads
    reads[B // 2 :] = rng.integers(0, 4, (B - B // 2, L)).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    lengths[-3:] = 0
    keys, edge, pos, count = map(jnp.asarray,
                                 (idx.keys, idx.edge, idx.pos, idx.count))
    old = [np.asarray(x) for x in mm._map_batch_sort(
        reads, lengths, keys, edge, pos, count, idx.k, idx.w)]
    hkeys, vals, salt = idx.device_tables()
    new = [np.asarray(x) for x in mm._map_batch(
        reads, lengths, hkeys, vals, salt, idx.k, idx.w)]
    for a, b in zip(old, new):
        assert np.array_equal(a, b)


def test_cuckoo_probe_exact():
    """Every indexed key must resolve to its (edge-if-singleton, pos)
    through the cuckoo tables; absent keys must report not-found."""
    import jax.numpy as jnp

    from turingassembler_tpu.mapper import minimizers as mm

    g, _, _ = make_two_contig_graph()
    idx = EdgeMinimizerIndex.build(g)
    hkeys, vals, salt = map(jnp.asarray, idx.hash_tables())
    es, pv, found = mm._cuckoo_probe(hkeys, vals, salt,
                                     jnp.asarray(idx.keys))
    assert np.asarray(found).all()
    sing = idx.count == 1
    assert np.array_equal(np.asarray(es)[sing], idx.edge[sing])
    assert (np.asarray(es)[~sing] == -1).all()
    assert np.array_equal(np.asarray(pv)[sing], idx.pos[sing])
    # absent keys: flip low bits of limb1 (never indexed — real keys
    # there have low 30 bits zero)
    qk = idx.keys.copy()
    qk[:, 1] |= 1
    es2, _, found2 = mm._cuckoo_probe(hkeys, vals, salt, jnp.asarray(qk))
    assert not np.asarray(found2).any()
    assert (np.asarray(es2) == -1).all()


def test_rescore_rejects_chimeric_reads():
    """DP verification (reference asm_reg2aln rescore,
    src/barcode_builder.c:448-563) must kill chimeric/junk votes that
    the minimizer tally alone accepts, without hurting clean reads."""
    from turingassembler_tpu.mapper.minimizers import rescore_hits

    g, g1, g2 = make_two_contig_graph()
    idx = EdgeMinimizerIndex.build(g)
    B, L = 64, 120
    lens = g.edge_len()
    eid = int(np.argmax(lens * g.alive_mask()))
    eseq = g.get_seq(eid)
    r = np.random.default_rng(5)
    sts = r.integers(0, len(eseq) - L, B)
    reads = np.stack([eseq[s : s + L] for s in sts]).astype(np.uint8)
    # second half: chimeras (genome head + random tail)
    reads[B // 2 :, L // 2 :] = r.integers(0, 4, (B - B // 2, L - L // 2))
    lengths = np.full(B, L, np.int32)

    edges, hits, starts = map_reads(idx, reads, lengths, batch_size=64)
    vote_chimera_mapped = (edges[B // 2 :] >= 0).sum()

    accept, scores = rescore_hits(g.seq_data, g.seq_off, edges, starts,
                                  reads, lengths)
    # clean reads keep their (high) scores
    clean = accept[: B // 2]
    assert clean.sum() >= (edges[: B // 2] >= 0).sum() * 0.9
    assert (scores[: B // 2][clean] > 100).all()
    # chimeras that got votes must be rejected by the global DP
    chim_accept = accept[B // 2 :].sum()
    assert chim_accept < max(1, vote_chimera_mapped // 4)

    # the map_reads(graph=...) path applies the same gate
    e2, _, _ = map_reads(idx, reads, lengths, batch_size=64, graph=g)
    assert (e2[B // 2 :] >= 0).sum() == chim_accept


def test_confidence_ratio_gate():
    """A read whose singleton hits split across two edges (e.g. straddling
    a junction artifact) is rejected: best < 0.85 * total with > 2 hits
    (reference RATIO_OF_CONFIDENT, src/minimizers/smart_load.c:193)."""
    g, g1, g2 = make_two_contig_graph()
    idx = EdgeMinimizerIndex.build(g)
    lens = g.edge_len()
    alive = np.flatnonzero(g.alive_mask())
    e_long = int(alive[np.argmax(lens[alive])])
    others = [e for e in alive if e != e_long and lens[e] > 400
              and e != int(g.edge_rc[e_long])]
    e_short = int(others[0])
    sa, sb = g.get_seq(e_long), g.get_seq(e_short)
    # hybrid read: ~55% from one edge, 45% from another — votes split
    L1, L2 = 70, 60
    hyb = np.concatenate([sa[100 : 100 + L1], sb[50 : 50 + L2]])
    reads = hyb[None, :].astype(np.uint8)
    lengths = np.array([L1 + L2], np.int32)
    edges, hits, starts = map_reads(idx, reads, lengths, batch_size=1)
    assert edges[0] == -1


def test_rescore_fast_path_equals_dp_everywhere(monkeypatch):
    """The gapless fast path must leave acceptance decisions exactly as
    if the DP ran on every lane, including on reads with indels (which
    fail the gapless bound and take the DP route)."""
    import turingassembler_tpu.mapper.minimizers as mm

    g, g1, g2 = make_two_contig_graph()
    idx = EdgeMinimizerIndex.build(g)
    lens = g.edge_len()
    eid = int(np.argmax(lens * g.alive_mask()))
    eseq = g.get_seq(eid)
    r = np.random.default_rng(7)
    B, L = 128, 120
    reads = np.full((B, L), 0, np.uint8)
    lengths = np.full(B, L, np.int32)
    for i in range(B):
        s = int(r.integers(0, len(eseq) - L - 4))
        frag = eseq[s : s + L + 4].copy()
        # substitutions
        nsub = int(r.integers(0, 4))
        pos = r.integers(0, L, nsub)
        frag[pos] = (frag[pos] + r.integers(1, 4, nsub)) % 4
        if i % 3 == 0:       # 1-2 base deletion -> indel vs the edge
            d = int(r.integers(1, 3))
            p = int(r.integers(10, L - 10))
            frag = np.concatenate([frag[:p], frag[p + d :]])
        reads[i] = frag[:L]
    edges, hits, starts = map_reads(idx, reads, lengths, batch_size=B)

    acc_fast, sc_fast = mm.rescore_hits(g.seq_data, g.seq_off, edges,
                                        starts, reads, lengths)

    # force every lane through the DP by making the gapless bound
    # unreachable (feasibility mask stays, threshold check fails)
    import turingassembler_tpu.ops.dp as dp
    real_scores = dp.affine_scores

    def spy(*a, **kw):
        spy.calls += 1
        return real_scores(*a, **kw)

    spy.calls = 0
    monkeypatch.setattr(dp, "affine_scores", spy)
    acc_dp, sc_dp = mm.rescore_hits(g.seq_data, g.seq_off, edges, starts,
                                    reads, lengths,
                                    min_score=np.full(B, 10**6))
    # min_score=1e6 rejects everything; what we want is the DP scores
    # it computed for every mapped lane
    assert spy.calls == 1
    mapped = edges >= 0
    assert mapped.sum() > B // 2
    # acceptance parity at the production threshold
    assert np.array_equal(acc_fast[mapped], sc_dp[mapped] >= dp.MIN_MAP_SCORE)
    # fast-path scores are valid lower bounds of the DP scores
    assert (sc_fast[mapped] <= sc_dp[mapped]).all()


def test_no_mapping_cliff_at_edge_ends():
    """Reads overhanging a contig end must keep mapping with their
    on-edge part scored (reference asm_reg2aln clip handling,
    src/barcode_builder.c:497-563).  VERDICT r2 #5: mapped fraction vs
    distance-from-edge-end must show no cliff."""
    from turingassembler_tpu.graph.from_contigs import graph_from_contigs
    rng3 = np.random.default_rng(11)
    genome = rng3.integers(0, 4, 5000).astype(np.uint8)
    g = graph_from_contigs([tt.codes_to_str(genome)], 45)
    idx = EdgeMinimizerIndex.build(g)
    RL = 100
    # one read per start, from 40 bases before the head to 40 past the
    # tail; overhang bases are random noise (as in real adapters/next
    # fragments)
    starts = np.arange(-40, 5000 - RL + 41)
    reads = np.full((len(starts), RL), 255, np.uint8)
    for i, s in enumerate(starts):
        lo, hi = max(s, 0), min(s + RL, 5000)
        reads[i, lo - s : hi - s] = genome[lo:hi]
        noise = rng3.integers(0, 4, RL).astype(np.uint8)
        reads[i, : lo - s] = noise[: lo - s]
        if hi - s < RL:
            reads[i, hi - s :] = noise[hi - s :]
    lengths = np.full(len(starts), RL, np.int32)
    e, _, p = map_reads(idx, reads, lengths, graph=g)
    on_edge = np.minimum(starts + RL, 5000) - np.maximum(starts, 0)
    # buckets by overhang amount; fully-interior reads are the control
    interior = (starts >= 0) & (starts + RL <= 5000)
    frac_interior = (e[interior] >= 0).mean()
    assert frac_interior > 0.95
    for oh in (10, 20, 30, 40):
        head = starts == -oh
        tail = starts == 5000 - RL + oh
        sel = head | tail
        assert (e[sel] >= 0).all(), f"cliff at overhang {oh}"
        # mapped position must be clamped to the edge
        assert (p[sel] >= 0).all()
    # positions of accepted hits are consistent with truth
    ok = (e >= 0) & interior
    assert np.abs(p[ok] - starts[ok]).max() == 0


def test_overhang_reads_fail_full_length_gates():
    """An overhanging read's clipped score cannot reach a full-length
    threshold (the reference excludes a.aligned < read_len from rp
    counting, src/barcode_builder.c:676-683)."""
    from turingassembler_tpu.graph.from_contigs import graph_from_contigs
    rng3 = np.random.default_rng(12)
    genome = rng3.integers(0, 4, 3000).astype(np.uint8)
    g = graph_from_contigs([tt.codes_to_str(genome)], 45)
    idx = EdgeMinimizerIndex.build(g)
    RL = 100
    # 30-base tail overhang: on-edge score <= 70 < RL - 20
    s = 3000 - RL + 30
    read = np.concatenate([genome[s:3000],
                           rng3.integers(0, 4, 30).astype(np.uint8)])
    reads = read[None, :].astype(np.uint8)
    lengths = np.full(1, RL, np.int32)
    e_lo, _, _ = map_reads(idx, reads, lengths, graph=g, min_score=50)
    e_hi, _, _ = map_reads(idx, reads, lengths, graph=g,
                           min_score=np.array([RL - 20], np.int64))
    assert e_lo[0] >= 0          # clip-tolerant acceptance
    assert e_hi[0] == -1         # full-length gate rejects


def test_map_reads_shipped_records_bit_equal():
    """Device-resident ship records (the count stage's wire format,
    kmer/megasort.ship_chunks) must map bit-equal to the host-path
    map_reads — clean (packedc) and dirty (packed: Ns + ragged
    lengths) chunks, verified and vote-only, including on-device
    slicing of records wider than batch_size and a padded tail
    record."""
    from turingassembler_tpu.kmer.megasort import ship_chunks

    g, g1, g2 = make_two_contig_graph()
    idx = EdgeMinimizerIndex.build(g)

    # clean: uniform lengths, no Ns -> packedc records
    reads, lengths = tt.sim_reads(g1, coverage=25, read_len=100, seed=21,
                                  pad_to=104)
    reads, lengths = reads[:640], lengths[:640].astype(np.int32)
    recs = ship_chunks(reads, lengths, chunk=512)   # 512-row + padded tail
    assert recs[0][0] == "packedc"
    for graph in (None, g):
        e0, h0, p0 = map_reads(idx, reads, lengths, batch_size=256,
                               graph=graph)
        e1, h1, p1 = map_reads(idx, reads, lengths, batch_size=256,
                               graph=graph, shipped=recs)
        np.testing.assert_array_equal(e0, e1)
        np.testing.assert_array_equal(h0, h1)
        np.testing.assert_array_equal(p0, p1)

    # dirty: sprinkle Ns and vary lengths -> packed records
    rng4 = np.random.default_rng(5)
    reads = reads.copy()
    nmask = rng4.random(reads.shape) < 0.01
    reads[nmask] = 4
    lengths = lengths - rng4.integers(0, 30, len(lengths)).astype(np.int32)
    recs = ship_chunks(reads, lengths, chunk=512)
    assert recs[0][0] == "packed"
    for graph in (None, g):
        e0, h0, p0 = map_reads(idx, reads, lengths, batch_size=256,
                               graph=graph)
        e1, h1, p1 = map_reads(idx, reads, lengths, batch_size=256,
                               graph=graph, shipped=recs)
        np.testing.assert_array_equal(e0, e1)
        np.testing.assert_array_equal(h0, h1)
        np.testing.assert_array_equal(p0, p1)


def test_count_reads_device_return_chunks_reusable():
    """count_reads_device(return_chunks=True) hands back ship records
    that (a) re-feed a second count bit-equal (shipped=...) and (b)
    drive the mapper — reads cross the tunnel once per pipeline."""
    from turingassembler_tpu.kmer.megasort import count_reads_device, pull_rows

    g, g1, g2 = make_two_contig_graph()
    idx = EdgeMinimizerIndex.build(g)
    reads, lengths = tt.sim_reads(g1, coverage=20, read_len=100, seed=31,
                                  pad_to=104)
    lengths = lengths.astype(np.int32)
    u0, c0, n0, recs = count_reads_device(reads, lengths, 31,
                                          return_chunks=True)
    u1, c1, n1 = count_reads_device(reads, lengths, 31, shipped=recs)
    assert n0 == n1
    np.testing.assert_array_equal(pull_rows(u0, n0), pull_rows(u1, n1))
    np.testing.assert_array_equal(np.asarray(c0[:n0]), np.asarray(c1[:n1]))

    e0, _, _ = map_reads(idx, reads, lengths, graph=g)
    e1, _, _ = map_reads(idx, reads, lengths, graph=g, shipped=recs)
    np.testing.assert_array_equal(e0, e1)


def test_gapless_bound_packed_equals_ref():
    """The packed-window gapless bound (one dynamic-slice word gather +
    8-case shift select per lane) must be bit-equal to the scalar-gather
    oracle on every lane class: interior, head/tail overhang (negative /
    past-end starts), short edges, zero-length, unmapped."""
    import jax.numpy as jnp

    from turingassembler_tpu.mapper import minimizers as mm

    rng = np.random.default_rng(11)
    # pool of several edges incl. a tiny first edge (b can go negative)
    lens_e = [7, 300, 51, 1200, 64]
    seq_off = np.concatenate([[0], np.cumsum(lens_e)]).astype(np.int64)
    seq_data = rng.integers(0, 4, seq_off[-1]).astype(np.uint8)
    N, Lq = 512, 152
    edges = rng.integers(-1, len(lens_e), N).astype(np.int32)
    starts = rng.integers(-Lq + 1, 1400, N).astype(np.int32)
    bases = rng.integers(0, 4, (N, Lq)).astype(np.uint8)
    lengths = rng.integers(0, Lq + 1, N).astype(np.int32)
    # plant exact matches on a quarter of lanes so bounds aren't all noise
    for i in range(0, N, 4):
        e = int(edges[i])
        if e < 0:
            continue
        el = lens_e[e]
        s = int(starts[i])
        lo, hi = max(s, 0), min(s + int(lengths[i]), el)
        for t in range(lo, hi):
            bases[i, t - s] = seq_data[seq_off[e] + t]

    sod = jnp.asarray(seq_off.astype(np.int32))
    b_ref, f_ref = mm._gapless_bound_ref(
        jnp.asarray(seq_data), sod, jnp.asarray(edges), jnp.asarray(starts),
        jnp.asarray(bases), jnp.asarray(lengths), 1, -4, mm.RESCORE_PAD)
    pk = jnp.asarray(mm._pack_pool_nibbles(seq_data))
    b_pk, f_pk = mm._gapless_bound_dev(
        pk, sod, jnp.asarray(edges), jnp.asarray(starts),
        jnp.asarray(bases), jnp.asarray(lengths), 1, -4, mm.RESCORE_PAD)
    assert np.array_equal(np.asarray(f_ref), np.asarray(f_pk))
    fr = np.asarray(f_ref)
    assert np.array_equal(np.asarray(b_ref)[fr], np.asarray(b_pk)[fr])


def test_gapless_bound_wide_read_fallback():
    """Queries wider than the sentinel pad window (~241 bases, e.g.
    merged pairs) must trace the per-position nibble-gather fallback
    and still bit-match the scalar-gather oracle (ADVICE r3: the packed
    fast path used to assert at trace time)."""
    import jax.numpy as jnp

    from turingassembler_tpu.mapper import minimizers as mm

    rng = np.random.default_rng(13)
    Lq = 8 * mm.POOL_PAD_W + 40          # W > POOL_PAD_W guaranteed
    lens_e = [37, 2000, 600]
    seq_off = np.concatenate([[0], np.cumsum(lens_e)]).astype(np.int64)
    seq_data = rng.integers(0, 4, seq_off[-1]).astype(np.uint8)
    N = 128
    edges = rng.integers(-1, len(lens_e), N).astype(np.int32)
    starts = rng.integers(-Lq + 1, 2100, N).astype(np.int32)
    bases = rng.integers(0, 4, (N, Lq)).astype(np.uint8)
    lengths = rng.integers(0, Lq + 1, N).astype(np.int32)
    sod = jnp.asarray(seq_off.astype(np.int32))
    b_ref, f_ref = mm._gapless_bound_ref(
        jnp.asarray(seq_data), sod, jnp.asarray(edges), jnp.asarray(starts),
        jnp.asarray(bases), jnp.asarray(lengths), 1, -4, mm.RESCORE_PAD)
    pk = jnp.asarray(mm._pack_pool_nibbles(seq_data))
    b_pk, f_pk = mm._gapless_bound_dev(
        pk, sod, jnp.asarray(edges), jnp.asarray(starts),
        jnp.asarray(bases), jnp.asarray(lengths), 1, -4, mm.RESCORE_PAD)
    assert np.array_equal(np.asarray(f_ref), np.asarray(f_pk))
    fr = np.asarray(f_ref)
    assert np.array_equal(np.asarray(b_ref)[fr], np.asarray(b_pk)[fr])
