"""Synthetic-data simulator for tests and benchmarks.

The reference has no test datasets in-repo; its closest analogue is the
`reduce_reads` dataset shrinker (src/fastq_reducer.c).  With zero egress
we validate correctness on simulated genomes: an error-free read set at
sufficient coverage must reassemble the genome exactly, and graph
invariants must hold at every stage.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

ACGT = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_genome(n: int, seed: int = 0) -> np.ndarray:
    return np.random.default_rng(seed).integers(0, 4, size=n).astype(np.uint8)


def revcomp(seq: np.ndarray) -> np.ndarray:
    return (3 - seq)[::-1]


def sim_reads(
    genome: np.ndarray,
    coverage: float = 30.0,
    read_len: int = 100,
    seed: int = 0,
    error_rate: float = 0.0,
    circular: bool = False,
    pad_to: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform single-end reads from both strands.

    Returns (reads (N, L) uint8 codes padded with 255, lengths (N,)).
    """
    rng = np.random.default_rng(seed)
    G = len(genome)
    n_reads = int(np.ceil(coverage * G / read_len))
    L = pad_to or read_len
    if circular:
        starts = rng.integers(0, G, size=n_reads)
        idx = (starts[:, None] + np.arange(read_len)[None, :]) % G
        reads = genome[idx]
    else:
        starts = rng.integers(0, max(G - read_len, 1) + 1, size=n_reads)
        idx = starts[:, None] + np.arange(read_len)[None, :]
        reads = genome[idx]
    flip = rng.random(n_reads) < 0.5
    reads[flip] = (3 - reads[flip])[:, ::-1]
    if error_rate > 0:
        errs = rng.random(reads.shape) < error_rate
        reads = np.where(errs, (reads + rng.integers(1, 4, size=reads.shape)) % 4, reads).astype(np.uint8)
    out = np.full((n_reads, L), 255, np.uint8)
    out[:, :read_len] = reads
    lengths = np.full(n_reads, read_len, np.int32)
    return out, lengths


def sim_barcoded_pairs(
    genome: np.ndarray,
    molecule_len: int = 20000,
    n_molecules: int = 300,
    reads_per_molecule: int = 60,
    read_len: int = 100,
    insert: int = 300,
    seed: int = 0,
    error_rate: float = 0.0,
):
    """Linked-read simulation: long molecules carry a barcode; paired-end
    reads sample each molecule (mimics TELL-Seq read clouds).

    Returns (r1, r2, lengths1, lengths2, barcodes (N,) int64) where read
    pairs are FR-oriented like real libraries.
    """
    rng = np.random.default_rng(seed)
    G = len(genome)
    r1s, r2s, bcs = [], [], []
    for mol in range(n_molecules):
        mstart = int(rng.integers(0, max(G - molecule_len, 1) + 1))
        mlen = min(molecule_len, G - mstart)
        if mlen < insert + 1:
            continue
        starts = rng.integers(mstart, mstart + mlen - insert + 1, size=reads_per_molecule)
        for s in starts:
            frag = genome[s : s + insert]
            fwd = frag[:read_len]
            rev = revcomp(frag)[:read_len]
            if rng.random() < 0.5:
                r1s.append(fwd); r2s.append(rev)
            else:
                r1s.append(rev); r2s.append(fwd)
            bcs.append(mol)
    r1 = np.stack(r1s).astype(np.uint8)
    r2 = np.stack(r2s).astype(np.uint8)
    if error_rate > 0:
        for arr in (r1, r2):
            errs = rng.random(arr.shape) < error_rate
            arr[errs] = (arr[errs] + rng.integers(1, 4, errs.sum())) % 4
    lengths = np.full(len(r1), read_len, np.int32)
    return r1, r2, lengths, lengths.copy(), np.asarray(bcs, np.int64)


def sim_barcoded_pairs_fast(
    genome: np.ndarray,
    molecule_len: int = 20000,
    n_molecules: int = 300,
    reads_per_molecule: int = 60,
    read_len: int = 100,
    insert: int = 300,
    seed: int = 0,
    error_rate: float = 0.0,
    collision_rate: float = 0.0,
    chimera_rate: float = 0.0,
):
    """Vectorized linked-read simulator (same distributional semantics
    as sim_barcoded_pairs, no per-read python loop) with two harsher
    real-read-cloud features (VERDICT r4 #8):

      collision_rate  fraction of molecules whose barcode is REUSED
                      from another random molecule (real TELL-Seq/10X
                      libraries put several molecules on one barcode —
                      the reference's barcode tables see exactly this);
      chimera_rate    fraction of molecules whose second half of reads
                      comes from a DIFFERENT random locus under the
                      same barcode (chimeric molecule / GEM artifact).

    Returns (r1, r2, lengths1, lengths2, barcodes)."""
    rng = np.random.default_rng(seed)
    G = len(genome)
    mstart = rng.integers(0, max(G - molecule_len, 1) + 1, n_molecules)
    mlen = np.minimum(molecule_len, G - mstart)
    ok = mlen >= insert + 1
    mstart, mlen = mstart[ok], mlen[ok]
    mol_ids = np.flatnonzero(ok)
    M = len(mstart)
    R = reads_per_molecule

    bc_of_mol = mol_ids.copy()
    if collision_rate > 0 and M > 1:
        hit = rng.random(M) < collision_rate
        bc_of_mol[hit] = bc_of_mol[rng.integers(0, M, int(hit.sum()))]

    span = (mlen - insert + 1).astype(np.int64)
    starts = mstart[:, None] + (rng.random((M, R)) * span[:, None]).astype(np.int64)
    if chimera_rate > 0 and M > 1:
        chim = rng.random(M) < chimera_rate
        n_c = int(chim.sum())
        if n_c:
            alt = rng.integers(0, max(G - molecule_len, 1) + 1, n_c)
            alt_len = np.minimum(molecule_len, G - alt)
            keep = alt_len >= insert + 1
            alt_span = (alt_len - insert + 1).astype(np.int64)
            half = R // 2
            alt_starts = alt[:, None] + (
                rng.random((n_c, R - half)) * alt_span[:, None]).astype(np.int64)
            rows = np.flatnonzero(chim)[keep]
            starts[rows, half:] = alt_starts[keep]
    starts = starts.ravel()
    bcs = np.repeat(bc_of_mol, R)
    N = len(starts)

    frag = genome[starts[:, None] + np.arange(insert)[None, :]]
    fwd = np.ascontiguousarray(frag[:, :read_len])
    rev = np.ascontiguousarray((3 - frag)[:, ::-1][:, :read_len])
    swap = rng.random(N) < 0.5
    r1 = np.where(swap[:, None], rev, fwd).astype(np.uint8)
    r2 = np.where(swap[:, None], fwd, rev).astype(np.uint8)
    if error_rate > 0:
        for arr in (r1, r2):
            errs = rng.random(arr.shape) < error_rate
            arr[errs] = (arr[errs] + rng.integers(1, 4, int(errs.sum()))) % 4
    lengths = np.full(N, read_len, np.int32)
    return r1, r2, lengths, lengths.copy(), bcs.astype(np.int64)


def gc_skewed_genome(n: int, gc: float = 0.65, seed: int = 0) -> np.ndarray:
    """Genome with biased base composition (real genomes are not
    uniform; E. coli is ~0.51 GC, some bacteria 0.25-0.75)."""
    rng = np.random.default_rng(seed)
    # codes: A=0 C=1 G=2 T=3
    p = np.array([(1 - gc) / 2, gc / 2, gc / 2, (1 - gc) / 2])
    return rng.choice(4, size=n, p=p).astype(np.uint8)


def mutate_identity(seq: np.ndarray, identity: float, seed: int = 0) -> np.ndarray:
    """Substitute bases so the copy is ~identity similar to seq."""
    rng = np.random.default_rng(seed)
    out = seq.copy()
    m = rng.random(len(seq)) > identity
    out[m] = (out[m] + rng.integers(1, 4, int(m.sum()))) % 4
    return out.astype(np.uint8)


def genome_with_repeat_family(
    n_segments: int = 4,
    segment_len: int = 8000,
    repeat_len: int = 2000,
    identity: float = 0.95,
    seed: int = 0,
) -> np.ndarray:
    """Unique segments interleaved with near-identical repeat-family
    copies (the hard case for real assemblers: 90-98%-identity repeats
    collapse or misjoin if resolution is weak)."""
    rng = np.random.default_rng(seed)
    base_rep = random_genome(repeat_len, seed=seed + 1000)
    parts = []
    for i in range(n_segments):
        parts.append(random_genome(segment_len, seed=seed + i))
        if i < n_segments - 1:
            parts.append(mutate_identity(base_rep, identity, seed=seed + 2000 + i))
    return np.concatenate(parts)


def apply_indel_errors(
    reads: np.ndarray, lengths: np.ndarray,
    sub_rate: float = 0.008, indel_rate: float = 0.002, seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Realistic error model: substitutions + insertions/deletions.
    Returns new (reads, lengths) with per-read variable lengths (padded
    with 255 to the original width)."""
    rng = np.random.default_rng(seed)
    N, L = reads.shape
    out = np.full((N, L), 255, np.uint8)
    out_len = np.zeros(N, np.int32)
    for i in range(N):
        seq = list(reads[i, : lengths[i]])
        # substitutions
        j = 0
        res = []
        while j < len(seq):
            r = rng.random()
            if r < indel_rate / 2:        # deletion
                j += 1
                continue
            if r < indel_rate:            # insertion
                res.append(int(rng.integers(0, 4)))
                # current base still emitted below
            b = seq[j]
            if rng.random() < sub_rate:
                b = (b + int(rng.integers(1, 4))) % 4
            res.append(b)
            j += 1
        res = res[:L]
        out[i, : len(res)] = res
        out_len[i] = len(res)
    return out, out_len


def codes_to_str(codes: np.ndarray) -> str:
    return ACGT[codes].tobytes().decode()


def str_to_codes(s: str) -> np.ndarray:
    m = {"A": 0, "C": 1, "G": 2, "T": 3}
    return np.array([m.get(c, 4) for c in s], np.uint8)


def canonical_str(s: str) -> str:
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    rc = "".join(comp[c] for c in reversed(s))
    return min(s, rc)


def brute_force_unitigs(reads_str, k: int):
    """Textbook sequential DBG + unitig walk, used as the oracle for the
    vectorized builder.  Returns the sorted set of canonical unitig
    sequences."""
    kedges = {}
    for r in reads_str:
        for i in range(len(r) - k):
            km = r[i : i + k + 1]
            if any(c not in "ACGT" for c in km):
                continue
            c = canonical_str(km)
            kedges[c] = kedges.get(c, 0) + 1

    # adjacency over directed k-mers
    out_edges = {}
    in_deg = {}
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}

    def rc(s):
        return "".join(comp[c] for c in reversed(s))

    for ke in kedges:
        for s in (ke, rc(ke)):
            pre, suf = s[:k], s[1:]
            out_edges.setdefault(pre, set()).add(s)
            in_deg[suf] = in_deg.get(suf, 0) + 1

    def outdeg(km_):
        return len(out_edges.get(km_, ()))

    def indeg(km_):
        return in_deg.get(km_, 0)

    unitigs = set()
    visited = set()
    # heads: directed kedges whose source k-mer is not interior (1,1)
    all_dir = [s for ke in kedges for s in ({ke, rc(ke)})]
    for d in all_dir:
        pre = d[:k]
        if indeg(pre) == 1 and outdeg(pre) == 1:
            continue  # not a head
        if d in visited:
            continue
        seq = d
        visited.add(d)
        cur = d
        while True:
            t = cur[1:]
            if not (indeg(t) == 1 and outdeg(t) == 1):
                break
            nxt = next(iter(out_edges[t]))
            if nxt == cur or nxt in visited:
                break
            seq += nxt[-1]
            visited.add(nxt)
            cur = nxt
        unitigs.add(canonical_str(seq))
    # cycles: remaining unvisited directed kedges form pure cycles
    for d in all_dir:
        if d in visited:
            continue
        seq = d
        visited.add(d)
        cur = d
        while True:
            t = cur[1:]
            nxt = next(iter(out_edges[t]))
            if nxt in visited:
                break
            seq += nxt[-1]
            visited.add(nxt)
            cur = nxt
        unitigs.add(canonical_str(seq))
    return sorted(unitigs)
