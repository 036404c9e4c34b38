"""Super-k-mer counting prototype (VERDICT r4 #5) — numpy correctness
model first: decompose reads into minimizer-grouped super-k-mers,
expand, and verify the k-mer multiset equals direct extraction."""
import numpy as np

M = 11          # minimizer m-mer size

def mmer_hash(bases, m=M):
    # polynomial hash of m-mers per position, uint64 mixed to uint32
    N, L = bases.shape
    P = L - m + 1
    h = np.zeros((N, P), np.uint64)
    for j in range(m):
        h = h * np.uint64(1099511628211) + bases[:, j:j+P].astype(np.uint64)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xff51afd7ed558ccd)
    h ^= h >> np.uint64(33)
    return (h & np.uint64(0xffffffff)).astype(np.uint32)

def superkmers(read, k1, m=M):
    """Decompose one read (1D codes) into super-k-mer (start, n_windows)
    spans: consecutive k1-windows sharing the same minimizer position."""
    L = len(read)
    n_win = L - k1 + 1
    if n_win <= 0:
        return []
    mh = mmer_hash(read[None, :], m)[0]       # (L-m+1,)
    W = k1 - m + 1                            # m-mers per window
    # packed (hash, pos): min picks smallest hash, leftmost pos on ties
    packed = (mh.astype(np.uint64) << np.uint64(32)) | np.arange(len(mh), dtype=np.uint64)
    minpos = np.empty(n_win, np.uint64)
    for p in range(n_win):
        minpos[p] = packed[p:p+W].min()
    spans = []
    start = 0
    for p in range(1, n_win):
        if minpos[p] != minpos[p-1]:
            spans.append((start, p - start))
            start = p
    spans.append((start, n_win - start))
    return spans

def test_correctness():
    rng = np.random.default_rng(0)
    k1 = 46
    reads = rng.integers(0, 4, (200, 120)).astype(np.uint8)
    # direct multiset
    direct = {}
    for r in reads:
        for p in range(len(r) - k1 + 1):
            key = r[p:p+k1].tobytes()
            direct[key] = direct.get(key, 0) + 1
    # super-k-mer route
    via = {}
    span_lens = []
    n_spans = 0
    for r in reads:
        for start, nw in superkmers(r, k1):
            n_spans += 1
            span_lens.append(nw)
            for p in range(start, start + nw):
                key = r[p:p+k1].tobytes()
                via[key] = via.get(key, 0) + 1
    assert direct == via, "multiset mismatch"
    n_win_total = sum(len(r) - k1 + 1 for r in reads)
    print(f"OK: {n_win_total} windows -> {n_spans} super-k-mers "
          f"(ratio {n_win_total/n_spans:.1f}x), max span {max(span_lens)} "
          f"windows = {max(span_lens)+k1-1} bases, "
          f"mean {np.mean(span_lens):.1f}")

if __name__ == "__main__":
    test_correctness()
