"""Super-k-mer device A/B (VERDICT r4 #5): measure the constituent
device primitives of a KMC2-style super-k-mer count at flush scale
(56M window lanes, k1=46) against the shipped one-sort flush
(_sort_count: 3-limb sort + RLE).

Super-k-mer pipeline stages on TPU (static shapes, no scatter):
  A  m-mer hash + rolling-min minimizer + boundary mask   (elementwise)
  B  boundary compaction: u32 single-key sort of 56M lanes (no vector
     scatter on TPU -> compaction IS a sort, NOTES_ROUND4)
  C  span-row gather+funnel-shift -> (S_cap, 7) rows, S_cap 8.4M
  D  super-k-mer sort+RLE: 7-limb sort at 8.4M
  E  expansion: U_cap x 36 padded k-mer lanes (U_cap 2M -> 72M lanes),
     compacted by another u32 sort, then
  F  final 3-limb sort at 16M + weighted RLE
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/turingassembler_tpu/xla"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

def _sync(out):
    # the axon relay's block_until_ready returns before execution
    # completes; a scalar D2H pull is the only reliable sync
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf).ravel()[:1]

def t(fn, *a, n=3):
    _sync(fn(*a))  # compile
    best = 1e9
    for _ in range(n):
        t0 = time.time()
        _sync(fn(*a))
        best = min(best, time.time() - t0)
    return best

def main():
    rng = np.random.default_rng(0)
    LANES = 56_098_816            # the r4 flush size
    B, L, k1, m = 524288, 152, 46, 11
    nwin = L - k1 + 1             # 107
    print(f"lanes {B*nwin:,}")

    from turingassembler_tpu.ops import kmers as km
    from turingassembler_tpu.ops import sortops as so

    bases = rng.integers(0, 4, (B, L)).astype(np.uint8)
    lengths = np.full(B, L, np.int32)
    db = jax.device_put(bases); dl = jax.device_put(lengths)
    jax.block_until_ready(db)

    # --- baseline: extract + 3-limb sort_count flush -------------------
    @jax.jit
    def baseline(bb, ll):
        canon, _, valid = km.extract_canonical_kmers(bb, ll, k1)
        flat = canon.reshape(-1, canon.shape[-1])
        return so.sort_unique_count(flat, valid.reshape(-1))
    t_base = t(baseline, db, dl)
    print(f"baseline extract+sort_count({B*nwin/1e6:.1f}M x3): {t_base:.3f}s")

    # --- A: hash + rolling min + boundary ------------------------------
    @jax.jit
    def stageA(bb):
        pm = km._pack_windows(bb, m)[:, :, 0]          # (B, 142)
        h = pm * jnp.uint32(0x9E3779B1)
        h = h ^ (h >> 15)
        pos = jnp.arange(h.shape[1], dtype=jnp.uint32)[None, :]
        pk = (h & jnp.uint32(0xFFFFFF00)) | (pos & jnp.uint32(0xFF))
        # rolling min over W=36: tree of shifted mins (32 + 4)
        x = pk
        s = 1
        while s < 32:
            x = jnp.minimum(x, jnp.roll(x, -s, axis=1))
            s *= 2
        y = pk
        s = 1
        while s < 4:
            y = jnp.minimum(y, jnp.roll(y, -s, axis=1))
            s *= 2
        mn = jnp.minimum(x[:, :nwin], y[:, 32:32+nwin])
        bnd = jnp.concatenate([jnp.ones((B,1), bool),
                               mn[:,1:] != mn[:,:-1]], axis=1)
        return mn, bnd
    t_A = t(stageA, db)
    mn, bnd = stageA(db)
    n_bnd = int(jnp.sum(bnd))
    print(f"A hash+rollmin+boundary: {t_A:.3f}s  ({n_bnd:,} spans, "
          f"ratio {B*nwin/n_bnd:.1f}x)")

    # --- B: compaction sort (u32 keys, 56M) ----------------------------
    flat_idx = jnp.arange(B*nwin, dtype=jnp.uint32)
    @jax.jit
    def stageB(bndf):
        key = jnp.where(bndf.reshape(-1), flat_idx,
                        flat_idx | jnp.uint32(0x80000000))
        return jax.lax.sort(key)
    t_B = t(stageB, bnd)
    print(f"B compaction u32 sort 56M: {t_B:.3f}s")

    # --- C: span-row gather + shift -> (S_cap, 7) ----------------------
    S_cap = 1 << 23
    starts = stageB(bnd)[:S_cap]
    @jax.jit
    def packreads(bb):
        return km._pack_windows(bb, 152)[:, 0, :]       # (B, 10)
    words = packreads(db)
    t_pack = t(packreads, db)
    wflat = words.reshape(-1)
    @jax.jit
    def stageC(st):
        ridx = (st & jnp.uint32(0x7FFFFFFF)) // nwin
        o = (st & jnp.uint32(0x7FFFFFFF)) % nwin        # base offset
        w0 = ridx * 10 + o // 16
        sh = (o % 16) * 2
        cols = []
        for j in range(7):
            cols.append(wflat[jnp.clip(w0 + j, 0, wflat.shape[0]-1)])
        row = []
        for j in range(6):
            lo = cols[j] >> sh
            hi = jnp.where(sh > 0, cols[j+1] << (32 - sh), 0)
            row.append(lo | hi)
        return jnp.stack(row, axis=-1)
    t_C = t(stageC, starts)
    rows = stageC(starts)
    print(f"C pack {t_pack:.3f}s + span gather/shift (8.4M x 7w): {t_C:.3f}s")

    # --- D: 7-limb sort at 8.4M ---------------------------------------
    lens7 = jnp.ones(S_cap, jnp.uint32)
    @jax.jit
    def stageD(r):
        r7 = jnp.concatenate([r, lens7[:, None]], axis=1)
        s7 = so.sort_by_limbs(r7, jnp.ones(S_cap, jnp.int32))[0]
        return so.unique_counts(s7)
    t_D = t(stageD, rows)
    print(f"D skmer 7-limb sort+RLE 8.4M: {t_D:.3f}s")

    # --- E: padded expansion compaction (u32 sort at 72M) --------------
    E_LANES = (1 << 21) * 36
    eidx = jnp.arange(E_LANES, dtype=jnp.uint32)
    emask = jnp.asarray(rng.random(E_LANES) < 0.15)   # ~11M real lanes
    @jax.jit
    def stageE(msk):
        key = jnp.where(msk, eidx, eidx | jnp.uint32(0x80000000))
        return jax.lax.sort(key)
    t_E = t(stageE, emask)
    print(f"E expansion compaction u32 sort 72M: {t_E:.3f}s")

    # --- F: final 3-limb sort at 16M + weighted RLE --------------------
    F_cap = 1 << 24
    fr = jnp.asarray(rng.integers(0, 2**32, (F_cap, 3), dtype=np.uint64)
                     .astype(np.uint32))
    fw = jnp.ones(F_cap, jnp.int32)
    @jax.jit
    def stageF(r, w):
        s, sw = so.sort_by_limbs(r, w)
        return so.unique_counts(s, weights=sw)
    t_F = t(stageF, fr, fw)
    print(f"F final 3-limb sort+wRLE 16M: {t_F:.3f}s")

    tot = t_A + t_B + t_C + t_D + t_E + t_F + t_pack
    print(f"\nsuper-k-mer pipeline lower bound: {tot:.3f}s "
          f"vs baseline flush {t_base:.3f}s  -> "
          f"{'WIN' if tot < t_base else 'LOSS'} ({t_base/tot:.2f}x)")

if __name__ == "__main__":
    main()
