"""Multi-limb uint32 k-mer representation.

The reference packs k-mers 4 bases/byte with the *last* base at the LSB,
so numeric comparison == lexicographic comparison on the base string
(src/kmer.h:8-125, km_cmp compares high bytes first).  TPUs emulate
64-bit integers with 32-bit pairs, so instead of uint64/uint8 arrays we
represent a k-mer as `nl = ceil(k/16)` uint32 *limbs*, limb 0 most
significant.  Base j (0-based from the 5' end) occupies bits
[30 - (2j mod 32), 31 - (2j mod 32)] of limb (2j // 32); unused low bits
of the last limb are zero.  Lexicographic order on base strings is then
exactly limbwise-lexicographic numeric order — which is what
`jax.lax.sort` with `num_keys=nl` gives us natively.

Encoding: A=0 C=1 G=2 T=3, complement = 3 - x (reference km_get_rc
xors 0xFF, src/kmer.h:115-127).  Invalid/N bases are code >= 4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32


def n_limbs(k: int) -> int:
    """Number of uint32 limbs needed for a k-mer."""
    return (k + 15) // 16


def base_shift(j: int) -> tuple:
    """(limb index, left-shift) for base j of a k-mer."""
    return (2 * j) // 32, 30 - ((2 * j) % 32)


def pack_bases(bases, k: int):
    """Pack base codes (..., k) uint8/int32 -> limbs (..., nl) uint32.

    Invalid codes (>=4) are masked to 0; callers must track validity
    separately.
    """
    nl = n_limbs(k)
    b = jnp.where(bases < 4, bases, 0).astype(U32)
    limbs = []
    for l in range(nl):
        j0, j1 = l * 16, min(k, (l + 1) * 16)
        acc = jnp.zeros(bases.shape[:-1], U32)
        for j in range(j0, j1):
            _, sh = base_shift(j)
            acc = acc | (b[..., j] << np.uint32(sh))
        limbs.append(acc)
    return jnp.stack(limbs, axis=-1)


def unpack_limbs(limbs, k: int):
    """limbs (..., nl) uint32 -> base codes (..., k) uint8."""
    cols = []
    for j in range(k):
        l, sh = base_shift(j)
        cols.append(((limbs[..., l] >> np.uint32(sh)) & np.uint32(3)).astype(jnp.uint8))
    return jnp.stack(cols, axis=-1)


def _rev2bits_in_u32(x):
    """Reverse the sixteen 2-bit groups inside each uint32 lane."""
    x = ((x & np.uint32(0x33333333)) << 2) | ((x >> 2) & np.uint32(0x33333333))
    x = ((x & np.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & np.uint32(0x0F0F0F0F))
    x = ((x & np.uint32(0x00FF00FF)) << 8) | ((x >> 8) & np.uint32(0x00FF00FF))
    x = (x << 16) | (x >> 16)
    return x


def revcomp_limbs(limbs, k: int):
    """Reverse-complement of packed k-mers, without unpacking.

    Complement = bitwise NOT on used bits; reversal = reverse 2-bit
    groups within each limb, reverse limb order, then left-align (shift
    out the 32*nl - 2k pad bits that end up at the top).
    """
    nl = n_limbs(k)
    pad_bits = 32 * nl - 2 * k
    # complement + in-limb 2-bit reversal, then reverse limb order
    rev = _rev2bits_in_u32(~limbs)[..., ::-1]
    if pad_bits == 0:
        out = rev
    else:
        sh = np.uint32(pad_bits)
        ish = np.uint32(32 - pad_bits)
        out_cols = []
        for l in range(nl):
            hi = rev[..., l] << sh
            lo = (rev[..., l + 1] >> ish) if l + 1 < nl else jnp.zeros_like(hi)
            out_cols.append(hi | lo)
        out = jnp.stack(out_cols, axis=-1)
    # zero the pad bits of the last limb (complement set them)
    used = 2 * k - 32 * (nl - 1)
    if used < 32:
        mask = np.uint32(((1 << used) - 1) << (32 - used))
        out = out.at[..., nl - 1].set(out[..., nl - 1] & mask)
    return out


def lex_lt(a, b):
    """Lexicographic a < b over the last (limb) axis."""
    lt = jnp.zeros(a.shape[:-1], bool)
    eq = jnp.ones(a.shape[:-1], bool)
    for l in range(a.shape[-1]):
        lt = lt | (eq & (a[..., l] < b[..., l]))
        eq = eq & (a[..., l] == b[..., l])
    return lt


def lex_eq(a, b):
    return jnp.all(a == b, axis=-1)


def lex_le(a, b):
    return lex_lt(a, b) | lex_eq(a, b)


def canonicalize(limbs, k: int):
    """Return (canonical limbs, is_rc) — min(kmer, revcomp(kmer)).

    is_rc is True where the reverse complement was the smaller form.
    Matches the reference's canonical-form convention (kmhash stores
    min(fw, rv), src/kmer_build.c:78-129).
    """
    rc = revcomp_limbs(limbs, k)
    is_rc = lex_lt(rc, limbs)
    canon = jnp.where(is_rc[..., None], rc, limbs)
    return canon, is_rc


def hash_limbs(limbs, seed: int = 0x9E3779B9):
    """32-bit murmur3-style mix of all limbs -> uint32 hash.

    Replaces MurmurHash3_x64_64 (reference src/kmhash.c:100-158) for
    shard assignment; only distribution quality matters, not the exact
    hash values.
    """
    h = jnp.full(limbs.shape[:-1], np.uint32(seed), U32)
    for l in range(limbs.shape[-1]):
        x = limbs[..., l]
        x = x * np.uint32(0xCC9E2D51)
        x = (x << 15) | (x >> 17)
        x = x * np.uint32(0x1B873593)
        h = h ^ x
        h = (h << 13) | (h >> 19)
        h = h * np.uint32(5) + np.uint32(0xE6546B64)
    h = h ^ (h >> 16)
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * np.uint32(0xC2B2AE35)
    h = h ^ (h >> 16)
    return h


# ---------------------------------------------------------------------------
# numpy twins (host-side graph code paths)
# ---------------------------------------------------------------------------

def np_pack_bases(bases: np.ndarray, k: int) -> np.ndarray:
    nl = n_limbs(k)
    b = np.where(bases < 4, bases, 0).astype(np.uint32)
    out = np.zeros(bases.shape[:-1] + (nl,), np.uint32)
    for j in range(k):
        l, sh = base_shift(j)
        out[..., l] |= b[..., j] << np.uint32(sh)
    return out


def np_unpack_limbs(limbs: np.ndarray, k: int) -> np.ndarray:
    out = np.zeros(limbs.shape[:-1] + (k,), np.uint8)
    for j in range(k):
        l, sh = base_shift(j)
        out[..., j] = (limbs[..., l] >> np.uint32(sh)) & 3
    return out


def np_revcomp_limbs(limbs: np.ndarray, k: int) -> np.ndarray:
    bases = np_unpack_limbs(limbs, k)
    return np_pack_bases(3 - bases[..., ::-1], k)


def np_lex_lt(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lt = np.zeros(a.shape[:-1], bool)
    eq = np.ones(a.shape[:-1], bool)
    for l in range(a.shape[-1]):
        lt |= eq & (a[..., l] < b[..., l])
        eq &= a[..., l] == b[..., l]
    return lt


def np_lexsort_rows(limbs: np.ndarray):
    """Row order sorting limb rows lexicographically (limb 0 primary)."""
    return np.lexsort(tuple(limbs[:, l] for l in range(limbs.shape[1] - 1, -1, -1)))


def np_revcomp_limbs_fast(limbs: np.ndarray, k: int) -> np.ndarray:
    """Bitwise reverse-complement (numpy port of revcomp_limbs: no
    per-base loops — in-limb 2-bit reversal + limb reversal + realign)."""
    nl = n_limbs(k)
    x = (~limbs).astype(np.uint32)
    x = ((x & np.uint32(0x33333333)) << 2) | ((x >> 2) & np.uint32(0x33333333))
    x = ((x & np.uint32(0x0F0F0F0F)) << 4) | ((x >> 4) & np.uint32(0x0F0F0F0F))
    x = ((x & np.uint32(0x00FF00FF)) << 8) | ((x >> 8) & np.uint32(0x00FF00FF))
    x = ((x << np.uint32(16)) | (x >> np.uint32(16))).astype(np.uint32)
    rev = x[..., ::-1]
    pad_bits = 32 * nl - 2 * k
    if pad_bits:
        sh = np.uint32(pad_bits)
        ish = np.uint32(32 - pad_bits)
        out = np.empty_like(rev)
        for l in range(nl):
            hi = rev[..., l] << sh
            lo = (rev[..., l + 1] >> ish) if l + 1 < nl else np.uint32(0)
            out[..., l] = hi | lo
    else:
        out = rev.copy()
    used = 2 * k - 32 * (nl - 1)
    if used < 32:
        out[..., nl - 1] &= np.uint32(((1 << used) - 1) << (32 - used))
    return out


def np_split_kedge(kedges: np.ndarray, k: int):
    """(prefix, suffix) k-mers of packed (k+1)-mers — numpy bitwise port
    of kmers.split_kedge."""
    nl_in = kedges.shape[-1]
    nl_out = n_limbs(k)
    used = 2 * k - 32 * (nl_out - 1)
    last_mask = np.uint32(((1 << used) - 1) << (32 - used)) if used < 32 \
        else np.uint32(0xFFFFFFFF)
    prefix = kedges[..., :nl_out].copy()
    prefix[..., nl_out - 1] &= last_mask
    suffix = np.empty_like(prefix)
    for l in range(nl_out):
        hi = kedges[..., l] << np.uint32(2)
        lo = (kedges[..., l + 1] >> np.uint32(30)) if l + 1 < nl_in else np.uint32(0)
        suffix[..., l] = hi | lo
    suffix[..., nl_out - 1] &= last_mask
    return prefix, suffix


def np_base_at(limbs: np.ndarray, j: int) -> np.ndarray:
    """Base j of each packed row."""
    l, sh = base_shift(j)
    return ((limbs[..., l] >> np.uint32(sh)) & np.uint32(3)).astype(np.uint8)
