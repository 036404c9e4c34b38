"""Batched k-mer window extraction (the streaming replacement for KMC).

The reference counts canonical (k+1)-mers with the external KMC library
(include/kmc_skipping.h:8-11) and walks reads byte-by-byte.  Here a
batch of padded reads is turned into *all* k-windows at once with k
shifted-OR vector ops — fully parallel on the VPU, fused by XLA — and
canonicalized against the reverse-complement read.  Downstream counting
is sort + run-length (see sortops.py), replacing kmhash's striped-lock
CAS insert loop (src/kmhash.c:182-222).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as lb

U32 = jnp.uint32


def complement_bases(bases):
    """3 - b for valid bases, invalid codes stay invalid (>=4)."""
    return jnp.where(bases < 4, 3 - bases, bases).astype(bases.dtype)


def _pack_windows(bases, k: int):
    """All k-windows of each read, packed.

    bases: (B, L) uint8 codes.  Returns (B, P, nl) uint32 with
    P = L - k + 1.  Invalid bases pack as 0; validity tracked separately.
    """
    B, L = bases.shape
    P = L - k + 1
    b = jnp.where(bases < 4, bases, 0).astype(U32)
    nl = lb.n_limbs(k)
    out = []
    for l in range(nl):
        j0, j1 = l * 16, min(k, (l + 1) * 16)
        acc = jnp.zeros((B, P), U32)
        for j in range(j0, j1):
            _, sh = lb.base_shift(j)
            acc = acc | (jax.lax.dynamic_slice_in_dim(b, j, P, axis=1) << np.uint32(sh))
        out.append(acc)
    return jnp.stack(out, axis=-1)


def window_validity(bases, lengths, k: int):
    """(B, P) bool: window contains no invalid base and fits in the read."""
    B, L = bases.shape
    P = L - k + 1
    bad = (bases >= 4).astype(jnp.int32)
    cum = jnp.cumsum(bad, axis=1)
    cum = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), cum], axis=1)
    n_bad = cum[:, k:] - cum[:, :P]
    pos = jnp.arange(P, dtype=jnp.int32)[None, :]
    return (n_bad == 0) & (pos + k <= lengths[:, None])


@functools.partial(jax.jit, static_argnames=("k",))
def extract_canonical_kmers(bases, lengths, k: int):
    """Canonical k-mers of every window of every read.

    bases:   (B, L) uint8 codes (A0 C1 G2 T3, >=4 invalid/pad)
    lengths: (B,)   int32 true read lengths
    Returns (canon (B,P,nl) uint32, is_rc (B,P) bool, valid (B,P) bool).
    """
    fw = _pack_windows(bases, k)
    # window p of the fw read corresponds to window P-1-p of the rc read
    rc_read = complement_bases(bases[:, ::-1])
    rc = _pack_windows(rc_read, k)[:, ::-1, :]
    is_rc = lb.lex_lt(rc, fw)
    canon = jnp.where(is_rc[..., None], rc, fw)
    valid = window_validity(bases, lengths, k)
    return canon, is_rc, valid


def split_kedge(kedge_limbs, k: int):
    """Prefix and suffix k-mers of packed (k+1)-mers.

    The reference splits each counted (k+1)-mer ("k-edge") into its left
    and right k-mers to discover DBG nodes (src/kmer_build.c:78-129,
    kedge_get_left/right src/kmer.h:81-101).  Left k-mer = bases[0..k),
    right = bases[1..k+1).  Works on any batch shape (..., nl_{k+1}).
    """
    nl_in = lb.n_limbs(k + 1)
    nl_out = lb.n_limbs(k)
    used = 2 * k - 32 * (nl_out - 1)  # bits used in last output limb
    last_mask = np.uint32(((1 << used) - 1) << (32 - used)) if used < 32 else np.uint32(0xFFFFFFFF)

    # prefix: same alignment, just truncate to k bases
    pre_cols = [kedge_limbs[..., l] for l in range(nl_out)]
    pre_cols[nl_out - 1] = pre_cols[nl_out - 1] & last_mask
    prefix = jnp.stack(pre_cols, axis=-1)

    # suffix: shift whole thing left by one base (2 bits) then truncate
    suf_cols = []
    for l in range(nl_out):
        hi = kedge_limbs[..., l] << np.uint32(2)
        lo = (kedge_limbs[..., l + 1] >> np.uint32(30)) if l + 1 < nl_in else jnp.zeros_like(hi)
        suf_cols.append(hi | lo)
    suf_cols[nl_out - 1] = suf_cols[nl_out - 1] & last_mask
    suffix = jnp.stack(suf_cols, axis=-1)
    return prefix, suffix


def kedge_first_base(kedge_limbs):
    """Base 0 of a packed (k+1)-mer (any k>=16 ... works for all: bit 30-31 of limb 0)."""
    return ((kedge_limbs[..., 0] >> np.uint32(30)) & np.uint32(3)).astype(jnp.uint8)


def kedge_last_base(kedge_limbs, k: int):
    """Base k (the last) of a packed (k+1)-mer."""
    l, sh = lb.base_shift(k)
    return ((kedge_limbs[..., l] >> np.uint32(sh)) & np.uint32(3)).astype(jnp.uint8)
