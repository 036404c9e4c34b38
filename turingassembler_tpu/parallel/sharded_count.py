"""Hash-partitioned k-mer counting across a device mesh.

The "distributed training step" of this framework: each device extracts
canonical (k+1)-mers from its local read batch, routes every k-mer to
the device owning its hash shard with one `all_to_all`, and each shard
then counts its k-mers with a local sort + run-length encode.  This
replaces the reference's striped-lock shared hash table (src/kmhash.c)
with a communication-avoiding owner-computes layout: a k-mer's counts
only ever exist on one device, so no locks, no atomics, and merges are
pure `psum`/`all_to_all` collectives that ride ICI.

Layout notes:
- routing uses sort-by-shard + fixed per-destination capacity buffers
  (static shapes; overflow is counted and psum'd so the caller can grow
  capacity — the analogue of kmhash's stop-the-world resize,
  src/kmhash.c:376-409, but observable instead of blocking);
- the local count output stays sharded; downstream graph construction
  consumes it shard-by-shard (k-mer space is disjoint across devices).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import kmers as km
from ..ops import limbs as lb
from ..ops import sortops as so


def _route_and_count(bases, lengths, *, k1: int, axis: str, cap_per_dest: int):
    """Per-device body (runs under shard_map)."""
    n_shards = jax.lax.axis_size(axis)

    canon, _, valid = km.extract_canonical_kmers(bases, lengths, k1)
    nl = canon.shape[-1]
    flat = canon.reshape(-1, nl)
    vflat = valid.reshape(-1)
    n = flat.shape[0]

    shard = (lb.hash_limbs(flat) % jnp.uint32(n_shards)).astype(jnp.int32)
    shard = jnp.where(vflat, shard, n_shards)  # invalids route nowhere

    # sort rows by destination shard
    order = jnp.argsort(shard)
    shard_s = shard[order]
    flat_s = flat[order]

    # position of each row within its destination run
    ones = jnp.ones_like(shard_s)
    start_of = jnp.searchsorted(shard_s, jnp.arange(n_shards + 1, dtype=shard_s.dtype))
    pos_in_run = jnp.arange(n, dtype=jnp.int32) - start_of[jnp.clip(shard_s, 0, n_shards)]

    # scatter into (n_shards, cap) send buffer; overflow and invalid drop
    send = jnp.zeros((n_shards * cap_per_dest, nl), jnp.uint32)
    send_valid = jnp.zeros((n_shards * cap_per_dest,), jnp.bool_)
    in_range = (shard_s < n_shards) & (pos_in_run < cap_per_dest)
    slot = jnp.where(in_range, shard_s * cap_per_dest + pos_in_run, n_shards * cap_per_dest)
    send = send.at[slot, :].set(flat_s, mode="drop")
    send_valid = send_valid.at[slot].set(in_range, mode="drop")
    n_dropped = jnp.sum((shard_s < n_shards) & (pos_in_run >= cap_per_dest))

    # exchange: block b goes to device b
    recv = jax.lax.all_to_all(send.reshape(n_shards, cap_per_dest, nl),
                              axis, split_axis=0, concat_axis=0, tiled=False)
    recv_valid = jax.lax.all_to_all(send_valid.reshape(n_shards, cap_per_dest),
                                    axis, split_axis=0, concat_axis=0, tiled=False)
    recv = recv.reshape(n_shards * cap_per_dest, nl)
    recv_valid = recv_valid.reshape(-1)

    uniq, counts, n_unique = so.sort_unique_count(recv, recv_valid)
    total_dropped = jax.lax.psum(n_dropped, axis)
    total_kmers = jax.lax.psum(jnp.sum(vflat.astype(jnp.int32)), axis)
    return uniq, counts, n_unique[None], total_dropped, total_kmers


@functools.partial(jax.jit, static_argnames=("mesh", "k", "cap_per_dest", "axis"))
def sharded_count_step(bases, lengths, *, mesh: Mesh, k: int,
                       cap_per_dest: int, axis: str = "shard"):
    """One distributed counting step.

    bases:   (D*B, L) uint8, sharded over devices on axis 0
    lengths: (D*B,)   int32, likewise
    Returns per-shard (uniq, counts, n_unique) plus global drop/total
    telemetry.  Outputs keep the shard dimension (D*, ...) so k-mer space
    stays partitioned.
    """
    body = functools.partial(_route_and_count, k1=k + 1, axis=axis,
                             cap_per_dest=cap_per_dest)
    f = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(axis), P(axis), P(), P()),
    )
    return f(bases, lengths)


def device_put_sharded_batch(bases: np.ndarray, lengths: np.ndarray, mesh: Mesh,
                             axis: str = "shard"):
    """Place a host batch onto the mesh, sharded by read."""
    sh = NamedSharding(mesh, P(axis, None))
    sh1 = NamedSharding(mesh, P(axis))
    return jax.device_put(bases, sh), jax.device_put(lengths, sh1)


def sharded_count_to_host(bases: np.ndarray, lengths: np.ndarray, mesh: Mesh,
                          k: int, cap_per_dest: int | None = None,
                          axis: str = "shard"):
    """Host convenience wrapper: run one sharded step and gather the
    merged (kedges, counts) to host numpy (sorted unique across shards —
    shard tables are disjoint, so concatenation + host merge sort)."""
    D = mesh.devices.size
    B, L = bases.shape
    assert B % D == 0, "batch must divide evenly over devices"
    if cap_per_dest is None:
        per_dev_kmers = (B // D) * (L - k)
        cap_per_dest = int(2.2 * per_dev_kmers / D) + 64
    db, dl = device_put_sharded_batch(bases, lengths, mesh, axis)
    uniq, counts, n_unique, dropped, total = sharded_count_step(
        db, dl, mesh=mesh, k=k, cap_per_dest=cap_per_dest, axis=axis)
    if int(dropped) > 0:
        raise RuntimeError(f"sharded_count: {int(dropped)} k-mers dropped; "
                           f"raise cap_per_dest (current {cap_per_dest})")
    uniq = np.asarray(uniq)
    counts = np.asarray(counts)
    nu = np.asarray(n_unique)
    per_dev = uniq.shape[0] // D
    runs = []
    for d in range(D):
        nd = int(nu[d])
        runs.append((uniq[d * per_dev : d * per_dev + nd],
                     counts[d * per_dev : d * per_dev + nd].astype(np.int64)))
    return so.np_merge_count_runs(runs)


# ---------------------------------------------------------------------------
# hash-engine variant: per-shard open-addressing tables as sharded state
# (the multi-chip mirror of ops/devhash.py — same insert body per shard,
# with the all_to_all k-mer routing in front)
# ---------------------------------------------------------------------------

def _route_and_insert(keys_state, counts_state, bases, lengths, *,
                      k1: int, axis: str, cap_per_dest: int):
    """shard_map body: route k-mers to owner shards, insert into the
    local hash table."""
    from ..ops.devhash import _insert_body

    n_shards = jax.lax.axis_size(axis)
    canon, _, valid = km.extract_canonical_kmers(bases, lengths, k1)
    nl = canon.shape[-1]
    flat = canon.reshape(-1, nl)
    vflat = valid.reshape(-1)
    n = flat.shape[0]

    shard = (lb.hash_limbs(flat, seed=0x51ED270B) % jnp.uint32(n_shards)).astype(jnp.int32)
    shard = jnp.where(vflat, shard, n_shards)
    order = jnp.argsort(shard)
    shard_s = shard[order]
    flat_s = flat[order]
    start_of = jnp.searchsorted(shard_s, jnp.arange(n_shards + 1, dtype=shard_s.dtype))
    pos_in_run = jnp.arange(n, dtype=jnp.int32) - start_of[jnp.clip(shard_s, 0, n_shards)]
    send = jnp.zeros((n_shards * cap_per_dest, nl), jnp.uint32)
    send_valid = jnp.zeros((n_shards * cap_per_dest,), jnp.bool_)
    in_range = (shard_s < n_shards) & (pos_in_run < cap_per_dest)
    slot = jnp.where(in_range, shard_s * cap_per_dest + pos_in_run,
                     n_shards * cap_per_dest)
    send = send.at[slot, :].set(flat_s, mode="drop")
    send_valid = send_valid.at[slot].set(in_range, mode="drop")
    n_dropped = jnp.sum((shard_s < n_shards) & (pos_in_run >= cap_per_dest))

    recv = jax.lax.all_to_all(send.reshape(n_shards, cap_per_dest, nl),
                              axis, split_axis=0, concat_axis=0, tiled=False)
    recv_valid = jax.lax.all_to_all(send_valid.reshape(n_shards, cap_per_dest),
                                    axis, split_axis=0, concat_axis=0, tiled=False)
    recv = recv.reshape(n_shards * cap_per_dest, nl)
    recv_valid = recv_valid.reshape(-1)

    # keys_state arrives as the local block (1, n_arrays, C)
    local = keys_state[0]
    keys_t = tuple(local[i] for i in range(local.shape[0]))
    new_keys, new_counts, ovf = _insert_body(keys_t, counts_state, recv,
                                             recv_valid, cap_frac=1)
    total_dropped = jax.lax.psum(n_dropped, axis)
    return (jnp.stack(new_keys)[None], new_counts, ovf[None],
            total_dropped)


class ShardedHashCounter:
    """Mesh-wide k-mer counter: k-mer space hash-partitioned across the
    devices of `mesh`, each shard holding an independent device hash
    table (ops/devhash.py).  Counts for a k-mer exist on exactly one
    device — merges are pure collectives, no locks."""

    def __init__(self, mesh: Mesh, k: int, capacity_log2: int,
                 cap_per_dest: int, axis: str = "shard"):
        from ..ops import limbs as lbops
        from ..ops.devhash import SENTINEL
        self.mesh = mesh
        self.k = k
        self.axis = axis
        self.cap_per_dest = cap_per_dest
        D = mesh.devices.size
        nl = lbops.n_limbs(k + 1)
        self.n_arrays = 2 + nl
        C = 1 << capacity_log2
        sh2 = NamedSharding(mesh, P(axis, None, None))
        sh1 = NamedSharding(mesh, P(axis))
        import numpy as _np
        self.keys = jax.device_put(
            _np.full((D, self.n_arrays, C), SENTINEL, _np.uint32), sh2)
        self.counts = jax.device_put(_np.zeros((D * C,), _np.int32), sh1)
        self._ovf = np.zeros((), np.int64)

        body = functools.partial(_route_and_insert, k1=k + 1, axis=axis,
                                 cap_per_dest=cap_per_dest)
        self._step = jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(P(axis, None, None), P(axis), P(axis, None), P(axis)),
            out_specs=(P(axis, None, None), P(axis), P(axis), P()),
        ), donate_argnums=(0, 1))

    def insert_batch(self, bases: np.ndarray, lengths: np.ndarray) -> None:
        db, dl = device_put_sharded_batch(bases, lengths, self.mesh, self.axis)
        self.keys, self.counts, ovf, dropped = self._step(
            self.keys, self.counts, db, dl)
        self._ovf = self._ovf + np.asarray(ovf).sum() + int(dropped)

    def finalize(self):
        """Gather all shard tables to host, merge (disjoint key spaces)."""
        if int(self._ovf) > 0:
            raise RuntimeError(
                f"ShardedHashCounter overflow ({int(self._ovf)}); grow "
                f"capacity or cap_per_dest")
        keys = np.asarray(self.keys)     # (D, n_arrays, C)
        counts = np.asarray(self.counts).reshape(keys.shape[0], -1)
        runs = []
        for d in range(keys.shape[0]):
            live = counts[d] > 0
            payload = keys[d, 2:, :].T[live]
            runs.append((np.ascontiguousarray(payload),
                         counts[d][live].astype(np.int64)))
        return so.np_merge_count_runs(runs)
