"""Hash-sharded spectrum: counting and ranks for k too large to replicate.

At k=15 the dense spectrum is 4^15 ints = 4 GB — replicating it per chip
(parallel/pipeline.py's psum path) stops making sense around k=13.  Here
the table is sharded by HIGH code bits across the mesh's ``data`` axis:
device d owns codes in [d, d+1) * 4^k / n_dev.  This is the SURVEY §5.8
design: all-to-all of (code) updates + local scatter, then rank statistics
via count-value histograms + psum instead of a distributed sort.

Counting (count_sharded_step):
  1. each device computes its genome shard's codes (blocked, haloed);
  2. codes sort by owner device; fixed-capacity buckets ride
     lax.all_to_all (capacity overflow is detected and reported, never
     silently dropped);
  3. every device scatter-adds the codes it received into its spectrum
     shard.

Ranks (sharded_rank_mass):
  rank mass m_i = (mass of counts < c_i globally)
                + (mass of counts == c_i in lower shards)
                + (mass of counts == c_i at lower index in this shard).
  High-bit sharding makes shard order == index order, so the reference's
  stable (count, index) sort order decomposes exactly like this.  The
  count-VALUE histogram (bins 0..vmax, psum'd) gives the first two terms;
  a local cumulative sum gives the third.  Count values >= vmax would need
  a sparse exact pass — they are detected and flagged (clip_overflow).

Reference parity: rank_kmers_w (src/kmer_spans.c:189-202) via the closed
form of SURVEY §7.3.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def _owner_shift(k: int, n_dev: int) -> int:
    ld = n_dev.bit_length() - 1
    if (1 << ld) != n_dev:
        raise ValueError("device count must be a power of two")
    if 2 * k < ld:
        raise ValueError("4^k smaller than device count")
    return 2 * k - ld


def make_sharded_count_step(
    mesh: Mesh, k: int, axis: str = "data", block: int = 512,
    bucket_cap: int | None = None,
):
    """Jitted step: (bases u8 [n], valid bool [n]) ->
    (shard_counts i32 [4^k] sharded over axis, overflow bool).

    bucket_cap: per-destination bucket capacity per device; default
    2x the balanced share.  Overflowing buckets set the overflow flag
    (results then undercount — caller must retry with a larger cap).
    """
    n_dev = mesh.devices.size
    shift = _owner_shift(k, n_dev)
    size = 1 << (2 * k)
    shard = size // n_dev

    def body(bases, valid):
        from ..ops.blocked import blocked_codes

        me = jax.lax.axis_index(axis)
        n_local = bases.shape[0]
        nb = n_local // block
        halo = k - 1
        fwd = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        hb = jax.lax.ppermute(bases[-halo:], axis, fwd) if halo else None
        hv = None
        if halo:
            hv = jax.lax.ppermute(valid[-halo:], axis, fwd)
            hv = jnp.where(me == 0, False, hv)
        b2 = bases.astype(jnp.int32).reshape(nb, block)
        v2 = valid.reshape(nb, block)
        codes, kv = blocked_codes(b2, v2, k, first_bases=hb, first_valid=hv)
        flat = jnp.where(kv, codes, -1).reshape(-1)  # -1: invalid

        cap = bucket_cap or (2 * n_local // n_dev)
        owner = jnp.where(flat >= 0, flat >> shift, n_dev)  # invalid -> sink
        # stable sort by owner brings each destination's codes together
        owner_s, codes_s = jax.lax.sort((owner, flat), num_keys=1)
        idx = jnp.arange(n_local, dtype=jnp.int32)
        # rank within each owner group = idx - first index of the group
        is_head = jnp.concatenate(
            [jnp.ones((1,), bool), owner_s[1:] != owner_s[:-1]])
        head_pos = jnp.where(is_head, idx, 0)
        group_start = jax.lax.cummax(head_pos)
        rank = idx - group_start
        overflow = jnp.any((rank >= cap) & (owner_s < n_dev))
        # buckets [n_dev, cap]; -1 padding never counted
        dest = jnp.where((owner_s < n_dev) & (rank < cap), owner_s, n_dev)
        slot = jnp.where(rank < cap, rank, 0)
        buckets = jnp.full((n_dev + 1, cap), -1, jnp.int32)
        buckets = buckets.at[dest, slot].set(
            jnp.where(dest < n_dev, codes_s, -1), mode="drop")
        buckets = buckets[:n_dev]
        # all-to-all: row o of my buckets goes to device o
        recv = jax.lax.all_to_all(
            buckets, axis, split_axis=0, concat_axis=0, tiled=False)
        recv = recv.reshape(-1)  # [n_dev * cap] codes owned by me
        base = me.astype(jnp.int32) * shard
        local_idx = recv - base
        ok = recv >= 0
        local_idx = jnp.where(ok, local_idx, shard)  # drop invalid
        counts = jnp.zeros(shard, jnp.int32).at[local_idx].add(
            ok.astype(jnp.int32), mode="drop")
        overflow = jax.lax.pmax(overflow, axis)
        return counts, overflow

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sharded_rank_step(
    mesh: Mesh, k: int, axis: str = "data", vmax: int = 1 << 14
):
    """Jitted step: shard_counts i32 [4^k] (sharded) ->
    (mass i64-as-2xi32? no — f64 not device-friendly; returns mass i32
    [4^k] sharded, clip_overflow bool).

    mass[i] = number of counted k-mer instances strictly before k-mer i in
    the reference's stable (count asc, index asc) order; rank = mass/total.
    Exact for count values < vmax; larger values set clip_overflow.
    """
    n_dev = mesh.devices.size

    def body(shard_counts):
        me = jax.lax.axis_index(axis)
        c = shard_counts
        clipped = jnp.minimum(c, vmax - 1)
        clip_overflow = jax.lax.pmax(jnp.any(c >= vmax), axis)
        # local count-value histogram of MASS (value * multiplicity)
        vh = jnp.zeros(vmax, jnp.int32).at[clipped].add(c)
        global_vh = jax.lax.psum(vh, axis)
        # mass of counts strictly below value v, globally
        below = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(global_vh)[:-1]])
        # mass of equal counts in strictly lower shards: exclusive psum
        # (exclusive prefix over devices = psum of masked contributions)
        ranks_dev = jax.lax.all_gather(vh, axis)  # [n_dev, vmax]
        dev_ids = jnp.arange(n_dev)[:, None]
        earlier = jnp.sum(
            jnp.where(dev_ids < me, ranks_dev, 0), axis=0)  # [vmax]
        # local mass of equal counts at lower local index: grouped running
        # sum over equal values via sort by (value, index)
        m = c.shape[0]
        order = jnp.argsort(clipped, stable=True)
        sorted_c = c[order]
        sorted_clip = clipped[order]
        excl = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(sorted_c)[:-1]])
        # subtract the cumulative mass at each value-group start
        idx = jnp.arange(m, dtype=jnp.int32)
        is_head = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_clip[1:] != sorted_clip[:-1]])
        head_excl = jnp.where(is_head, excl, 0)
        group_base = jax.lax.cummax(
            jnp.where(is_head, excl, -1))
        within = excl - group_base
        local_equal = jnp.zeros(m, jnp.int32).at[order].set(within)
        mass = below[clipped] + earlier[clipped] + local_equal
        return mass, clip_overflow

    sharded = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis),),
        out_specs=(P(axis), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
