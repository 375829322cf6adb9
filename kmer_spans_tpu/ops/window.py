"""Windowed k-mer occurrence distributions on device (SURVEY §7.6).

The reference slides a two-pointer window with a full 4^k scratch array
(src/kmer_spans.c:413-449) — strictly sequential.  TPU-native form: the
occurrence count of k-mer w in the window starting at t is a difference of
prefix sums of w's indicator vector, so every window is independent:

    occ[p]   = [code ending at p+k-1 == w]  (start-position convention)
    count[t] = P[t + window - k + 1] - P[t],   P = exclusive prefix sum

Windows never span N gaps: a window is valid iff all its bases are non-N
(windowed sum of validity == window).  The count histogram (dist rows
0..window) accumulates via one-hot summation, not scatter.

Prefix sums reuse the scan-of-scans structure (one small lax.scan body,
flat TPU compile time).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def blocked_prefix_sum(x2d: jax.Array, rows_per_step: int = 64):
    """Inclusive prefix sum over row-major [nb, B] tiles (scan-of-scans)."""
    nb, B = x2d.shape
    R = min(rows_per_step, nb)
    pad = (-nb) % R
    if pad:
        x2d = jnp.concatenate(
            [x2d, jnp.zeros((pad, B), x2d.dtype)])
    G = x2d.shape[0] // R

    def body(carry, xr):
        inc = jnp.cumsum(xr, axis=1, dtype=x2d.dtype)  # [R, B] inclusive
        row_tot = inc[:, -1]
        row_off = carry + jnp.concatenate(
            [jnp.zeros((1,), x2d.dtype),
             jnp.cumsum(row_tot, dtype=x2d.dtype)[:-1]])
        out = inc + row_off[:, None]
        return carry + jnp.sum(row_tot, dtype=x2d.dtype), out

    _, out = jax.lax.scan(body, jnp.zeros((), x2d.dtype),
                          x2d.reshape(G, R, B))
    return out.reshape(-1, B)[:nb]


@functools.partial(
    jax.jit, static_argnames=("k", "window", "with_positions")
)
def windowed_counts_device(
    codes2d: jax.Array,
    kmer_valid2d: jax.Array,
    valid2d: jax.Array,
    tracked: jax.Array,
    k: int,
    window: int,
    with_positions: bool = False,
):
    """Per-window occurrence counts + distributions for tracked k-mers.

    codes2d/kmer_valid2d: end-position blocked codes ([nb, B]).
    valid2d: non-N mask. tracked: [n_tracked] int32 codes.
    Returns (dist [window+1, n_tracked] int32,
             counts_pos [n_tracked, n] int32 or None,
             window_valid [n] bool) — counts_pos[w, t] is the count for the
    window starting at t (0 where invalid), matching the reference's
    kmer_counts_pos matrices.
    """
    nb, B = codes2d.shape
    n = nb * B
    flat_codes = codes2d.reshape(-1)
    flat_kv = kmer_valid2d.reshape(-1)
    flat_v = valid2d.reshape(-1)

    # start-position indicator: k-mer starting at p ends at p+k-1
    def start_shift(x, fill=False):
        return jnp.concatenate(
            [x[k - 1 :], jnp.full((k - 1,), fill, x.dtype)])

    kv_start = start_shift(flat_kv)

    # window validity: all `window` bases non-N, and window fits in array
    inv = (~flat_v).astype(jnp.int32).reshape(nb, B)
    pinv = blocked_prefix_sum(inv).reshape(-1)
    pinv_ex = jnp.concatenate([jnp.zeros((1,), jnp.int32), pinv])  # n+1
    idx = jnp.arange(n, dtype=jnp.int32)
    in_range = idx <= n - window
    end_i = jnp.minimum(idx + window, n)
    w_invalid = pinv_ex[end_i] - pinv_ex[idx]
    window_valid = in_range & (w_invalid == 0)

    slots = window - k + 1  # k-mer start slots per window

    def per_kmer(w):
        occ = ((flat_codes == w) & flat_kv).astype(jnp.int32)
        occ = start_shift(occ, fill=0)
        p = blocked_prefix_sum(occ.reshape(nb, B)).reshape(-1)
        p_ex = jnp.concatenate([jnp.zeros((1,), jnp.int32), p])
        e = jnp.minimum(idx + slots, n)
        cnt = p_ex[e] - p_ex[idx]
        cnt = jnp.where(window_valid, cnt, 0)
        # histogram over valid windows via one-hot summation
        bins = jax.lax.broadcasted_iota(jnp.int32, (1, window + 1), 1)
        def hbody(acc, xs):
            c, v = xs
            oh = (c[:, None] == bins) & v[:, None]
            return acc + jnp.sum(
                oh.astype(jnp.int32), axis=0, dtype=jnp.int32), None
        TH = 1 << 15
        padh = (-n) % TH
        cpad = jnp.concatenate([cnt, jnp.zeros((padh,), jnp.int32)])
        vpad = jnp.concatenate([window_valid, jnp.zeros((padh,), bool)])
        acc, _ = jax.lax.scan(
            hbody, jnp.zeros((window + 1,), jnp.int32),
            (cpad.reshape(-1, TH), vpad.reshape(-1, TH)),
        )
        return acc, cnt

    dists = []
    positions = []
    for i in range(tracked.shape[0]):
        d, c = per_kmer(tracked[i])
        dists.append(d)
        if with_positions:
            positions.append(c)
    dist = jnp.stack(dists, axis=1)
    counts_pos = jnp.stack(positions, axis=0) if with_positions else None
    return dist, counts_pos, window_valid
