"""Pallas small-table gather + packed rank-class screening tables.

The span screen's dominant cost is the per-position rank lookup
``mass[codes]`` — XLA's gather runs ~9.5 ns/element on v5e regardless of
table size.  Mosaic's ``tpu.dynamic_gather`` (via 2D ``take_along_axis``)
is ~10x faster but is restricted to single-tile windows: sublane gathers
see 8 rows, lane gathers see 128 lanes.  An EXACT arbitrary-table lookup
therefore has to *enumerate* table rows (each combo = one lane-gather
from a pre-rolled copy + select), costing O(rows) vector ops per 8-row
code vreg — break-even with XLA at ~512 rows (k=8, f32).

The win comes from shrinking the table: the screen only needs a SOUND
UPPER BOUND on each position's rank (the max-plus scan is monotone in
its inputs, so overestimating scores can only add candidate blocks,
never lose a region; candidates are replayed exactly from integer mass
by the host finisher).  Ranks quantized to 16 levels pack 8 entries per
int32 word, shrinking a 4^k table to 4^k/8 words — 64 rows at k=8 —
and the enumerated gather to ~1 ns/element.

Reference parity: this accelerates the scoring gather feeding the scan
of kmer_regions (src/kmer_spans.c:268); emitted spans still come from
exact integer mass via the finisher (spans/pipeline.py), so region
output is unchanged.

Row enumeration trick: combo j = (window w = j>>3, roll d = j&7)
covers table row ``8w + ((p - d) & 7)`` at sublane p using 8 pre-rolled
table copies tabR[d][8w + p] = tab[8w + ((p - d) & 7)]; an element with
packed-word row r at sublane p selects combo ``(r & ~7) | ((p - r) & 7)``.
The lane gather's index (the word's lane) is evaluated at the element's
own position, which is what makes the composition exact — a second
*gather* for the row would evaluate its index at the moved position
(impossible in general; see benchmarks/gather_bench*.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CLASS_BITS = 4
CLASS_LEVELS = 16          # ranks quantized to ceil(rank*16)/16 upper edges
WORD_ENTRIES = 32 // CLASS_BITS  # 8 nibbles per int32 word
# enumerated-gather cost grows linearly with packed rows (4^k / 1024);
# above ~512 rows XLA's gather wins
PALLAS_CLASS_MAX_K = 9

_BLOCK_ROWS = 64           # (64, 128) codes per grid step (8 sub-vregs)
_LANES = 128


#: integer screening scale: screen scores live in units of 2^-12 rank.
#: Within-block sums are bounded by 8192 * (4096 + slack) < 2^27 (int32
#: safe); the cross-block composition runs in int64 on the host (exact to
#: genome sizes ~1e12 bases).
SCREEN_SCALE = 4096


def screen_thr_q(thr):
    """Sound integer threshold: thr_q <= SCREEN_SCALE * thr, always.

    f32 multiply rounds to nearest (|err| <= 0.5 ulp < 1 here), so
    floor(thr*4096) - 1 can never exceed the true product.
    """
    import jax.numpy as jnp

    return jnp.floor(thr * SCREEN_SCALE).astype(jnp.int32) - 1


def class_scores_int(cls_nibble, thr_q):
    """Integer upper-bound screen score (units of 2^-12 rank).

    s_int = (cls+1)*256 + 3 - thr_q  >=  SCREEN_SCALE * (rank - thr)
    for any true rank in the class: (cls+1)/16 >= rank up to one f32
    rounding of the table build (< 2^-11 scaled units), covered by the +3
    together with thr_q's -1 slack.  Monotonicity of the max-plus scan
    then makes every block summary an exact-integer UPPER bound on the
    true scaled score — no floating-point margins anywhere.
    """
    return (cls_nibble + 1) * (SCREEN_SCALE // CLASS_LEVELS) + 3 - thr_q


def fine_class_table(mass, total_f32):
    """int16 4096-level rank-upper-bound table (k > PALLAS_CLASS_MAX_K).

    tab[c] = floor(rank_f32 * 4096) + 1 >= 4096*rank - 2^-11; gathered by
    XLA (the packed Pallas kernel's enumerated rows get too numerous past
    4^9).  Screen score: tab[codes] + 2 - thr_q (same soundness slack as
    class_scores_int).
    """
    import jax.numpy as jnp

    rank = mass.astype(jnp.float32) / jnp.maximum(total_f32, 1.0)
    return (
        jnp.clip((rank * SCREEN_SCALE).astype(jnp.int32), 0, SCREEN_SCALE)
        + 1
    ).astype(jnp.int16)


def fine_scores_int(tab_vals, thr_q):
    """Integer screen scores from a fine_class_table gather."""
    return tab_vals.astype(jnp.int32) + 2 - thr_q


def class_table_from_mass(mass, total_f32, class_bits: int = CLASS_BITS):
    """Packed rank-upper-bound classes from integer cumulative mass.

    class[c] = min(levels-1, floor(rank_f32 * levels)) with
    rank = mass/total and levels = 2^class_bits; the screening score uses
    the class's UPPER edge (class+1)/levels plus a small slack for the
    f32 division, making s_ub >= s_true always.  Returns int32
    [4^k / (32/class_bits)] packed words (entry e at bits class_bits*e).

    class_bits=2 halves the gather kernel's table rows (so ~2x screen
    throughput) at 1/4-rank screening resolution — only useful when the
    threshold leaves the mean class edge negative (thr >= ~0.7); sound at
    any thr (coarse classes can only ADD candidate blocks, never lose a
    region).
    """
    levels = 1 << class_bits
    epw = 32 // class_bits
    rank = mass.astype(jnp.float32) / jnp.maximum(total_f32, 1.0)
    cls = jnp.clip((rank * levels).astype(jnp.int32), 0, levels - 1)
    w = cls.reshape(-1, epw)
    shifts = (jnp.arange(epw, dtype=jnp.int32) * class_bits)
    return jnp.sum(w << shifts[None, :], axis=1, dtype=jnp.int32)


def class_scores(cls_nibble, thr):
    """Sound upper-bound screening score for a 4-bit rank class."""
    return (cls_nibble.astype(jnp.float32) + 1.0) * (1.0 / CLASS_LEVELS) \
        - thr + 1e-5


def prerolled_table(tab_words):
    """[W] int32 -> (8, R, 128) pre-rolled copies for the gather kernel.

    R = ceil(W/128) padded up to a multiple of 8 rows.
    tabR[d, 8w+p] = tab2d[8w + ((p-d) & 7)].
    """
    W = tab_words.shape[0]
    rows = -(-W // _LANES)
    rows = -(-rows // 8) * 8
    pad = rows * _LANES - W
    if pad:
        tab_words = jnp.concatenate(
            [tab_words, jnp.zeros((pad,), tab_words.dtype)])
    tab2d = tab_words.reshape(rows, _LANES)
    r = jnp.arange(rows, dtype=jnp.int32)
    return jnp.stack(
        [tab2d[(r & ~7) | ((r - d) & 7)] for d in range(8)])


def _gather_kernel(idx_ref, tab_ref, out_ref, *, rows):
    idx = idx_ref[0]                       # (64, 128) int32 word indices
    lo = idx & (_LANES - 1)
    row = idx >> 7
    p = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_ROWS, _LANES), 0) & 7
    sel = (row & ~7) | ((p - row) & 7)

    los = [lo[8 * m:8 * m + 8] for m in range(_BLOCK_ROWS // 8)]
    sels = [sel[8 * m:8 * m + 8] for m in range(_BLOCK_ROWS // 8)]

    def body(j, accs):
        d = j & 7
        w = j >> 3
        win = tab_ref[d, pl.ds(8 * w, 8), :]
        return tuple(
            jnp.where(sels[m] == j,
                      jnp.take_along_axis(win, los[m], axis=1), accs[m])
            for m in range(_BLOCK_ROWS // 8)
        )

    init = tuple(jnp.zeros((8, _LANES), jnp.int32)
                 for _ in range(_BLOCK_ROWS // 8))
    accs = jax.lax.fori_loop(0, rows, body, init)
    out_ref[0] = jnp.concatenate(accs, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_word_gather(tabR, word_idx, interpret=None):
    """Gather int32 ``words[word_idx]`` through the enumerated kernel.

    tabR: (8, R, 128) pre-rolled packed table (prerolled_table).
    word_idx: any-shape int32 in [0, R*128).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    rows = tabR.shape[1]
    shape = word_idx.shape
    flat = word_idx.reshape(-1)
    n = flat.shape[0]
    step = _BLOCK_ROWS * _LANES
    pad = (-n) % step
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    nb = flat.shape[0] // step
    blk = flat.reshape(nb, _BLOCK_ROWS, _LANES)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, rows=rows),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, _BLOCK_ROWS, _LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, rows, _LANES), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLOCK_ROWS, _LANES),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, _BLOCK_ROWS, _LANES),
                                       jnp.int32),
        interpret=interpret,
    )(blk, tabR)
    return out.reshape(-1)[:n].reshape(shape)


def class_screen_scores(tabR, codes, thr):
    """Upper-bound screening scores for codes via the packed class table."""
    words = pallas_word_gather(tabR, codes >> 3)
    nib = (words >> ((codes & 7) * CLASS_BITS)) & (CLASS_LEVELS - 1)
    return class_scores(nib, thr)
