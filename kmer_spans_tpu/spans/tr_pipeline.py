"""Device pipeline for the transition-score caller (lr_regions).

The reference's find_kmer_tr_lr_regions (src/kmer_spans.c:329-395; SURVEY
A.6) fits the same max-plus scan algebra as the rank caller, with three
element kinds:

    seed (first k-mer of an N-free block):  f(x) = max(kmer_scores[c], 0)
                                            -> (a, b) = (-inf, clamp(ks))
    extension:                              f(x) = max(x + trans_scores[c], 0)
                                            -> (a, b) = (ts, 0)
    N / warm-up:                            f(x) = 0 -> (-inf, 0)

Emission is gated by region LENGTH only (no min_score), so screening
prunes by excursion length: a second max-plus scan computes the running
positive-run length (increment element (1, -inf), reset (-inf, 0)), and
only block chains whose longest run could reach min_region_length are
pulled for host replay.

The host replay (replay_tr_segment) is control-flow faithful to the
reference, including the quirks: reg_begin recorded one past a positive
seed, unconditional jump-back to the max on EVERY zero crossing, terminal
emission without rescan, and no emission from blocks whose seed lands
within 2 bytes of the sequence end (that block is shorter than k+2, so it
can only matter for min_region_length == 0).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np


def make_tr_pipeline(k: int, block: int = 8192, cand_blocks: int = 128):
    """Jitted device step: fn(nbases, ks_table f32, ts_table f32) -> dict."""
    import jax
    import jax.numpy as jnp

    from ..ops.blocked import (
        blocked_codes,
        blocked_scan,
    )
    from .pipeline import _seg_max_combine

    @jax.jit
    def fn(nbases, ks_table, ts_table):
        n = nbases.shape[0]
        nb = n // block
        b2 = (nbases & 3).reshape(nb, block)
        v2 = (nbases < 4).reshape(nb, block)
        codes, kmer_valid = blocked_codes(b2, v2, k)
        codes = jnp.where(kmer_valid, codes, 0)
        # seed: first complete k-mer of its block — the base k positions
        # back is N or before the start
        flat_v = v2.reshape(-1)
        prev_k = jnp.concatenate(
            [jnp.zeros((k,), bool), flat_v[:-k]]).reshape(nb, block)
        seed = kmer_valid & ~prev_k
        ext = kmer_valid & ~seed

        ks = ks_table[codes]
        ts = ts_table[codes]
        neg = jnp.float32(-jnp.inf)
        a = jnp.where(ext, ts, neg)
        b = jnp.where(seed, jnp.maximum(ks, 0.0), 0.0)
        # elements: ext -> (ts, 0); seed -> (-inf, max(ks,0)); other -> (-inf, 0)
        from ..ops.scan import _combine

        FA, FB, _ = _scan_pairs(a, b)
        S = jnp.maximum(FA, FB)

        # positive-run length scan: increment (1, -inf) on S>0 else reset
        pos = S > 0
        ra = jnp.where(pos, jnp.float32(1.0), neg)
        rb = jnp.where(pos, neg, jnp.float32(0.0))
        RA, RB, _ = _scan_pairs(ra, rb)
        runlen = jnp.maximum(RA, RB)

        block_last = S.reshape(nb, block)[:, -1]
        block_maxrun = runlen.reshape(nb, block).max(axis=1)
        linked = jnp.concatenate(
            [jnp.zeros((1,), bool), block_last[:-1] > 0])
        fwd, _ = jax.lax.associative_scan(
            _seg_max_combine, (block_maxrun, (~linked).astype(jnp.float32)))
        linked_next = jnp.concatenate([linked[1:], jnp.zeros((1,), bool)])
        bwd, _ = jax.lax.associative_scan(
            _seg_max_combine,
            (jnp.flip(block_maxrun),
             jnp.flip((~linked_next).astype(jnp.float32))))
        chain_maxrun = jnp.maximum(fwd, jnp.flip(bwd))

        top_need, top_idx = jax.lax.top_k(
            chain_maxrun, min(cand_blocks, nb))
        top_idx = jnp.sort(top_idx)
        return {
            "block_last": block_last,
            "chain_maxrun": chain_maxrun,
            "top_idx": top_idx,
            "codes": codes[top_idx],
            "seed": seed[top_idx],
            "ext": ext[top_idx],
        }

    def _scan_pairs(a2d, b2d):
        """blocked scan-of-scans over explicit (a, b) element arrays."""
        from ..ops.blocked import blocked_scan_prefixes

        # blocked_scan_prefixes builds elements from (s, scored); here we
        # already have raw (a, b) pairs, so feed them via its internals.
        return _raw_prefixes(a2d, b2d)

    def _raw_prefixes(a, b, rows_per_step: int = 64):
        import jax
        import jax.numpy as jnp

        from ..ops.scan import _combine

        nb_, B = a.shape
        neg = jnp.float32(-jnp.inf)
        R = min(rows_per_step, nb_)
        pad_rows = (-nb_) % R
        if pad_rows:
            a = jnp.concatenate([a, jnp.zeros((pad_rows, B), a.dtype)])
            b = jnp.concatenate(
                [b, jnp.full((pad_rows, B), neg, b.dtype)])
        G = a.shape[0] // R

        def body(carry, xs):
            inA, inB = carry
            ar, br = xs
            A, Bv = jax.lax.associative_scan(_combine, (ar, br), axis=1)
            tA, tB = A[:, -1], Bv[:, -1]
            cA, cB = jax.lax.associative_scan(_combine, (tA, tB))
            zero = jnp.zeros((1,), ar.dtype)
            RA = jnp.concatenate([zero, cA[:-1]])
            RB = jnp.concatenate([jnp.full((1,), neg, ar.dtype), cB[:-1]])
            fullRA = inA + RA
            fullRB = jnp.maximum(inB + RA, RB)
            FA = fullRA[:, None] + A
            FB = jnp.maximum(fullRB[:, None] + A, Bv)
            newA = inA + cA[-1]
            newB = jnp.maximum(inB + cA[-1], cB[-1])
            return (newA, newB), (FA, FB)

        init = (jnp.zeros((), a.dtype), jnp.full((), neg, a.dtype))
        (tA, tB), (FA3, FB3) = jax.lax.scan(
            body, init, (a.reshape(G, R, B), b.reshape(G, R, B)))
        FA = FA3.reshape(-1, B)[:nb_]
        FB = FB3.reshape(-1, B)[:nb_]
        return FA, FB, (tA, tB)

    return fn


def replay_tr_segment(
    ks: np.ndarray,
    ts: np.ndarray,
    seed: np.ndarray,
    ext: np.ndarray,
    base_pos: int,
    min_len: int,
    seq_id: int,
):
    """Reference-exact sequential replay of the tr_lr caller over arrays.

    ks/ts: f64 per-position seed/transition scores (end-position conv.);
    seed/ext: masks.  base_pos: 0-based global position of index 0.
    Returns regions as (seq_id, beg, end, score), 1-based last-base coords.
    """
    n = ks.shape[0]
    regions = []
    in_block = False  # actively scanning a block (or mid-block stretch)
    score = last = max_score = 0.0
    max_pos = reg_begin = 0

    def _terminal():
        if in_block and max_score > 0.0 and max_pos - reg_begin >= min_len:
            regions.append((seq_id, 1 + reg_begin, 1 + max_pos, max_score))

    j = 0
    while j < n:
        if seed[j]:
            score = max(float(ks[j]), 0.0)
            last = score
            max_score = 0.0
            max_pos = reg_begin = 0
            if score > 0.0:
                max_score = score
                # QUIRK: reference records i = one past the seed's last base
                max_pos = base_pos + j + 1
                reg_begin = base_pos + j + 1
            in_block = True
            j += 1
        elif ext[j]:
            if not in_block:
                # stretch begins mid-block: the scan state entering a
                # candidate chain is S = 0 (excursion independence), so
                # extension mode with a fresh state is exact
                score = last = max_score = 0.0
                max_pos = reg_begin = 0
                in_block = True
            pos0 = base_pos + j
            score = last + float(ts[j])
            if score > max_score:
                max_score = score
                max_pos = pos0
            if score < 0.0:
                score = 0.0
            if last == 0.0 and score > 0.0:
                max_score = score
                max_pos = pos0
                reg_begin = pos0
            if score == 0.0 and last > 0.0:
                if max_pos - reg_begin >= min_len:
                    regions.append(
                        (seq_id, 1 + reg_begin, 1 + max_pos, max_score))
                # unconditional jump-back: resume at max_pos + 1
                jmp = max_pos - base_pos
                score = last = max_score = 0.0
                reg_begin = max_pos
                max_pos = 0
                j = jmp + 1
                continue
            last = score
            j += 1
        else:
            _terminal()  # N gap / warm-up closes the block
            in_block = False
            score = last = max_score = 0.0
            max_pos = reg_begin = 0
            j += 1
    _terminal()
    return regions


@dataclasses.dataclass
class TrPipelineResult:
    regions: list
    fallback: bool


def finish_tr_spans(
    out: dict,
    n: int,
    min_len: int,
    ks_table: np.ndarray,
    ts_table: np.ndarray,
    block: int = 8192,
    seq_id: int = 1,
) -> TrPipelineResult:
    """Host finisher: length-screened candidate chains -> exact replay.

    ks_table/ts_table: the ORIGINAL f64 score tables — candidates replay
    from host f64 gathers of their pulled codes, so emitted scores are
    bit-identical to the reference's f64 accumulation
    (src/kmer_spans.c:348-366); the device's f32 tables only screen.
    """
    chain_maxrun = np.asarray(out["chain_maxrun"])
    top_idx = np.asarray(out["top_idx"])
    nb = chain_maxrun.shape[0]
    cand = chain_maxrun >= max(min_len, 1)
    if not cand.any():
        return TrPipelineResult(regions=[], fallback=False)
    have = np.zeros(nb, bool)
    have[top_idx] = True
    if (cand & ~have).any():
        return TrPipelineResult(regions=[], fallback=True)
    pos_in_pull = {int(b): i for i, b in enumerate(top_idx)}
    codes_c = np.asarray(out["codes"])
    ks_c = np.asarray(ks_table, dtype=np.float64)[codes_c]
    ts_c = np.asarray(ts_table, dtype=np.float64)[codes_c]
    seed_c = np.asarray(out["seed"])
    ext_c = np.asarray(out["ext"])

    regions = []
    i = 0
    while i < nb:
        if not cand[i]:
            i += 1
            continue
        j = i
        while j + 1 < nb and cand[j + 1]:
            j += 1
        rows = [pos_in_pull[b] for b in range(i, j + 1)]
        regions.extend(
            replay_tr_segment(
                ks_c[rows].reshape(-1),
                ts_c[rows].reshape(-1),
                seed_c[rows].reshape(-1),
                ext_c[rows].reshape(-1),
                i * block,
                min_len,
                seq_id,
            )
        )
        i = j + 1
    return TrPipelineResult(regions=regions, fallback=False)
