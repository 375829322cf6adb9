"""Exact span extraction from per-position scores (host, f64).

Implements the excursion-recursion equivalence proved in SURVEY.md A.4:
the reference's jump-back rescan is, per positive excursion of the score
trace,

    split at the FIRST argmax m; emit the prefix (first-positive .. m) if it
    passes (min_width, min_score); rescan the suffix from m+1 with S = 0;
    a failing candidate emits nothing from its whole excursion.

Bit-identity requirement (SURVEY §7 hard part 2): emitted scores must match
the reference's *sequential* f64 summation order.  Tree-ordered scans
(device f32/f64) cannot reproduce that rounding, so excursions are replayed
here with ``np.add.accumulate`` (strictly left-to-right f64) in bounded
chunks — cost is O(total excursion mass), not O(n).

The device scan's role is acceleration: callers may pass ``start_hints``
(candidate excursion-start indices, e.g. from the TPU scan's S>0 mask) to
skip the dead (S==0) majority of the sequence.
"""

from __future__ import annotations

import numpy as np

_CHUNK = 4096


def _first_nonpositive(s: np.ndarray, u: int):
    """Sequential S replay from u: S = add.accumulate(s[u:]).

    Returns (S_vals, z) where S_vals are the exact sequential partial sums
    for positions u..z (inclusive; S_vals[i] is S at u+i), and z is the
    absolute index of the first position with S <= 0, or None if the scan
    ran to the end of the array with S > 0 throughout (then S_vals covers
    u..n-1).
    """
    n = s.shape[0]
    parts: list[np.ndarray] = []
    carry = 0.0
    lo = u
    while lo < n:
        hi = min(lo + _CHUNK, n)
        # np.add.accumulate is strictly left-to-right in f64; seeding the
        # chunk with the carry as element 0 keeps the *exact* sequential
        # rounding order across chunk boundaries.
        block = np.empty(hi - lo + 1, dtype=np.float64)
        block[0] = carry
        block[1:] = s[lo:hi]
        acc = np.add.accumulate(block)[1:]
        parts.append(acc)
        nonpos = acc <= 0.0
        if nonpos.any():
            z = lo + int(np.argmax(nonpos))
            full = parts[0] if len(parts) == 1 else np.concatenate(parts)
            return full[: z - u + 1], z
        carry = float(acc[-1])
        lo = hi
    return (parts[0] if len(parts) == 1 else np.concatenate(parts)), None


def extract_segment_spans(
    s: np.ndarray,
    pos_offset: int,
    min_width: int,
    min_score: float,
    visits: np.ndarray | None = None,
    start_hints: np.ndarray | None = None,
):
    """Extract spans from one N-free segment's scored positions.

    s          : f64 scores at the segment's scored positions (index j scores
                 the k-mer whose 1-based last base is pos_offset + j).
    pos_offset : 1-based last-base position of scored index 0.
    visits     : optional int64 array (len(s)+1) treated as a difference
                 array; each scan pass adds +1 over the range it traverses —
                 reproduces the reference's scan-count double-counting quirk
                 (src/kmer_spans.c:266-267).
    start_hints: optional sorted candidate excursion-start indices (must be a
                 superset of true starts restricted to s>0; extra or stale
                 entries are skipped).  Default: all indices with s > 0.

    Returns list of (beg, end, score) in the reference's 1-based last-base
    coordinates.
    """
    n = s.shape[0]
    regions: list[tuple[int, int, float]] = []
    if n == 0:
        return regions
    if start_hints is None:
        start_hints = np.nonzero(s > 0.0)[0]
    pass_start = 0
    j = 0
    while j < n:
        pi = int(np.searchsorted(start_hints, j))
        # advance to the next genuine excursion start (s > 0)
        u = -1
        while pi < start_hints.shape[0]:
            cand = int(start_hints[pi])
            if s[cand] > 0.0:
                u = cand
                break
            pi += 1
        if u < 0:
            break  # no further excursions; the pass runs to segment end
        S_vals, z = _first_nonpositive(s, u)
        # positions with S > 0: u .. (z-1) or u .. n-1
        top = (z - 1) if z is not None else (n - 1)
        m_rel = int(np.argmax(S_vals[: top - u + 1]))  # first argmax, exact f64
        m = u + m_rel
        max_score = float(S_vals[m_rel])
        if (m - u) >= min_width and max_score >= min_score:
            regions.append((pos_offset + u, pos_offset + m, max_score))
            # this pass traversed up to the zero crossing (or segment end)
            pass_end = z if z is not None else n - 1
            if visits is not None:
                visits[pass_start] += 1
                visits[pass_end + 1] -= 1
            pass_start = m + 1
            j = m + 1
        else:
            if z is None:
                j = n  # terminal, nothing emitted
            else:
                j = z + 1  # same pass continues beyond the dead excursion
    if visits is not None and pass_start < n:
        visits[pass_start] += 1
        visits[n] -= 1
    return regions


def extract_spans(
    s: np.ndarray,
    scored: np.ndarray,
    min_width: int,
    min_score: float,
    seq_id: int = 0,
    visits_full: np.ndarray | None = None,
):
    """Extract spans over a whole sequence given per-position scores + mask.

    s, scored are full-length (one entry per base, end-position convention);
    runs of ``scored`` are independent scan stretches (the reference's
    N-free segments minus warm-up and segment tails).

    visits_full: optional int64 array (len + 1) difference array over BASE
    positions accumulating scan multiplicity (for scan-count parity).
    """
    s = np.asarray(s, dtype=np.float64)
    scored = np.asarray(scored, bool)
    n = scored.shape[0]
    regions: list[tuple[int, int, int, float]] = []
    d = np.diff(scored.astype(np.int8))
    starts = list(np.nonzero(d == 1)[0] + 1)
    ends = list(np.nonzero(d == -1)[0])
    if n and scored[0]:
        starts.insert(0, 0)
    if n and scored[-1]:
        ends.append(n - 1)
    for a, b in zip(starts, ends):
        seg_s = s[a : b + 1]
        visits = None
        if visits_full is not None:
            visits = np.zeros(b - a + 2, dtype=np.int64)
        segs = extract_segment_spans(
            seg_s, a + 1, min_width, min_score, visits=visits
        )
        regions.extend((seq_id, beg, end, sc) for beg, end, sc in segs)
        if visits_full is not None:
            visits_full[a : b + 2] += visits
    return regions
