"""Spectrum statistics: weighted ranks and median frequency.

The weighted rank (reference rank_kmers_w, src/kmer_spans.c:189-202) is the
fraction of counted k-mer *mass* strictly before a k-mer when the spectrum
is sorted by (count asc, index asc).  The stable tie-break by index is part
of the conformance contract (SURVEY A.2).

The exact implementation lives in the oracle (host, f64, sequential
accumulation order); it is THE rank computation — 4^k is at most ~1e9 and
the cost is dwarfed by the genome-length passes.  A device-side variant for
sharded spectra (k >= 15 multi-chip) lives in parallel/.
"""

from __future__ import annotations

import numpy as np

from ..oracle.reference import weighted_ranks  # re-export: the exact impl


def spectrum_median_freq(counts: np.ndarray) -> float:
    """Median k-mer frequency over *counted positions* (for log2(f/f_med)).

    The README's s = log2(f_i / f_med) scoring (README.md:27-32) defines
    f_med as the median k-mer frequency; we take the median over k-mer
    *instances* (each counted position contributes its k-mer's frequency),
    which is the weighted median of the spectrum.
    """
    counts = np.asarray(counts, dtype=np.int64)
    total = counts.sum()
    if total == 0:
        return 0.0
    order = np.argsort(counts, kind="stable")
    cum = np.cumsum(counts[order])
    # first sorted position where cumulative mass reaches half
    half = (total + 1) // 2
    idx = int(np.searchsorted(cum, half))
    return counts[order[idx]] / total


def cumulative_mass(counts: np.ndarray) -> np.ndarray:
    """Integer rank numerators: rank[kmer] * total, exactly (int64).

    rank[kmer] = cumulative_mass[kmer] / total.  The integer form enables
    exact threshold comparisons on device in int32/int64 (s > 0 iff
    mass > thr * total), sidestepping f32 rounding entirely.
    """
    counts = np.asarray(counts, dtype=np.int64)
    order = np.argsort(counts, kind="stable")
    sorted_mass = np.concatenate([[0], np.cumsum(counts[order][:-1])])
    mass = np.empty_like(sorted_mass)
    mass[order] = sorted_mass
    return mass
