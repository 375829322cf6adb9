"""Deterministic test-genome generators (no RNG library dependence).

The LCG genome reproduces SURVEY.md Appendix B's golden conformance input:
a 100 kb pseudo-random ACGT sequence with three planted repeat islands.
"""

from __future__ import annotations

import numpy as np

_LCG_MUL = np.uint64(6364136223846793005)
_LCG_ADD = np.uint64(1442695040888963407)


def lcg_bases(n: int, seed: int = 42) -> str:
    """n pseudo-random bases from the PCG-style LCG (SURVEY.md Appendix B)."""
    state = np.uint64(seed)
    out = np.empty(n, dtype=np.uint8)
    letters = np.frombuffer(b"ACGT", dtype=np.uint8)
    with np.errstate(over="ignore"):
        for i in range(n):
            state = state * _LCG_MUL + _LCG_ADD
            out[i] = letters[int((state >> np.uint64(33)) & np.uint64(3))]
    return out.tobytes().decode("ascii")


def golden_genome(n: int = 100_000, seed: int = 42) -> str:
    """The Appendix-B golden genome: LCG bases + planted repeat islands."""
    seq = list(lcg_bases(n, seed))
    islands = [
        (20000, "AG" * 300),   # [20000, 20600)
        (50000, "CAG" * 300),  # [50000, 50900)
        (80000, "T" * 400),    # [80000, 80400)
    ]
    for start, rep in islands:
        seq[start : start + len(rep)] = rep
    return "".join(seq)


def spectrum_checksum(counts: np.ndarray) -> int:
    """cks = cks * 1000003 + count_i over index order, uint64 wraparound."""
    cks = np.uint64(0)
    mul = np.uint64(1000003)
    with np.errstate(over="ignore"):
        for c in np.asarray(counts, dtype=np.uint64):
            cks = cks * mul + c
    return int(cks)
