from .reference import (
    count_spectrum,
    find_regions,
    find_tr_regions,
    segments,
    weighted_ranks,
    windowed_distributions,
)

__all__ = [
    "count_spectrum",
    "find_regions",
    "find_tr_regions",
    "segments",
    "weighted_ranks",
    "windowed_distributions",
]
