from .reference import (
    count_spectrum,
    count_spectrum_sparse,
    find_regions,
    find_tr_regions,
    segments,
    weighted_ranks,
    windowed_distributions,
)

__all__ = [
    "count_spectrum",
    "count_spectrum_sparse",
    "find_regions",
    "find_tr_regions",
    "segments",
    "weighted_ranks",
    "windowed_distributions",
]
