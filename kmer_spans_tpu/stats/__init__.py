from .ranks import spectrum_median_freq, weighted_ranks

__all__ = ["weighted_ranks", "spectrum_median_freq"]
