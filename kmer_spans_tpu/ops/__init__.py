from .codes import kmer_codes
from .count import count_spectrum_scatter, count_spectrum_sort
from .scan import span_scan, span_scan_blocked

__all__ = [
    "kmer_codes",
    "count_spectrum_scatter",
    "count_spectrum_sort",
    "span_scan",
    "span_scan_blocked",
]
