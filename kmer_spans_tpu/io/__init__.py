from .fasta import read_fasta, read_fasta_packed
from .spectrum_file import KMER_MAGIC, read_kmers, write_kmers

__all__ = [
    "read_fasta",
    "read_fasta_packed",
    "read_kmers",
    "write_kmers",
    "KMER_MAGIC",
]
