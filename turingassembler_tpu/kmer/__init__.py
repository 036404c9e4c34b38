"""K-mer counting engine (replaces KMC + kmhash, SURVEY.md §2.4)."""

from .count import count_kedges_from_batches, count_kedges_from_reads  # noqa: F401
