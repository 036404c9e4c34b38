"""Device-side primitive operations (JAX/XLA/Pallas).

These replace the reference's C primitives (SURVEY.md §2.2): the 2-bit
codec (src/kmer.h), the concurrent hash tables (src/kmhash.c,
src/minimizers/count_barcodes.c) and the radix sort (src/radix_sort.h)
— re-expressed as batched integer array ops, `lax.sort`, and segmented
reductions, which is the lock-free TPU-native formulation.
"""
