"""Multi-chip / multi-host scale-out (SURVEY.md §2.12, §5.7-5.8).

The reference is single-host pthreads; its k-mer-space sharding pattern
(per-thread KMC prefix ranges, src/KMC_reader.c:287-310) maps here to
hash-partitioning the canonical k-mer space across devices of a
jax.sharding.Mesh, exchanged with `all_to_all` and merged with local
sort + segment reductions — XLA collectives over ICI/DCN instead of
locks and atomics.
"""
