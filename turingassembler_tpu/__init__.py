"""turingassembler_tpu — a TPU-native read-cloud genome assembler.

A from-scratch rebuild of the capabilities of bioturing/TuringAssembler
(reference: /root/reference) designed for TPU hardware:

- k-mer counting as batched integer Pallas/XLA kernels + device sort +
  segmented reduction (replacing KMC + the striped-lock kmhash,
  reference src/kmhash.c, include/kmc_skipping.h).
- de Bruijn graph construction as flat device arrays + pointer doubling
  (replacing the pthread unitig walkers, reference src/kmer_build.c).
- Graph simplification as vectorized predicates + tombstone masks +
  condense (replacing the in-place edge surgery of src/basic_resolve.c).
- Barcode-aware scaffolding and per-gap local assembly (reference
  src/scaffolding/, src/build_bridge.c) as batched sparse reductions.
- Multi-host scale-out via jax.sharding.Mesh + shard_map collectives
  (hash-partitioned k-mer space) instead of pthreads on one box.

The public entry point mirrors the reference CLI (src/main.c):
    python -m turingassembler_tpu assembly3 -1 R1.fq -2 R2.fq -l ust ...
"""

__version__ = "0.1.0"
