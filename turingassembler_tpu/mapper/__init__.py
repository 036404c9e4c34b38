"""Read -> edge mapper (SURVEY.md §2.9, §7.7).

Replaces both of the reference's mappers for this pipeline:
  - the minimizer subsystem (src/minimizers/minimizers.c) used for
    molecule analysis, and
  - BWA-MEM (libs/bwa) used by the barcode aux-info builder
    (src/barcode_builder.c) and path scoring,
with one batched minimizer seed-and-vote engine on device, optionally
refined by the affine-gap DP (ops/align.py) where the reference rescored
with ksw_global2.
"""

from .minimizers import EdgeMinimizerIndex, map_reads  # noqa: F401
