"""The ONE global-alignment scorer of the framework (SURVEY.md §2.13.7).

One affine-gap recurrence (gap of length L costs go + ge*L), two
lowerings of the same math:

  - "pallas": the banded Pallas kernel (ops/pallas_align.py) — O(Lq*W)
    VPU work per pair, band resident in VMEM; the TPU production path.
  - "scan":   the full-width associative-scan formulation
    (ops/align.py) — exact for any divergence; used on the CPU backend
    (tests, small local jobs) where interpreted Pallas would crawl.

Linear-gap scoring is the go=0 degenerate case (a second gap-open
inside a gap then ties with extending, so the one-open dominance cummax
both lowerings use stays exact).

Production call sites (the reference's two native DP users, plus the
pipeline stages derived from them):
  1. align-bubble verification       resolve/basic.py
     (reference src/basic_resolve.c:929-953, match +1 mismatch -1 gap -3)
  2. mapper hit rescoring            mapper/minimizers.py -> barcode/builder.py
     (reference asm_reg2aln -> ksw_global2, src/barcode_builder.c:448-563,
      BWA scoring a=1 b=2 o=3 e=1, src/barcode_builder.c:38-75)
  3. bridge path scoring             localasm/bridge.py
     (reference count_readpair_err_path, src/barcode_builder.c:236-285)
"""

from __future__ import annotations

from typing import Tuple

import jax
import numpy as np

# (match, mismatch, gap_open, gap_extend)
SCORING_BUBBLE: Tuple[int, int, int, int] = (1, -1, 0, 3)
SCORING_BWA: Tuple[int, int, int, int] = (1, -2, 3, 1)

MIN_MAP_SCORE = 50  # reference read_mapper gate: ar->score < 50 -> skip
                    # (src/barcode_builder.c:790)


def _auto_backend() -> str:
    return "scan" if jax.default_backend() == "cpu" else "pallas"


def affine_scores(q, qlen, t, tlen, scoring: Tuple[int, int, int, int],
                  band: int = 128, backend: str | None = None,
                  mode: str = "global") -> np.ndarray:
    """Alignment score for each padded pair.

    q (B, Lq) uint8 codes with 255 padding, t (B, Lt) likewise,
    qlen/tlen (B,) effective lengths.  Returns (B,) int32 host scores.

    mode "global" is end-to-end on both sequences; mode "fit" leaves
    target-end gaps free (read-vs-contig-window rescoring — the query
    must align fully, the window slack costs nothing).

    band is the static Pallas band width; pairs with
    |tlen - qlen| >= band//2 fall outside the band and score the -inf
    sentinel — callers must size the band for their divergence (the
    scan lowering is full-width and ignores it).
    """
    match, mismatch, go, ge = scoring
    backend = backend or _auto_backend()
    q = np.ascontiguousarray(q, np.uint8)
    t = np.ascontiguousarray(t, np.uint8)
    qlen = np.ascontiguousarray(qlen, np.int32)
    tlen = np.ascontiguousarray(tlen, np.int32)
    if backend == "pallas":
        from .pallas_align import banded_affine_score
        out = banded_affine_score(q, qlen, t, tlen, W=band, match=match,
                                  mismatch=mismatch, go=go, ge=ge, mode=mode)
    else:
        from .align import affine_global_score_batch
        out = affine_global_score_batch(q, qlen, t, tlen, match=match,
                                        mismatch=mismatch, gap_open=go,
                                        gap_ext=ge, mode=mode)
    return np.asarray(out, np.int32)


def pad_pow2(n: int, lo: int = 64) -> int:
    """Bucket a length to the next power of two (compile-cache friendly)."""
    p = lo
    while p < n:
        p <<= 1
    return p
