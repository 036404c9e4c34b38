"""Adversarial truth suite for the evaluator (VERDICT r4 #4).

Every quality gate in this repo trusts `evaluate_assembly` to report
misassemblies.  Round 4 showed the risk of a self-certified evaluator
(18 phantom misassemblies from its own anchor logic, later fixed with
QUAST's extensive-only posture).  This suite attacks the other side:
plant REAL misassemblies — QUAST's extensive classes (relocation,
inversion, translocation; quast.sourceforge.net's definitions mirrored
by the reference's published QUAST table, /root/reference/README.md:
13-15) plus large indels — into otherwise perfect contigs and assert
each is detected, and that clean input stays at zero.
"""

import numpy as np
import pytest

from turingassembler_tpu import testing as tt
from turingassembler_tpu.evaluate import evaluate_assembly


@pytest.fixture(scope="module")
def genome():
    return tt.codes_to_str(tt.random_genome(50_000, seed=7))


@pytest.fixture(scope="module")
def genome2():
    return tt.codes_to_str(tt.random_genome(40_000, seed=8))


def _rc(s):
    comp = {"A": "T", "C": "G", "G": "C", "T": "A"}
    return "".join(comp[c] for c in reversed(s))


def test_clean_single_contig_zero_false_positives(genome):
    res = evaluate_assembly([genome[0:30_000]], genome)
    assert res.n_misassemblies == 0
    assert res.n_mismatches == 0
    assert res.n_indel_bases == 0
    assert res.nga50 == 30_000
    assert res.genome_fraction == pytest.approx(0.6)


def test_clean_reverse_contig_zero_false_positives(genome):
    res = evaluate_assembly([_rc(genome[0:30_000])], genome)
    assert res.n_misassemblies == 0
    assert res.n_mismatches == 0
    assert res.nga50 == 30_000


def test_clean_multi_contig(genome):
    res = evaluate_assembly([genome[0:20_000], genome[25_000:45_000]],
                            genome)
    assert res.n_misassemblies == 0
    assert res.genome_fraction == pytest.approx(0.8)


def test_relocation_detected(genome):
    """QUAST relocation: two loci of the same record joined with a
    >=1 kb reference-distance jump."""
    contig = genome[0:10_000] + genome[15_000:25_000]
    res = evaluate_assembly([contig], genome)
    assert res.n_misassemblies == 1
    assert res.n_translocations == 0
    assert res.n_inversions == 0


def test_small_jump_not_extensive(genome):
    """A sub-threshold (<1 kb) jump is QUAST-local, not extensive."""
    contig = genome[0:10_000] + genome[10_500:20_000]
    res = evaluate_assembly([contig], genome)
    assert res.n_misassemblies == 0


def test_inversion_detected_as_two_breakpoints(genome):
    """QUAST inversion: an interior segment in reverse orientation has
    two breakpoints -> two extensive misassemblies."""
    contig = (genome[0:10_000] + _rc(genome[10_000:15_000])
              + genome[15_000:25_000])
    res = evaluate_assembly([contig], genome)
    assert res.n_misassemblies == 2
    assert res.n_inversions == 2
    assert res.n_translocations == 0


def test_terminal_inversion_detected(genome):
    """A strand flip at the end of a contig: one breakpoint."""
    contig = genome[0:10_000] + _rc(genome[15_000:25_000])
    res = evaluate_assembly([contig], genome)
    assert res.n_misassemblies == 1
    assert res.n_inversions == 1


def test_translocation_detected(genome, genome2):
    """QUAST translocation: a contig joining two truth records (the
    multi-record case the r4 per-record evaluator missed — ADVICE r4
    medium: per-record indexing anchored the chimera to neither record
    and reported 0)."""
    contig = genome[0:10_000] + genome2[5_000:15_000]
    res = evaluate_assembly([contig], [("chr1", genome), ("chr2", genome2)])
    assert res.n_misassemblies == 1
    assert res.n_translocations == 1
    # both halves still count as aligned blocks on their records
    frac = dict(res.record_fraction)
    assert frac["chr1"] > 0.15
    assert frac["chr2"] > 0.2


def test_multi_record_clean_contigs(genome, genome2):
    res = evaluate_assembly([genome[0:20_000], genome2[0:20_000]],
                            [("chr1", genome), ("chr2", genome2)])
    assert res.n_misassemblies == 0
    frac = dict(res.record_fraction)
    assert frac["chr1"] == pytest.approx(0.4)
    assert frac["chr2"] == pytest.approx(0.5)


def test_large_deletion_detected(genome):
    """A >=1 kb deletion inside a contig is an extensive event (the
    reference-side jump exceeds the relocation threshold)."""
    contig = genome[0:10_000] + genome[12_000:22_000]
    res = evaluate_assembly([contig], genome)
    assert res.n_misassemblies == 1


def test_large_insertion_detected(genome):
    """>=1 kb of novel sequence spliced into a contig: the contig-side
    gap between colinear flanks exceeds the threshold."""
    novel = tt.codes_to_str(tt.random_genome(2_000, seed=99))
    contig = genome[0:10_000] + novel + genome[10_000:20_000]
    res = evaluate_assembly([contig], genome)
    assert res.n_misassemblies == 1


def test_allelic_island_bridged_not_counted(genome):
    """A short (<=1 kb) foreign island between mutually colinear flanks
    is QUAST's allelic/repeat ambiguity, not an extensive event (the r4
    phantom-misassembly class)."""
    contig = genome[0:10_000] + genome[30_000:30_500] + genome[10_500:20_000]
    res = evaluate_assembly([contig], genome)
    assert res.n_misassemblies == 0


def test_planted_snps_counted_exactly(genome):
    contig = list(genome[0:20_000])
    rng = np.random.default_rng(3)
    pos = rng.choice(20_000 - 200, size=15, replace=False) + 100
    for p in pos:
        old = contig[p]
        contig[p] = {"A": "C", "C": "G", "G": "T", "T": "A"}[old]
    res = evaluate_assembly(["".join(contig)], genome)
    assert res.n_misassemblies == 0
    assert res.n_mismatches == 15


def test_head_tail_snps_counted(genome):
    """Substitutions within the first/last k bases of a contig sit
    before the first (after the last) anchor; the head/tail hamming
    extension must count them (ADVICE r4 low: they were dropped)."""
    contig = list(genome[0:20_000])
    for p in (5, 19_995):
        contig[p] = {"A": "C", "C": "G", "G": "T", "T": "A"}[contig[p]]
    res = evaluate_assembly(["".join(contig)], genome)
    assert res.n_misassemblies == 0
    assert res.n_mismatches == 2


def test_small_indel_counted_as_indel_bases(genome):
    """A 3-base deletion: not extensive, tallied as indel bases."""
    contig = genome[0:10_000] + genome[10_003:20_000]
    res = evaluate_assembly([contig], genome)
    assert res.n_misassemblies == 0
    assert res.n_indel_bases == 3


def test_scaffold_n_gap_not_misassembly(genome):
    """A 100-N scaffold gap spanning the true distance: colinear flanks,
    no event — and N columns are uncalled bases (QUAST posture), not
    substitutions, so the gap contributes zero mismatches."""
    contig = genome[0:10_000] + "N" * 100 + genome[10_100:20_000]
    res = evaluate_assembly([contig], genome)
    assert res.n_misassemblies == 0
    assert res.n_mismatches == 0


def test_inverted_repeat_truth_no_phantom_events(genome):
    """A truth genome carrying an inverted-repeat pair (S ... rc(S)): a
    perfect contig over the rc(S) locus must NOT report phantom
    inversions.  Requires strand-level anchor uniqueness — forward-only
    dedup keeps both copies and anchors the contig to the wrong
    strand."""
    S = genome[5_000:7_000]
    truth = genome[0:12_000] + _rc(S) + genome[12_000:20_000]
    # perfect contig spanning the rc(S) region and flanks
    contig = truth[9_000:18_000]
    res = evaluate_assembly([contig], truth)
    assert res.n_misassemblies == 0
    assert res.n_inversions == 0
    assert res.n_mismatches == 0
    # and a REAL inversion in the same truth is still caught
    bad = (truth[0:10_000] + _rc(truth[10_000:15_000])
           + truth[15_000:20_000])
    res2 = evaluate_assembly([bad], truth)
    assert res2.n_misassemblies == 2
    assert res2.n_inversions == 2
