"""End-to-end tests of the Polisher on synthetic data."""

import numpy as np
import pytest

from vechat_tpu.io.fastx import SeqRecord
from vechat_tpu.io.paf import PafRecord
from vechat_tpu.ops.encode import encode
from vechat_tpu.ops.pairwise import edit_distance
from vechat_tpu.pipeline.polisher import (
    Polisher,
    find_breaking_points_from_cigar,
)

BASES = np.array(list("ACGT"))


def random_seq(rng, n):
    return "".join(rng.choice(BASES, size=n))


def mutate(rng, seq, rate):
    """Substitutions+indels at the given rate."""
    out = []
    for c in seq:
        r = rng.random()
        if r < rate * 0.5:  # substitution
            out.append(rng.choice([b for b in "ACGT" if b != c]))
        elif r < rate * 0.75:  # deletion
            continue
        elif r < rate:  # insertion
            out.append(c)
            out.append(rng.choice(BASES))
        else:
            out.append(c)
    return "".join(out)


def make_dataset(rng, true_len=700, n_reads=12, err=0.08, fastq=True):
    truth = random_seq(rng, true_len)
    reads = []
    for i in range(n_reads):
        data = mutate(rng, truth, err)
        # Q40 quality: the consistent (FASTQ) path of the reference;
        # FASTA inputs hit the backbone-quality sniff quirk (see
        # test_fasta_last_window_quirk)
        q = "I" * len(data) if fastq else None
        reads.append(SeqRecord(f"read{i}", data, q))
    # all-vs-all style overlaps of every query against target read0
    overlaps = []
    t = reads[0]
    for q in reads[1:]:
        overlaps.append(
            PafRecord(
                q_name=q.name,
                q_length=len(q.data),
                q_begin=0,
                q_end=len(q.data),
                strand=False,
                t_name=t.name,
                t_length=len(t.data),
                t_begin=0,
                t_end=len(t.data),
                num_matches=min(len(q.data), len(t.data)),
                alignment_length=max(len(q.data), len(t.data)),
                mapq=60,
            )
        )
    return truth, reads, overlaps


def test_breaking_points_hand_case():
    # target [0,10), window length 4: boundaries at 3 and 7 (ids 0,1,2)
    # cigar: 10M perfect match
    bps = find_breaking_points_from_cigar(
        "10M", 4, 0, 10, 0, 10, 10, False
    )
    assert bps == [(0, 0), (4, 4), (4, 4), (8, 8), (8, 8), (10, 10)]


def test_breaking_points_with_indels():
    # 3M 2D 3M: target consumes 8, query consumes 6, window 4
    bps = find_breaking_points_from_cigar("3M2D3M", 4, 0, 8, 0, 6, 6, False)
    # window 0: matches t0..t2 (q0..q2); window 1: t5..t7 (q3..q5)
    assert bps == [(0, 0), (3, 3), (5, 3), (8, 6)]


def test_breaking_points_strand():
    bps = find_breaking_points_from_cigar("4M", 10, 0, 4, 6, 10, 20, True)
    # reverse strand: q_ptr starts at q_length - q_end = 10
    assert bps == [(0, 10), (4, 14)]


def test_polisher_linear_improves_reads():
    rng = np.random.default_rng(1)
    truth, reads, overlaps = make_dataset(rng)
    p = Polisher(polisher_type="f", haplotype=False, trim=True)
    p.initialize(reads, reads, overlaps)
    out = p.polish()
    assert len(out) == 1  # only read0 got overlaps as target
    corrected = out[0]
    assert corrected.name.startswith("read0r LN:i:")
    d_before = edit_distance(encode(reads[0].data), encode(truth))
    d_after = edit_distance(encode(corrected.data), encode(truth))
    assert d_after < d_before


def test_polisher_haplotype_improves_reads():
    rng = np.random.default_rng(2)
    truth, reads, overlaps = make_dataset(rng)
    p = Polisher(
        polisher_type="f",
        haplotype=True,
        min_confidence=0.2,
        min_support=0.2,
    )
    p.initialize(reads, reads, overlaps)
    out = p.polish()
    assert len(out) == 1
    corrected = out[0]
    d_before = edit_distance(encode(reads[0].data), encode(truth))
    d_after = edit_distance(encode(corrected.data), encode(truth))
    assert d_after < d_before


def test_polisher_haplotype_preserves_strains():
    """Two strains differing by a cluster of SNPs must not be collapsed."""
    rng = np.random.default_rng(3)
    strain_a = random_seq(rng, 600)
    # strain B: 6 SNPs spread out
    b = list(strain_a)
    for pos in range(50, 600, 100):
        b[pos] = {"A": "C", "C": "A", "G": "T", "T": "G"}[b[pos]]
    strain_b = "".join(b)

    reads = []
    for i in range(6):
        d = mutate(rng, strain_a, 0.04)
        reads.append(SeqRecord(f"a{i}", d, "I" * len(d)))
    for i in range(6):
        d = mutate(rng, strain_b, 0.04)
        reads.append(SeqRecord(f"b{i}", d, "I" * len(d)))

    from vechat_tpu.io.paf import PafRecord

    overlaps = []
    t = reads[6]  # a strain-B read as target
    for q in reads:
        if q.name == t.name:
            continue
        overlaps.append(
            PafRecord(
                q_name=q.name,
                q_length=len(q.data),
                q_begin=0,
                q_end=len(q.data),
                strand=False,
                t_name=t.name,
                t_length=len(t.data),
                t_begin=0,
                t_end=len(t.data),
                num_matches=500,
                alignment_length=600,
                mapq=60,
            )
        )

    p = Polisher(polisher_type="f", haplotype=True, min_confidence=0.2, min_support=0.2)
    p.initialize([t], reads, overlaps)
    out = p.polish()
    corrected = out[0].data
    d_b = edit_distance(encode(corrected), encode(strain_b))
    d_a = edit_distance(encode(corrected), encode(strain_a))
    # haplotype-aware correction keeps the read on its own strain
    assert d_b < d_a


def test_polisher_too_few_layers_unpolished():
    rng = np.random.default_rng(4)
    truth, reads, overlaps = make_dataset(rng, n_reads=2)
    p = Polisher(polisher_type="f", haplotype=True)
    p.initialize(reads, reads, overlaps[:1])
    out = p.polish(drop_unpolished_sequences=False)
    # 1 layer -> <3 seqs -> backbone passthrough, XC ratio 0
    assert out[0].data == reads[0].data
    assert "XC:f:0.000000" in out[0].name
    assert p.polish.__name__  # noqa
    out2_p = Polisher(polisher_type="f", haplotype=True)
    out2_p.initialize(reads, reads, overlaps[:1])
    assert out2_p.polish(drop_unpolished_sequences=True) == []


def test_polisher_multiwindow_target():
    rng = np.random.default_rng(5)
    truth, reads, overlaps = make_dataset(rng, true_len=1300, n_reads=10, err=0.06)
    p = Polisher(polisher_type="f", haplotype=True, min_confidence=0.2, min_support=0.2)
    p.initialize(reads, reads, overlaps)
    out = p.polish()
    assert len(out) == 1
    d_before = edit_distance(encode(reads[0].data), encode(truth))
    d_after = edit_distance(encode(out[0].data), encode(truth))
    assert d_after < d_before


def test_fasta_last_window_quirk():
    """For FASTA inputs the reference's backbone-quality C-string sniff
    (src/window.cpp:223) sends the short LAST window of each read down the
    FASTQ branch, whose x1000 average weight prunes every edge — the last
    window collapses to (almost) nothing. We replicate that faithfully."""
    rng = np.random.default_rng(7)
    truth, reads, overlaps = make_dataset(rng, true_len=700, fastq=False)
    p = Polisher(polisher_type="f", haplotype=True, min_confidence=0.2, min_support=0.2)
    p.initialize(reads, reads, overlaps)
    out = p.polish()
    # full window 0 improves, last window (~200bp) collapses
    assert len(out[0].data) < 600


def test_error_threshold_filter():
    rng = np.random.default_rng(6)
    truth, reads, overlaps = make_dataset(rng)
    # make one overlap exceed the error threshold via span mismatch
    overlaps[0].q_end = overlaps[0].q_length // 3
    p = Polisher(polisher_type="f", haplotype=False, error_threshold=0.3)
    p.initialize(reads, reads, overlaps)
    # that overlap dropped: coverage reflects remaining ones
    assert p.targets_coverages[0] == len(overlaps) - 1
