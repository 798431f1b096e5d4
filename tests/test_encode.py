import numpy as np
import pytest

from vechat_tpu.ops.encode import (
    encode,
    decode,
    revcomp_codes,
    phred_weights,
    phred_prob_sum,
)


def test_encode_decode_roundtrip():
    s = "ACGTNACGT"
    assert decode(encode(s)) == s


def test_encode_rejects_unknown():
    with pytest.raises(ValueError):
        encode("ACG?")


def test_revcomp_codes():
    assert decode(revcomp_codes(encode("AACGTN"))) == "NACGTT"


def test_phred_weights_match_reference_formula():
    # w = trunc((1 - 10**((33-q)/10)) * 1000), reference graph.cpp:169
    q = "!5I"  # Q0, Q20, Q40
    w = phred_weights(q, 3)
    assert w.dtype == np.uint32
    assert w[0] == 0
    assert w[1] == int((1 - 10 ** ((33 - ord("5")) / 10)) * 1000)  # 990
    assert w[2] == int((1 - 10 ** ((33 - ord("I")) / 10)) * 1000)  # 999


def test_phred_weights_fasta_default():
    w = phred_weights(None, 4)
    assert (w == 1).all()


def test_phred_prob_sum():
    assert phred_prob_sum("!!") == 0.0
    assert abs(phred_prob_sum("55") - 2 * 0.99) < 1e-9
