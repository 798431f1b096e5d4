import numpy as np
import pytest

from vechat_tpu.ops.encode import encode
from vechat_tpu.ops.pairwise import (
    cigar_spans,
    edit_align,
    edit_distance,
    edit_distance_row,
    ops_to_cigar,
)


def brute_edit(a, b):
    H = np.zeros((len(a) + 1, len(b) + 1), dtype=int)
    H[0, :] = np.arange(len(b) + 1)
    H[:, 0] = np.arange(len(a) + 1)
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            H[i, j] = min(
                H[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
                H[i - 1, j] + 1,
                H[i, j - 1] + 1,
            )
    return int(H[-1, -1])


def cigar_cost(cigar, q, t):
    """Edit cost implied by walking the CIGAR."""
    import re

    qi = ti = cost = 0
    for num, op in re.findall(r"(\d+)([MID])", cigar):
        num = int(num)
        if op == "M":
            cost += int(np.sum(q[qi : qi + num] != t[ti : ti + num]))
            qi += num
            ti += num
        elif op == "I":
            cost += num
            qi += num
        else:
            cost += num
            ti += num
    assert qi == len(q) and ti == len(t)
    return cost


@pytest.mark.parametrize("seed", range(8))
def test_edit_align_optimal(seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 4, size=rng.integers(1, 60)).astype(np.uint8)
    b = rng.integers(0, 4, size=rng.integers(1, 60)).astype(np.uint8)
    cigar = edit_align(a, b)
    assert cigar_cost(cigar, a, b) == brute_edit(a, b)
    assert cigar_spans(cigar) == (len(a), len(b))


def test_edit_distance_row():
    a = encode("ACGT")
    b = encode("AGT")
    assert edit_distance(a, b) == 1
    row = edit_distance_row(a, b)
    assert row[-1] == 1
    assert row[0] == 4  # all-deleted


def test_hirschberg_matches_full(monkeypatch):
    import vechat_tpu.ops.pairwise as pw

    rng = np.random.default_rng(0)
    a = rng.integers(0, 4, size=3000).astype(np.uint8)
    # b = a with edits
    b = a.copy()
    b[::97] = (b[::97] + 1) % 4
    full_cost = brute_cost = None
    cigar_full = pw.edit_align(a, b)
    monkeypatch.setattr(pw, "FULL_DP_MAX_CELLS", 1000)
    monkeypatch.setattr(pw, "FULL_DP_MIN_ROWS", 64)
    cigar_h = pw.edit_align(a, b)
    assert cigar_cost(cigar_full, a, b) == cigar_cost(cigar_h, a, b)
    assert cigar_spans(cigar_h) == (len(a), len(b))


def test_empty_inputs():
    assert edit_align(np.array([], dtype=np.uint8), encode("AC")) == "2D"
    assert edit_align(encode("AC"), np.array([], dtype=np.uint8)) == "2I"


def test_ops_to_cigar():
    assert ops_to_cigar(list("MMMIDD")) == "3M1I2D"
