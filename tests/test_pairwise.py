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


def test_native_myers_matches_scalar_dp():
    """The native bit-parallel path (csrc pw_align_myers, the edlib-role
    fast path) must emit byte-identical CIGAR ops to the pure scalar full
    DP at every size — including across its >4096-cell activation
    threshold and the formerly-banded >4M-cell regime."""
    import vechat_tpu.ops.pairwise as pw

    if pw._native_pw_ops(encode("ACGT"), encode("ACT")) is None:
        pytest.skip("native lib unavailable")

    def pure_full_dp(q, t, monkey=pw):
        orig = monkey._native_pw_ops
        monkey._native_pw_ops = lambda *_: None
        try:
            return monkey._full_dp_cigar(q, t)
        finally:
            monkey._native_pw_ops = orig

    rng = np.random.default_rng(11)
    sizes = [(7, 5), (63, 64), (64, 64), (65, 70), (90, 45), (128, 129),
             (300, 310), (513, 500)]
    for lq, lt in sizes:
        q = rng.integers(0, 4, lq).astype(np.uint8)
        t = rng.integers(0, 4, lt).astype(np.uint8)
        assert pw._native_pw_ops(q, t) == pure_full_dp(q, t), (lq, lt)
    # correlated long pair above the old 4M-cell banded threshold
    t = rng.integers(0, 4, 2200).astype(np.uint8)
    q = t.copy()
    idx = rng.random(2200) < 0.08
    q[idx] = rng.integers(0, 4, int(idx.sum()))
    q = np.delete(q, np.where(rng.random(2200) < 0.02)[0])
    assert len(q) * len(t) > 4_000_000
    assert pw._native_pw_ops(q, t) == pure_full_dp(q, t)


def test_empty_inputs():
    assert edit_align(np.array([], dtype=np.uint8), encode("AC")) == "2D"
    assert edit_align(encode("AC"), np.array([], dtype=np.uint8)) == "2I"


def test_ops_to_cigar():
    assert ops_to_cigar(list("MMMIDD")) == "3M1I2D"


def test_native_rle_cigar_matches_python_rle():
    """pw_align_cigar emits the RLE CIGAR natively; it must equal
    ops_to_cigar over the op-level native path at every size."""
    import vechat_tpu.ops.pairwise as pw

    if pw._native_pw_ops(encode("ACGT"), encode("ACT")) is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(3)
    for _ in range(12):
        lq = int(rng.integers(1, 900))
        lt = int(rng.integers(1, 900))
        q = rng.integers(0, 4, lq).astype(np.uint8)
        t = rng.integers(0, 4, lt).astype(np.uint8)
        assert pw._native_pw_cigar(q, t) == pw.ops_to_cigar(
            pw._native_pw_ops(q, t)
        )
