import numpy as np
import pytest

from vechat_tpu.ops.encode import encode
from vechat_tpu.ops.graph_align import AffineAligner, ConvexAligner, LinearAligner
from vechat_tpu.ops.poagraph import PoaGraph


def chain(s):
    g = PoaGraph()
    g.add_alignment([], encode(s), np.ones(len(s), dtype=np.uint32))
    return g


def gotoh_nw(a, b, m, x, g, e):
    """Independent affine-gap NW (Gotoh) for chain-graph cross-checking."""
    NEG = -(10**9)
    la, lb = len(a), len(b)
    H = np.full((la + 1, lb + 1), NEG, dtype=np.int64)
    F = np.full((la + 1, lb + 1), NEG, dtype=np.int64)  # gap in b (vertical)
    E = np.full((la + 1, lb + 1), NEG, dtype=np.int64)  # gap in a (horizontal)
    H[0, 0] = 0
    for j in range(1, lb + 1):
        E[0, j] = g + (j - 1) * e
        H[0, j] = E[0, j]
    for i in range(1, la + 1):
        F[i, 0] = g + (i - 1) * e
        H[i, 0] = F[i, 0]
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            F[i, j] = max(H[i - 1, j] + g, F[i - 1, j] + e)
            E[i, j] = max(H[i, j - 1] + g, E[i, j - 1] + e)
            sub = m if a[i - 1] == b[j - 1] else x
            H[i, j] = max(H[i - 1, j - 1] + sub, F[i, j], E[i, j])
    return int(H[la, lb])


def affine_alignment_score(aln, graph, codes, m, x, g, e):
    """Score an alignment under the affine model (gap runs: g + (len-1)e)."""
    s = 0
    run = None  # 'node' or 'seq' gap run
    for node_id, pos in aln:
        if node_id == -1 or pos == -1:
            kind = "seq" if node_id == -1 else "node"
            if run == kind:
                s += e
            else:
                s += g
            run = kind
        else:
            s += m if graph.codes[node_id] == codes[pos] else x
            run = None
    return s


@pytest.mark.parametrize("seed", range(6))
def test_affine_nw_matches_gotoh_on_chain(seed):
    rng = np.random.default_rng(seed)
    a = "".join(rng.choice(list("ACGT"), size=rng.integers(5, 50)))
    b = "".join(rng.choice(list("ACGT"), size=rng.integers(5, 50)))
    g = chain(a)
    eng = AffineAligner("nw", 5, -4, -8, -6)
    aln, score = eng.align(encode(b), g, return_score=True)
    assert score == gotoh_nw(a, b, 5, -4, -8, -6)
    assert score == affine_alignment_score(aln, g, encode(b), 5, -4, -8, -6)


def test_affine_prefers_long_gaps():
    # affine should keep a deletion contiguous
    g = chain("ACGTAAAAACGT")
    eng = AffineAligner("nw", 5, -4, -8, -1)
    aln, score = eng.align(encode("ACGTACGT"), g, return_score=True)
    node_gaps = [i for i, (v, p) in enumerate(aln) if p == -1]
    # the 4 node-gap steps are contiguous
    assert len(node_gaps) == 4
    assert node_gaps == list(range(node_gaps[0], node_gaps[0] + 4))


def test_affine_sw():
    g = chain("TTTTTACGTACGTTTTTT")
    eng = AffineAligner("sw", 5, -4, -8, -6)
    aln, score = eng.align(encode("ACGTACGT"), g, return_score=True)
    assert score == 40
    nodes = [v for v, _ in aln if v != -1]
    assert len(nodes) == 8


@pytest.mark.parametrize("seed", range(3))
def test_convex_nw_on_chain(seed):
    rng = np.random.default_rng(seed + 100)
    a = "".join(rng.choice(list("ACGT"), size=rng.integers(5, 30)))
    b = "".join(rng.choice(list("ACGT"), size=rng.integers(5, 30)))
    g = chain(a)
    eng = ConvexAligner("nw", 5, -4, -8, -6, -10, -4)
    aln, score = eng.align(encode(b), g, return_score=True)

    # convex score == max of the two affine functions applied per gap run
    def convex_gap(length):
        return max(-8 + (length - 1) * -6, -10 + (length - 1) * -4)

    # verify the alignment's implied score equals reported score
    s = 0
    i = 0
    while i < len(aln):
        v, p = aln[i]
        if v == -1 or p == -1:
            kind = v == -1
            j = i
            while j < len(aln) and (aln[j][0] == -1) == kind and (
                aln[j][0] == -1 or aln[j][1] == -1
            ):
                if (aln[j][0] == -1) != kind or (aln[j][0] != -1 and aln[j][1] != -1):
                    break
                j += 1
            run = j - i
            s += convex_gap(run)
            i = j
        else:
            s += 5 if g.codes[v] == encode(b)[p] else -4
            i += 1
    assert s == score


def test_convex_identical():
    g = chain("ACGTACGT")
    eng = ConvexAligner("nw", 5, -4, -8, -6, -10, -4)
    aln, score = eng.align(encode("ACGTACGT"), g, return_score=True)
    assert score == 40
    assert all(v != -1 and p != -1 for v, p in aln)


def test_engines_agree_when_linear_scores():
    """affine with e == g must equal linear results on scores."""
    rng = np.random.default_rng(5)
    a = "".join(rng.choice(list("ACGT"), size=30))
    b = "".join(rng.choice(list("ACGT"), size=28))
    g = chain(a)
    lin = LinearAligner("nw", 3, -5, -4)
    aff = AffineAligner("nw", 3, -5, -4, -4)
    _, s1 = lin.align(encode(b), g, return_score=True)
    _, s2 = aff.align(encode(b), g, return_score=True)
    assert s1 == s2
