"""Native C++ parser vs the Python parser."""

import gzip

import numpy as np
import pytest

from vechat_tpu.io.fastx import iter_fastx, read_fastx
from vechat_tpu.io.native import get_lib, read_fastx_native

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native toolchain unavailable"
)


def _assert_same(path):
    native = read_fastx_native(path)
    python = list(iter_fastx(path))
    assert len(native) == len(python)
    for a, b in zip(native, python):
        assert (a.name, a.data, a.quality) == (b.name, b.data, b.quality)


def test_native_fasta(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">r1 description\nACGT\nacgt\n>r2\nTTTT\n")
    _assert_same(p)


def test_native_fastq_gz(tmp_path):
    rng = np.random.default_rng(0)
    p = tmp_path / "x.fq.gz"
    with gzip.open(p, "wt") as fw:
        for i in range(50):
            n = int(rng.integers(10, 200))
            seq = "".join(rng.choice(list("acgtACGT"), size=n))
            qual = "".join(chr(int(q)) for q in rng.integers(33, 74, size=n))
            fw.write(f"@read{i} extra stuff\n{seq}\n+\n{qual}\n")
    _assert_same(p)


def test_native_dummy_quality_dropped(tmp_path):
    p = tmp_path / "x.fq"
    p.write_text("@r1\nACGT\n+\n!!!!\n@r2\nACGT\n+\nIIII\n")
    recs = read_fastx_native(p)
    assert recs[0].quality is None
    assert recs[1].quality == "IIII"


def test_read_fastx_uses_native(tmp_path):
    p = tmp_path / "x.fa"
    p.write_text(">a\nACGT\n")
    assert read_fastx(p)[0].data == "ACGT"
