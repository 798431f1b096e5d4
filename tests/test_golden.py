"""Golden byte-for-byte regression of the full two-round pipeline on a frozen
synthetic 2-strain dataset (the kind of end-to-end golden the reference never
had — SURVEY §4). Regenerate tests/data/golden_expected.fa only for
intentional behaviour changes."""

import os

import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")


def test_pipeline_golden(tmp_path):
    from vechat_tpu.cli.vechat_main import main

    out = tmp_path / "out.fa"
    rc = main(
        [
            os.path.join(DATA, "golden_reads.fq"),
            "-o",
            str(out),
            "--platform",
            "ont",
            "--backend",
            "host",
        ]
    )
    assert rc == 0
    expected = open(os.path.join(DATA, "golden_expected.fa")).read()
    assert out.read_text() == expected
