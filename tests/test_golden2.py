"""Second golden: frozen 60-read 2-strain pb-mode dataset (VERDICT r1 weak
#6 — the round-1 golden was 16 reads, ont+host only). Locks the HPC-kmer
overlapper + pb parameter path byte-for-byte. Regenerate
tests/data/golden2_expected_pb.fa only for intentional behaviour changes:

    python -m vechat_tpu.cli.vechat_main tests/data/golden2_reads.fq \
        --platform pb --backend host -o tests/data/golden2_expected_pb.fa
"""

import os

import pytest

DATA = os.path.join(os.path.dirname(__file__), "data")

slow = pytest.mark.skipif(
    os.environ.get("VECHAT_SKIP_SLOW_TESTS") == "1",
    reason="skipped by VECHAT_SKIP_SLOW_TESTS=1",
)


@slow
def test_pipeline_golden_pb(tmp_path):
    from vechat_tpu.cli.vechat_main import main

    out = tmp_path / "out.fa"
    rc = main(
        [
            os.path.join(DATA, "golden2_reads.fq"),
            "-o",
            str(out),
            "--platform",
            "pb",
            "--backend",
            "host",
        ]
    )
    assert rc == 0
    expected = open(os.path.join(DATA, "golden2_expected_pb.fa")).read()
    assert out.read_text() == expected


@slow
def test_pipeline_golden_pb_threads(tmp_path):
    """-t 4 must not change a single byte (host graph ops are threaded
    across windows, serial within a window)."""
    from vechat_tpu.cli.vechat_main import main

    out = tmp_path / "out.fa"
    rc = main(
        [
            os.path.join(DATA, "golden2_reads.fq"),
            "-o",
            str(out),
            "--platform",
            "pb",
            "--backend",
            "host",
            "-t",
            "4",
        ]
    )
    assert rc == 0
    expected = open(os.path.join(DATA, "golden2_expected_pb.fa")).read()
    assert out.read_text() == expected
