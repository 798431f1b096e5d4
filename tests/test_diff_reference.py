"""Differential parity vs the REFERENCE vechat_racon binary (built offline
from /root/reference by refbuild/build.sh with shimmed edlib/thread_pool).

Full matrix lives in scripts/diff_reference.py (~15 min); this test runs the
two flagship cases and is gated on VECHAT_DIFF_REF=1 (slow) or the presence
of a prebuilt refbuild/bin/vechat_racon.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = os.path.join(REPO, "refbuild", "bin", "vechat_racon")

pytestmark = pytest.mark.skipif(
    not (os.environ.get("VECHAT_DIFF_REF") or os.path.exists(REF_BIN)),
    reason="reference binary not built; set VECHAT_DIFF_REF=1 to build+run",
)


def test_diff_reference_flagship_cases():
    r = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "scripts", "diff_reference.py"),
            "--cases",
            "haplo_wrapper",
            "linear",
        ],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd=REPO,
    )
    assert r.returncode == 0, r.stdout + r.stderr
