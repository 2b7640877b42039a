"""Slow-tier hardware gate: relayout-engine byte-exactness on a real TPU.

The relayout engines (GVCT_RELAYOUT_DTYPE = u8 | s8 | bf16, plus the
factored u8 variant) are bit-identity-tested on CPU by test_tiles /
test_resident, but the default flipped to u8 in round 3 and the
TPU-hardware equality claim otherwise rests on dev-session device traces
(round-3 advisor finding): a libtpu lowering change could break the
byte-identical invariant on hardware with no test noticing.  This test
runs tools/tpu_engine_check.py, which byte-compares the resident
ingest -> step -> readback path against the golden oracle on the real
device for every engine config, plus the packed StreamingDeblocker step
under both chroma-boundary engines (retile / round-5 fold).

SKIPS when no TPU is reachable or the dev tunnel is wedged (child
timeout); FAILS on an actual hardware byte mismatch.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_relayout_engines_byte_exact_on_tpu():
    proc = subprocess.run(
        [sys.executable, "-m", "tools.tpu_engine_check", "--timeout", "420"],
        capture_output=True, text=True, cwd=REPO, timeout=6 * 420 + 180)
    assert proc.returncode == 0, proc.stderr[-800:]
    result = json.loads(proc.stdout)
    if result["skipped"]:
        reasons = {name: row.get("reason", row["status"])
                   for name, row in result["configs"].items()}
        pytest.skip(f"no TPU reachable: {reasons}")
    # Any config that ran must be byte-exact on every geometry; configs that
    # could not run (tunnel died mid-way) don't mask a real mismatch.
    for name, row in result["configs"].items():
        if row["status"] == "ran":
            assert all(row["byte_exact"].values()), (name, row)
        else:
            assert row["status"] in ("skip", "timeout"), (name, row)
