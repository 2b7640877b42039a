"""The examples/ scripts are living documentation (each verifies itself
against the golden oracle); keep them running.  Slow tier: each pays its
own interpreter + jit compiles in a subprocess."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
@pytest.mark.parametrize("name", [
    "one_shot", "streaming", "resident_chain", "mesh_streams",
    "multi_stream",
])
def test_example_runs_and_self_verifies(name):
    env = dict(os.environ)
    env.pop("GVCT_RELAYOUT", None)
    env.pop("GVCT_RELAYOUT_SPLIT", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", f"{name}.py")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "bit-exact" in r.stdout or "oracle" in r.stdout, r.stdout
