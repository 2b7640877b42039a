"""Golden model vs the ACTUAL reference implementation, compiled from the
read-only reference checkout (skipped when the checkout or g++ is absent).

This closes the validation chain end to end: reference C++ binary == golden
== jnp == pallas == native, byte-exact."""

import os
import shutil
import subprocess
import sys

import pytest

REF_DIR = "/root/reference/hevc_deblocking_filter"

pytestmark = [
    pytest.mark.slow,  # compiles + runs the reference binary: minutes
    pytest.mark.skipif(
        not (os.path.exists(os.path.join(REF_DIR, "hevc_deblocking_filter_cpu.h"))
             and shutil.which("g++")),
        reason="reference checkout or g++ unavailable",
    ),
]


def test_golden_matches_compiled_reference(tmp_path):
    tool = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tools", "validate_vs_reference.py")
    r = subprocess.run([sys.executable, tool, REF_DIR],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "IDENTICAL" in r.stdout
    # every case must be identical
    for line in r.stdout.strip().splitlines():
        assert line.endswith("IDENTICAL"), line


def test_fullscale_1080p_vs_compiled_reference():
    """Production-scale validation (round-3 verdict item 5): synthetic
    1920x1080 (the Q9 chroma row-truncation geometry at real scale) must be
    byte-identical between our golden and the compiled reference, and the
    reference's own 1-thread and 4-thread outputs must agree (thread
    determinism at production scale)."""
    tool = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tools", "validate_vs_reference.py")
    r = subprocess.run([sys.executable, tool, "--fullscale", REF_DIR],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    lines = r.stdout.strip().splitlines()
    assert any("1-thread vs 4-thread reference: IDENTICAL" in ln for ln in lines), r.stdout
    # golden must match byte-for-byte outside the reference's UB regions
    # (the Q2xQ9 last chroma tile row filters with OOB heap-garbage BS
    # there; our golden pins OOB BS reads = 0)
    assert any("golden vs compiled reference: IDENTICAL" in ln for ln in lines), r.stdout
    assert not any("REAL byte diffs" in ln for ln in lines), r.stdout


def test_fuzz_vs_compiled_reference():
    """Seeded 6-case randomized campaign against the compiled reference
    (dims incl. Q9-triggering widths, random QP/BS)."""
    tool = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tools", "validate_vs_reference.py")
    r = subprocess.run([sys.executable, tool, "--fuzz", "6", "3"],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "0 real divergences" in r.stdout


def test_fuzz_native_vs_compiled_reference():
    """The native SIMD backend (AVX-512 tier where supported) fuzzed DIRECTLY
    against the compiled reference -- two independent implementations with no
    shared code, closing the chain golden == native == reference without
    relying on transitivity."""
    tool = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "tools", "validate_vs_reference.py")
    r = subprocess.run([sys.executable, tool, "--fuzz", "6", "11",
                        "--backend", "native"],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "0 real divergences" in r.stdout
