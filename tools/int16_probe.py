"""Per-round probe: does the current libtpu/Mosaic accept the int16 compute
path in the fused deblock kernel?

Why: the resident step is VPU-bound at ~4x its HBM floor (docs/PERF.md
"Floors"); int16 doubles the vector lanes and is provably bit-exact
(tests/test_pallas.py::test_int16_compute_bitexact).  Blocked so far:
round-2's Mosaic did not legalize int16 vector ALU ops (math.absi,
arith.maxsi) and the re-probe hung the remote AOT compile (>10 min).

This probe compiles + runs the int16 kernel on a small geometry under a
subprocess timeout so a compiler hang cannot take down the calling round,
then bit-compares against int32 ON DEVICE.  If it ever passes, flip the
default dtype for the resident step and bank ~2x.

TOOLCHAIN GATE (round-4 verdict item 2): the probe's subprocess timeout
protects the CALLER, but the hang it triggers wedges the REMOTE backend
for hours (killing the client does not stop the server-side compile —
CLAUDE.md "Environment gotchas"); rounds 2-4 each lost TPU agenda to it,
and probing an UNCHANGED toolchain buys zero information.  The probe now
records the jax/jaxlib/libtpu versions of its last run in
bench/INT16_PROBE_STATE.json and refuses to run again (exit 0, "skipped")
until one of them changes.  --force overrides; never run it before the
round's TPU capture set is banked (tools/tpu_capture.py).

Usage: python -m tools.int16_probe [--timeout 300] [--force]

An upstream-ready minimal repro of the round-2 failures is printed with
--repro: it exercises exactly the two Mosaic gaps (i16 vector ALU
legalization; i16 scalars) in isolation.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = """
import numpy as np, jax, jax.numpy as jnp, sys
sys.path.insert(0, {repo!r})
from gpu_video_codec_tpu.ops.pallas_kernel import deblock_tiles_pallas
from gpu_video_codec_tpu.ops.tables import get_beta, get_tc
from gpu_video_codec_tpu.utils.bs import BoundaryStrength, luma_segment_maps
from gpu_video_codec_tpu.utils.tiles import plane_to_tiles
from gpu_video_codec_tpu.utils.yuv import extend_plane

w, h, qp = 64, 48, 35
rng = np.random.default_rng(0)
plane = extend_plane(rng.integers(0, 256, (h, w), dtype=np.uint8))
bs = BoundaryStrength.intra_default(w, h)
maps = [jnp.asarray(m) for m in luma_segment_maps(bs)]
tiles = jnp.asarray(np.asarray(plane_to_tiles(plane)))
beta, tc = jnp.int32(get_beta(qp)), jnp.int32(get_tc(qp))
a = jax.device_get(deblock_tiles_pallas(tiles, *maps, beta, tc, dtype=jnp.int32))
b = jax.device_get(deblock_tiles_pallas(tiles, *maps, beta, tc, dtype=jnp.int16))
print("INT16_RESULT", bool(np.array_equal(a, b)))
"""

_REPRO = '''
# Minimal repros of the Mosaic int16 gaps blocking the 2x-lane deblock path
# (TPU v5e, libtpu bundled with this jax; observed r2/r3 2026-08):
import jax, jax.numpy as jnp, functools
from jax.experimental import pallas as pl

# 1) i16 vector ALU legalization: abs / max on int16 vectors fail to
#    legalize (math.absi / arith.maxsi on vector<...xi16>).
def k_alu(x_ref, o_ref):
    x = x_ref[...]
    o_ref[...] = jnp.maximum(jnp.abs(x), x)          # absi + maxsi on i16

f1 = jax.jit(lambda x: pl.pallas_call(
    k_alu, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int16))(x))

# 2) i16 scalars: SMEM scalar reads are only legal at i1/i32, so any
#    threshold passed as an int16 scalar must be pre-broadcast to a vector.
def k_scalar(s_ref, x_ref, o_ref):
    o_ref[...] = x_ref[...] + s_ref[0]               # i16 scalar from SMEM

# Observed failure modes: round 2 = legalization error on (1); round-2
# re-probe and round 3 = remote AOT compile hang (>10 min, killed) before
# any diagnostic is emitted, which is itself the more serious regression.
'''


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE_PATH = os.path.join(REPO, "bench", "INT16_PROBE_STATE.json")


def toolchain_versions() -> dict:
    """Local toolchain identity (the remote compiler ships with the same
    wheel set in this environment); cheap — metadata only, no jax import."""
    import importlib.metadata as md

    out = {}
    for pkg in ("jax", "jaxlib", "libtpu"):
        try:
            out[pkg] = md.version(pkg)
        except md.PackageNotFoundError:
            out[pkg] = None
    return out


def gate(state_path: str = STATE_PATH) -> dict | None:
    """Return the skip record if the toolchain is unchanged since the last
    probe (the probe would re-trigger the same hang for zero information);
    None when a probe is warranted."""
    if not os.path.exists(state_path):
        return None
    try:
        with open(state_path) as f:
            state = json.load(f)
    except (OSError, ValueError):
        return None
    if state.get("versions") != toolchain_versions():
        return None  # toolchain changed: a fresh probe has information value
    return {"int16_on_tpu": "skipped-toolchain-unchanged",
            "detail": (f"jax/jaxlib/libtpu unchanged since round "
                       f"{state.get('round')} ({state['versions']}); "
                       f"last result: {state.get('result')} -- re-probing an "
                       "unchanged toolchain only re-wedges the backend "
                       "(use --force after banking the TPU capture set)")}


def record_state(result: dict, round_no: int | None,
                 state_path: str = STATE_PATH) -> None:
    import time

    with open(state_path, "w") as f:
        json.dump({"versions": toolchain_versions(), "round": round_no,
                   "result": result.get("int16_on_tpu"),
                   "probed_at": time.strftime("%FT%T")}, f, indent=2)
        f.write("\n")


def probe(timeout: int = 300) -> dict:
    repo = REPO
    try:
        r = subprocess.run(
            [sys.executable, "-c", _CHILD.format(repo=repo)],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {"int16_on_tpu": "compile-hang",
                "detail": f"no result within {timeout}s (AOT compile hang, "
                          "matching the round-2 re-probe)"}
    if "INT16_RESULT True" in r.stdout:
        return {"int16_on_tpu": "ok-bitexact"}
    if "INT16_RESULT False" in r.stdout:
        return {"int16_on_tpu": "runs-but-wrong"}
    tail = (r.stderr or r.stdout).strip().splitlines()[-8:]
    return {"int16_on_tpu": "compile-error", "tail": tail}


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=300)
    ap.add_argument("--force", action="store_true",
                    help="probe even if the toolchain is unchanged")
    ap.add_argument("--round", type=int, default=None,
                    help="round number recorded in the probe state file")
    ap.add_argument("--repro", action="store_true",
                    help="print the upstream-ready minimal repro and exit")
    a = ap.parse_args()
    if a.repro:
        print(_REPRO)
    else:
        skip = None if a.force else gate()
        if skip is not None:
            print(json.dumps(skip, indent=2))
        else:
            result = probe(a.timeout)
            record_state(result, a.round)
            print(json.dumps(result, indent=2))
