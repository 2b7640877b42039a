"""TPU-hardware byte-exactness check for the relayout engines (round 4).

Why: the default relayout engine dtype flipped to u8 in round 3, and the
factored engine (GVCT_RELAYOUT_FACT=1) landed for >=4096-wide grids; the CI
suite enforces bit-exactness on CPU / interpret mode only, so a libtpu
lowering change could break the byte-identical invariant ON HARDWARE with
no test noticing (round-3 advisor finding).  This tool runs the resident
ingest -> step -> readback path on a REAL TPU under each engine config and
byte-compares against the NumPy golden oracle (models/golden.py — the
cpu.h semantics, quirks Q2-Q9 pinned).

Each config runs in its own subprocess: the GVCT_RELAYOUT* knobs are read
at trace time, so separate processes both avoid stale jit caches and put a
timeout guard between a wedged tunnel and the calling round.  The parent
itself runs on CPU (it only computes golden frames).

Geometries: one regular (64x48) and one Q9-sheared (56x72, extended chroma
width % 8 != 0) per config; --geometry adds a custom WxH.

Usage:  python -m tools.tpu_engine_check [--timeout 600] [--geometry WxH]
Wired as a slow-tier test: tests/test_tpu_hardware.py (skips off-TPU or on
a wedged tunnel; FAILS on a hardware byte mismatch).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

# The parent only computes golden oracles: force CPU and skip the axon
# registration leg (which HANGS while the remote backend is busy/wedged)
# before anything imports jax.  Keep the ORIGINAL pool address around: the
# device children need it NON-EMPTY (sitecustomize registers the axon
# backend only when it is set; without it they'd fail instantly with
# "Backend 'axon' is not in the list of known backends").
_ORIG_POOL_IPS = os.environ.get("PALLAS_AXON_POOL_IPS") or "127.0.0.1"
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
# sitecustomize may have ALREADY imported jax (it registers the axon plugin
# at interpreter startup when the pool var is set), freezing JAX_PLATFORMS=
# axon into its config -- the env overrides above are then too late.  Update
# the live config like tests/conftest.py does.
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

# engine configs to verify on hardware; every one must be byte-identical.
# The four relayout-dtype configs drive the resident tile-planes path; the
# two "packed_*" configs drive the packed YV12 StreamingDeblocker step
# (GVCT_ENGINE_CHECK_DRIVER=packed) so the packed graph's chroma-boundary
# engines (retile copies vs the round-5 parity-split fold dots) also get a
# hardware byte-compare — on the sheared 56x72 geometry the fold config
# exercises its silent retile fallback.
CONFIGS = {
    "u8": {"GVCT_RELAYOUT": "mxu", "GVCT_RELAYOUT_DTYPE": "u8"},
    "u8_factored": {"GVCT_RELAYOUT": "mxu", "GVCT_RELAYOUT_DTYPE": "u8",
                    "GVCT_RELAYOUT_FACT": "1"},
    "s8": {"GVCT_RELAYOUT": "mxu", "GVCT_RELAYOUT_DTYPE": "s8"},
    "bf16": {"GVCT_RELAYOUT": "mxu", "GVCT_RELAYOUT_DTYPE": "bf16"},
    "packed_retile": {"GVCT_RELAYOUT": "mxu", "GVCT_RELAYOUT_DTYPE": "u8",
                      "GVCT_ENGINE_CHECK_DRIVER": "packed",
                      "GVCT_PACKED_CHROMA": "retile"},
    "packed_fold": {"GVCT_RELAYOUT": "mxu", "GVCT_RELAYOUT_DTYPE": "u8",
                    "GVCT_ENGINE_CHECK_DRIVER": "packed",
                    "GVCT_PACKED_CHROMA": "fold"},
}

GEOMETRIES = [(64, 48), (56, 72)]  # regular + Q9-sheared chroma view

_CHILD = """
import json, os, sys
import numpy as np
sys.path.insert(0, {repo!r})
import jax
if (jax.default_backend() != "tpu"
        and not os.environ.get("GVCT_ENGINE_CHECK_ALLOW_CPU")):
    print("ENGINE_SKIP no-tpu", jax.default_backend())
    sys.exit(0)
driver = os.environ.get("GVCT_ENGINE_CHECK_DRIVER", "resident")
if driver == "packed":
    from gpu_video_codec_tpu.models.streaming import StreamingDeblocker
    from gpu_video_codec_tpu.ops.tables import HALF_BLOCK, SAMPLE_BLOCK_SIZE
else:
    from gpu_video_codec_tpu.models.resident import ResidentDeblocker
data = np.load({npz!r})
results = {{}}
for key in data.files:
    if not key.startswith("raw_"):
        continue
    tag = key[4:]
    w, h = (int(v) for v in tag.split("x"))
    raw, want = data[key], data["gold_" + tag]
    if driver == "packed":
        sd = StreamingDeblocker(w, h, qp=35)
        # the fold must actually engage on non-sheared geometries (else this
        # config would silently re-test retile) and fall back on sheared ones
        fold_wanted = (os.environ.get("GVCT_PACKED_CHROMA") == "fold"
                       and (w // 2 + 2 * HALF_BLOCK) % SAMPLE_BLOCK_SIZE == 0)
        assert sd._chroma_fold == fold_wanted, (tag, sd._chroma_fold)
        got = np.asarray(jax.device_get(sd._step_borrow(
            jax.device_put(raw.reshape(3 * h // 2, w))))).ravel()
    else:
        got = ResidentDeblocker(w, h, qp=35)(raw)
    results[tag] = bool(np.array_equal(got, want))
print("ENGINE_RESULT", json.dumps(results))
"""


def _golden_packed(raw: np.ndarray, w: int, h: int, qp: int) -> np.ndarray:
    from gpu_video_codec_tpu.models.golden import deblock_frame_golden
    from gpu_video_codec_tpu.utils.bs import BoundaryStrength
    from gpu_video_codec_tpu.utils.yuv import (
        planes_from_yv12_bytes, yv12_bytes_from_planes,
    )

    frame = planes_from_yv12_bytes(raw.tobytes(), w, h)
    out = deblock_frame_golden(frame, BoundaryStrength.intra_default(w, h), qp)
    return np.frombuffer(yv12_bytes_from_planes(out), np.uint8)


def run(timeout: int = 600, extra_geometry: tuple[int, int] | None = None,
        platform: str = "axon") -> dict:
    geoms = GEOMETRIES + ([extra_geometry] if extra_geometry else [])
    rng = np.random.default_rng(7)
    arrays = {}
    for w, h in geoms:
        raw = rng.integers(0, 256, 3 * w * h // 2, dtype=np.uint8)
        arrays[f"raw_{w}x{h}"] = raw
        arrays[f"gold_{w}x{h}"] = _golden_packed(raw, w, h, 35)

    out: dict = {"platform": platform, "configs": {}}
    with tempfile.TemporaryDirectory() as td:
        npz = os.path.join(td, "frames.npz")
        np.savez(npz, **arrays)
        child_src = _CHILD.format(repo=REPO, npz=npz)
        for name, knobs in CONFIGS.items():
            env = dict(os.environ)
            for k in ("GVCT_RELAYOUT", "GVCT_RELAYOUT_DTYPE",
                      "GVCT_RELAYOUT_FACT", "GVCT_RELAYOUT_SPLIT",
                      "GVCT_PACKED_CHROMA", "GVCT_ENGINE_CHECK_DRIVER",
                      "JAX_PLATFORM_NAME"):
                env.pop(k, None)
            env.update(knobs)
            env["JAX_PLATFORMS"] = platform
            # non-empty pool address: required for the child's sitecustomize
            # to register the axon backend at all (see module docstring note)
            env["PALLAS_AXON_POOL_IPS"] = (
                _ORIG_POOL_IPS if platform == "axon" else "")
            # persistent compile cache (same one the test suite uses):
            # off-TPU the interpret-mode Pallas compiles dominate child time
            env.setdefault("JAX_COMPILATION_CACHE_DIR",
                           os.path.join(REPO, ".jax_cache"))
            env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
            env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
            try:
                proc = subprocess.run(
                    [sys.executable, "-c", child_src], env=env,
                    capture_output=True, text=True, timeout=timeout)
            except subprocess.TimeoutExpired:
                # a wedged tunnel would eat the full timeout once per
                # config; one data point is enough — bail
                out["configs"][name] = {"status": "timeout"}
                break
            row: dict = {"rc": proc.returncode}
            for line in proc.stdout.splitlines():
                if line.startswith("ENGINE_SKIP"):
                    row["status"] = "skip"
                    row["reason"] = line.split(None, 1)[1]
                elif line.startswith("ENGINE_RESULT"):
                    row["status"] = "ran"
                    row["byte_exact"] = json.loads(line.split(None, 1)[1])
            if "status" not in row:
                row["status"] = "error"
                row["stderr_tail"] = proc.stderr[-500:]
            out["configs"][name] = row
    statuses = {r["status"] for r in out["configs"].values()}
    out["ok"] = statuses == {"ran"} and all(
        all(r["byte_exact"].values()) for r in out["configs"].values())
    out["skipped"] = "ran" not in statuses
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--timeout", type=int, default=600)
    ap.add_argument("--geometry", type=str, default=None,
                    help="extra WxH geometry, e.g. 1920x1080")
    ap.add_argument("--platform", type=str, default="axon")
    ap.add_argument("--allow-cpu", action="store_true",
                    help="run the engine configs even off-TPU (plumbing check)")
    args = ap.parse_args()
    if args.allow_cpu:
        os.environ["GVCT_ENGINE_CHECK_ALLOW_CPU"] = "1"
    geo = None
    if args.geometry:
        w, h = args.geometry.lower().split("x")
        geo = (int(w), int(h))
    print(json.dumps(run(args.timeout, geo, args.platform), indent=2))
