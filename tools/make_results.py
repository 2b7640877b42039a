#!/usr/bin/env python
"""Produce bench/RESULTS_r<N>.json — the per-round CPU results artifact.

Centers on `bench_cpu_interleaved` — native and compiled-reference reps
strictly alternated per (geometry, thread count) so shared-core noise hits
both sides equally on this 1-core host — with per-row rep-spread noise bands
and a summary that classifies every native loss as real or within-noise.
The TPU-side numbers live in BENCH_r<N>.json (driver-captured) and
docs/PERF.md.

Run on an otherwise-idle host: `python tools/make_results.py --round 4`.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-only: keep jax off the axon tunnel for this artifact.  Force-set (the
# shell profile exports JAX_PLATFORMS=axon, so setdefault would lose), and
# skip axon plugin registration entirely -- a wedged remote backend otherwise
# blocks even `import jax` (CLAUDE.md "Environment gotchas").
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
# sitecustomize registers the axon plugin at interpreter startup (when the
# profile's PALLAS_AXON_POOL_IPS is set), importing jax BEFORE this script
# body runs -- the env overrides above are then frozen out of jax's config
# and device_info() would block on the axon tunnel (cost a 36-min hang in
# round 5).  Update the live config like tests/conftest.py does.
if "jax" in sys.modules:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")

from bench.bench_lib import bench_cpu_interleaved, device_info  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    args = ap.parse_args()
    out = {
        "round": args.round,
        "what": (
            "same-host native-vs-compiled-reference CPU comparison, "
            "interleaved reps; TPU-side numbers are in "
            f"BENCH_r{args.round:02d}.json and docs/PERF.md"),
        "device": device_info(),
        "cpu_interleaved": bench_cpu_interleaved(),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench", f"RESULTS_r{args.round}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(path)
    print(json.dumps(out["cpu_interleaved"]["summary"], indent=2))


if __name__ == "__main__":
    main()
