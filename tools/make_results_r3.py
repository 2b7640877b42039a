#!/usr/bin/env python
"""Produce bench/RESULTS_r3.json — the round-3 results artifact.

Round-2 verdict weak #4 / next-round item 5: the CPU story must be airtight
on this 1-core host.  This artifact therefore centers on
`bench_cpu_interleaved` — native and compiled-reference reps strictly
alternated per (geometry, thread count) so shared-core noise hits both
sides equally — with per-row rep-spread noise bands and a summary that
classifies every native loss as real or within-noise.  The TPU-side
numbers live in BENCH_r03.json (driver-captured) and docs/PERF.md.

Run on an otherwise-idle host: `python tools/make_results_r3.py`.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-only: keep jax off the axon tunnel for this artifact.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")

from bench.bench_lib import bench_cpu_interleaved, device_info  # noqa: E402


def main() -> None:
    out = {
        "round": 3,
        "what": (
            "same-host native-vs-compiled-reference CPU comparison, "
            "interleaved reps (round-2 verdict item 5); TPU-side numbers "
            "are in BENCH_r03.json and docs/PERF.md"),
        "device": device_info(),
        "cpu_interleaved": bench_cpu_interleaved(),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench", "RESULTS_r3.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print(path)
    print(json.dumps(out["cpu_interleaved"]["summary"], indent=2))


if __name__ == "__main__":
    main()
