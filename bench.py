#!/usr/bin/env python
"""Driver entry point: prints ONE JSON line with the headline benchmark.

Metric: filtered Mpix/s/chip at 1080p YV12, KERNEL-ONLY, measured as DEVICE
time from profiler traces (utils/tracing.py) on the device-resident
pipeline whose per-step graph is exactly the fused Pallas kernels -- the
same "without copy" definition as the reference's best published number
(CUDA-event-bracketed GPU kernel time with pinned memory, 744 Mpix/s on a
GTX 1060 Max-Q, BASELINE.md), which vs_baseline divides by.  The packed
full-graph device time (kernels + layout matmuls) and the copy-overlap
streaming rate are in details; in this dev environment the pipeline is
bound by the tunneled host->TPU link, not the framework."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from bench.bench_lib import headline

    result = headline()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
