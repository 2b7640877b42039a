#!/usr/bin/env python
"""Driver entry point: prints ONE JSON line with the headline benchmark.

Metric: filtered Mpix/s/chip at 1080p YV12 through the PACKED FULL GRAPH
(raw YV12 bytes in HBM -> filtered YV12 bytes in HBM), measured as DEVICE
time from profiler traces (utils/tracing.py), including every layout pass
the packed contract requires.  This is the like-for-like analogue of the
reference's best published bracket ("GPU kernel time without copy",
CUDA-event around kernels on its natural device format, 744 Mpix/s on a
GTX 1060 Max-Q, BASELINE.md), which vs_baseline divides by.  The
device-resident kernel-only rate (tile-planes in/out), the copy-overlap
streaming rate, the device-fed overlap harness, and the link microbench
are in details; in this dev environment the host-fed path is bound by the
tunneled host->TPU link, not the framework."""

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
