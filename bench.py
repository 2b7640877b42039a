#!/usr/bin/env python
"""Driver entry point: prints ONE JSON line with the headline benchmark.

Metric: filtered Mpix/s/chip at 1080p YV12, KERNEL-ONLY (luma pixels, fused
Pallas kernel, no host copy) -- the same "without copy" definition as the
reference's best published number (GPU kernel-only with pinned memory,
744 Mpix/s on a GTX 1060 Max-Q, BASELINE.md), which vs_baseline divides by.
The copy-overlap streaming pipeline rate is reported in details
(pipelined_mpix_s); in this dev environment it is bound by the tunneled
host->TPU link, not the framework."""

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
