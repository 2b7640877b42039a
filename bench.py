#!/usr/bin/env python
"""Driver entry point: prints ONE JSON line with the headline benchmark.

Metric: filtered Mpix/s/chip at 1080p YV12 (luma pixels, copy-overlap
streaming pipeline, fused Pallas kernel).  vs_baseline is the ratio to the
reference's best published number (GPU kernel-only with pinned memory,
744 Mpix/s on a GTX 1060 Max-Q -- see BASELINE.md)."""

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
