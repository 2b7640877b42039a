#!/usr/bin/env python
"""End-of-chain validation: diff this framework's golden model against the
ACTUAL reference implementation, compiled from the read-only reference mount.

The reference's CPU path (hevc_deblocking_filter_cpu.h) is portable C++; this
tool compiles a tiny driver against it (no reference code is copied into this
repository -- the header is included straight from REF_DIR at build time),
runs it on the bundled frames across QPs, and byte-compares with our golden.

Result on this machine: byte-IDENTICAL on all bundled frames at QPs
20/27/35/51 -- including the border band, i.e. the reference's uninitialized
padding reads zeros under glibc fresh allocations, matching our defined
padding == 0 (quirk Q6).

Usage: python tools/validate_vs_reference.py [REF_DIR]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_REF = "/root/reference/hevc_deblocking_filter"

DRIVER = r"""
// Validation driver: runs the REFERENCE CPU implementation (included from
// the read-only reference checkout) on one YV12 frame.
#include "hevc_deblocking_filter_cpu.h"
#include <cstdlib>
#include <cstdio>
int main(int argc, char **argv) {
    if (argc != 6) { fprintf(stderr, "usage: %s in w h qp out\n", argv[0]); return 2; }
    try {
        ReadYuvFrame frame(argv[1], atoi(argv[2]), atoi(argv[3]), atoi(argv[4]));
        frame.DeblockingFilter(1);
        frame.Save(argv[5]);
    } catch (const char *e) { fprintf(stderr, "error: %s\n", e); return 1; }
    return 0;
}
"""

CASES = [
    ("mother-daughter_352x288_yv12.yuv", 352, 288, 35),  # the committed workload
    ("image1_352x288_yv12.yuv", 352, 288, 35),
    ("image2_768x576.yuv", 768, 576, 35),
    ("mother-daughter_352x288_yv12.yuv", 352, 288, 20),
    ("mother-daughter_352x288_yv12.yuv", 352, 288, 51),
    ("image2_768x576.yuv", 768, 576, 27),
]


def build_reference(ref_dir: str, workdir: str) -> str:
    src = os.path.join(workdir, "ref_main.cpp")
    exe = os.path.join(workdir, "ref_deblock")
    with open(src, "w") as f:
        f.write(DRIVER)
    subprocess.run(
        ["g++", "-O2", "-fopenmp", f"-I{ref_dir}", "-o", exe, src],
        check=True, capture_output=True, text=True,
    )
    return exe


def main() -> int:
    ref_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_REF
    header = os.path.join(ref_dir, "hevc_deblocking_filter_cpu.h")
    if not os.path.exists(header):
        print(f"reference header not found at {header}; pass REF_DIR", file=sys.stderr)
        return 2

    sys.path.insert(0, REPO)
    import numpy as np

    from gpu_video_codec_tpu.models.golden import deblock_frame_golden
    from gpu_video_codec_tpu.utils.bs import BoundaryStrength
    from gpu_video_codec_tpu.utils.yuv import read_yv12, yv12_bytes_from_planes

    failures = 0
    with tempfile.TemporaryDirectory() as td:
        exe = build_reference(ref_dir, td)
        for name, w, h, qp in CASES:
            inp = os.path.join(REPO, "testdata", name)
            out = os.path.join(td, "ref_out.yuv")
            subprocess.run([exe, inp, str(w), str(h), str(qp), out], check=True)
            ref = np.fromfile(out, np.uint8)
            gold = deblock_frame_golden(
                read_yv12(inp, w, h), BoundaryStrength.intra_default(w, h), qp
            )
            ours = np.frombuffer(yv12_bytes_from_planes(gold), np.uint8)
            diffs = int(np.sum(ours != ref))
            status = "IDENTICAL" if diffs == 0 else f"{diffs} byte diffs"
            print(f"{name} {w}x{h} qp={qp}: {status}")
            failures += diffs != 0
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
