"""Command-line driver: the reference main()'s role (main.cu:109-141), with
actual argument parsing instead of hand-edited constants.

    tpu-deblock --input in.yuv --width 352 --height 288 --qp 35 \
                --output out.yuv [--backend pallas|jnp|native|golden]
    tpu-deblock --device-info
    tpu-deblock --input ... --bench      # per-frame timing like the README table
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

from .utils.config import BACKENDS, DeblockConfig


def device_info() -> dict:
    """GetGpuDeviceInfo equivalent (main.cu:92-107)."""
    import jax

    devs = jax.devices()
    return {
        "backend": jax.default_backend(),
        "num_devices": len(devs),
        "devices": [
            {"id": d.id, "platform": d.platform,
             "kind": getattr(d, "device_kind", "?")}
            for d in devs
        ],
    }


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="tpu-deblock",
        description="TPU-native HEVC in-loop deblocking of raw YV12 frames",
    )
    p.add_argument("--input", "-i", help="input YV12 file (single frame or stream)")
    p.add_argument("--output", "-o", help="output YV12 file")
    p.add_argument("--width", "-W", type=int, help="frame width (multiple of 8)")
    p.add_argument("--height", "-H", type=int, help="frame height (multiple of 8)")
    p.add_argument("--qp", type=int, default=20, help="quantization parameter (default 20)")
    p.add_argument("--backend", choices=BACKENDS, default="pallas")
    p.add_argument("--luma-only", action="store_true", help="skip chroma filtering")
    p.add_argument("--frames", type=int, help="max frames to process from a stream")
    p.add_argument("--num-threads", type=int, default=0,
                   help="native backend OpenMP thread count (0 = default)")
    p.add_argument("--depth", type=int, default=2, help="streaming frames in flight")
    p.add_argument("--bench", action="store_true",
                   help="print per-frame timing breakdown instead of writing output")
    p.add_argument("--device-info", action="store_true", help="print device info and exit")
    return p


def run(cfg: DeblockConfig, bench: bool = False) -> dict:
    from .models.pipeline import DeblockPipeline
    from .utils.yuv import read_yv12_stream, write_yv12, yv12_bytes_from_planes

    frames = read_yv12_stream(cfg.input, cfg.width, cfg.height, cfg.frames)
    if not frames:
        raise ValueError(f"no complete {cfg.width}x{cfg.height} frames in {cfg.input}")

    result: dict = {"frames": len(frames), "backend": cfg.backend, "qp": cfg.qp}

    if cfg.backend in ("jnp", "pallas") and len(frames) > 1:
        # stream path with copy overlap
        from .models.streaming import StreamingDeblocker

        s = StreamingDeblocker(cfg.width, cfg.height, cfg.qp, backend=cfg.backend,
                               luma_only=cfg.luma_only, depth=cfg.depth)
        packed = [np.frombuffer(yv12_bytes_from_planes(f), np.uint8) for f in frames]
        t0 = time.perf_counter()
        outs = list(s.run(packed))
        dt = time.perf_counter() - t0
        result["seconds"] = dt
        result["fps"] = len(frames) / dt
        if cfg.output:
            with open(cfg.output, "wb") as f:
                for o in outs:
                    f.write(o.tobytes())
    else:
        pipe = DeblockPipeline(cfg.width, cfg.height, cfg.qp,
                               luma_only=cfg.luma_only, backend=cfg.backend)
        t0 = time.perf_counter()
        outs = [pipe(f) for f in frames]
        dt = time.perf_counter() - t0
        result["seconds"] = dt
        result["fps"] = len(frames) / dt
        if cfg.output:
            with open(cfg.output, "wb") as f:
                for o in outs:
                    f.write(yv12_bytes_from_planes(o))

    if bench and cfg.backend in ("jnp", "pallas"):
        from .models.streaming import StreamingDeblocker

        s = StreamingDeblocker(cfg.width, cfg.height, cfg.qp, backend=cfg.backend,
                               luma_only=cfg.luma_only)
        raw = np.frombuffer(yv12_bytes_from_planes(frames[0]), np.uint8)
        result["timing"] = {k: round(v * 1e6, 1) for k, v in s.time_breakdown(raw).items()}
        result["timing_unit"] = "us/frame"
    return result


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.device_info:
        print(json.dumps(device_info(), indent=2))
        return 0
    if not args.input or args.width is None or args.height is None:
        print("error: --input, --width and --height are required", file=sys.stderr)
        return 2
    try:
        cfg = DeblockConfig(
            input=args.input, width=args.width, height=args.height, qp=args.qp,
            output=args.output, backend=args.backend, luma_only=args.luma_only,
            frames=args.frames, num_threads=args.num_threads, depth=args.depth,
        ).validate()
        result = run(cfg, bench=args.bench)
    except (ValueError, FileNotFoundError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
