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
tunneled host->TPU link, not the framework.

Watchdog: the measurement runs in a child process under a timeout
(GVCT_BENCH_TIMEOUT, default 2400 s).  The dev tunnel's backend can wedge
for hours (a hung remote AOT compile blocks even `import jax` in axon
registration — docs/PERF.md "int16"); if that happens at round end, the
driver still gets ONE parseable JSON line recording the failure instead
of a truncated or absent record.  Every successful run also snapshots its
headline to bench/LAST_HEADLINE.json.  On a wedge, the fallback ladder is:

1. If tools.tpu_capture banked a full headline EARLIER THIS ROUND
   (bench/capture_r{N}/headline.json, round-matched against the driver's
   PROGRESS.jsonl), that IS the round's measurement — re-emit it with
   `measured_this_round: true` and the banking timestamp.  A healthy
   window earlier in the round must not be erased by a wedge at round end
   (round 5: the backend recovered for one 42-min window mid-round).
2. Otherwise emit `"value": null, "stale": true` whose `last_measured`
   block carries the cross-round snapshot's numbers and measurement
   time -- informative, but impossible for a naive parser to mistake for
   a fresh result.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

METRIC = ("filtered Mpix/s/chip, 1080p YV12 packed full graph "
          "(HBM->HBM device time incl. all layout)")


def cache_path() -> str:
    return os.environ.get("GVCT_BENCH_CACHE",
                          os.path.join(REPO, "bench", "LAST_HEADLINE.json"))


def progress_path() -> str:
    return os.environ.get("GVCT_PROGRESS_PATH",
                          os.path.join(REPO, "PROGRESS.jsonl"))


def capture_root() -> str:
    return os.environ.get("GVCT_CAPTURE_ROOT", os.path.join(REPO, "bench"))


def _same_round_record(error: str):
    """If tools.tpu_capture banked a full headline EARLIER THIS ROUND, a
    wedge at bench time does not erase the round's measurement: re-emit the
    banked numbers as the round's value, labeled with when and how they were
    measured (`measured_this_round` + `banked_at`).  The round match — the
    driver's PROGRESS.jsonl round vs the capture artifact's own `round`
    field — is what makes this honest: a cache from a PREVIOUS round can
    never take this path (it falls through to the stale-null record, which
    a naive parser cannot mistake for a fresh result)."""
    try:
        with open(progress_path()) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        if not lines:
            return None
        rnd = json.loads(lines[-1]).get("round")
        if not isinstance(rnd, int):
            return None
        path = os.path.join(capture_root(), f"capture_r{rnd}", "headline.json")
        with open(path) as f:
            blob = json.load(f)
        if blob.get("round") != rnd:
            return None
        res = blob.get("result") or {}
        if res.get("value") is None:
            return None
        return {
            "metric": res.get("metric", METRIC),
            "value": res["value"],
            "unit": res.get("unit", "Mpix/s"),
            "vs_baseline": res.get("vs_baseline"),
            "measured_this_round": True,
            "banked_at": blob.get("captured_at"),
            "banked_by": "tools.tpu_capture",
            "wedge_at_bench_time": error[:120],
        }
    except (OSError, ValueError, KeyError):
        return None


def _child() -> None:
    from bench.bench_lib import headline

    print(json.dumps(headline()))


def _stale_line(cached: dict, error: str) -> dict:
    """Failure record that CARRIES the last-known-good headline without
    impersonating it: top-level value/vs_baseline are null (a naive parser
    keying off them can never book old numbers as this round's measurement
    -- round-4 advisor finding), and the real numbers from `measured_at`
    live under `last_measured`."""
    return {
        "metric": cached.get("metric", METRIC),
        "value": None,
        "unit": cached.get("unit", "Mpix/s"),
        "vs_baseline": None,
        "stale": True,
        "stale_error": error[:120],
        # numbers only -- the cached details blob could push a stale record
        # past the driver's capture window (full details live in the cache
        # file and docs/PERF.md)
        "last_measured": {
            "value": cached.get("value"),
            "vs_baseline": cached.get("vs_baseline"),
            "measured_at": cached.get("measured_at"),
        },
    }


def main() -> None:
    if os.environ.get("GVCT_BENCH_CHILD"):
        _child()
        return
    timeout = int(os.environ.get("GVCT_BENCH_TIMEOUT", "2400"))
    env = dict(os.environ, GVCT_BENCH_CHILD="1")
    # Fast wedge probe BEFORE committing to the full child timeout: in the
    # hang-mode wedge (jax.devices() blocks; interpreter startup and
    # `import jax` succeed -- round-5 observation) the child would burn the
    # whole 2400 s before the stale record prints, and a driver less patient
    # than that would record NOTHING.  A bounded device probe turns that
    # into a stale record within ~2 min.  Probe timeout is generous vs the
    # healthy case (~5-10 s device init over the tunnel).
    probe_timeout = int(os.environ.get("GVCT_BENCH_PROBE_TIMEOUT", "120"))
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices(); print('OK')"],
            env=dict(os.environ), capture_output=True, text=True,
            timeout=probe_timeout)
        probe_ok = probe.returncode == 0 and "OK" in probe.stdout
        probe_err = "" if probe_ok else (
            (probe.stderr.strip().splitlines() or ["rc=%d" % probe.returncode]
             )[-1][:120])
    except subprocess.TimeoutExpired:
        probe_ok, probe_err = False, f"device probe hang (>{probe_timeout}s)"
    if not probe_ok:
        error = f"backend wedged before bench: {probe_err}"
        banked = _same_round_record(error)
        if banked:
            print(json.dumps(banked))
            return
        if os.path.exists(cache_path()):
            try:
                with open(cache_path()) as f:
                    print(json.dumps(_stale_line(json.load(f), error)))
                return
            except (OSError, ValueError):
                pass
        print(json.dumps({
            "metric": METRIC, "value": None, "unit": "Mpix/s",
            "vs_baseline": None, "error": error,
            "last_documented": {"packed_1080p_device_us": 133.2,
                                "mpix_s_per_chip": 15571.7,
                                "vs_baseline": 20.93,
                                "source": "docs/PERF.md headline record "
                                          "(device traces, round 5)"}}))
        return
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.PIPE, text=True, timeout=timeout)
        line = next((ln for ln in reversed(proc.stdout.splitlines())
                     if ln.startswith("{")), None)
        if proc.returncode == 0 and line:
            print(line)
            try:
                rec = json.loads(line)
                rec["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
                with open(cache_path(), "w") as f:
                    json.dump(rec, f)
            except (OSError, ValueError):
                pass  # snapshot is best-effort; the live line already printed
            return
        error = f"bench child rc={proc.returncode}, no JSON line"
    except subprocess.TimeoutExpired:
        error = (f"bench child timed out after {timeout}s "
                 "(wedged device backend?)")
    banked = _same_round_record(error)
    if banked:
        print(json.dumps(banked))
        return
    if os.path.exists(cache_path()):
        try:
            with open(cache_path()) as f:
                print(json.dumps(_stale_line(json.load(f), error)))
            return
        except (OSError, ValueError):
            pass
    # no snapshot to fall back on: report the failure, plus a pointer to the
    # last numbers recorded by committed device traces (docs/PERF.md) so the
    # record is not empty-handed -- clearly labeled as documentation, not a
    # fresh measurement
    print(json.dumps({
        "metric": METRIC, "value": None, "unit": "Mpix/s",
        "vs_baseline": None, "error": error,
        "last_documented": {"packed_1080p_device_us": 133.2,
                            "mpix_s_per_chip": 15571.7, "vs_baseline": 20.93,
                            "source": "docs/PERF.md headline record "
                                      "(device traces, round 5)"}}))


if __name__ == "__main__":
    main()
