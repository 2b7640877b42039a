#!/usr/bin/env python
"""Queued TPU capture runner: banks the round's full hardware measurement
set the moment the backend is reachable, never wedging the caller.

Why (round-4 verdict item 3): the dev tunnel's remote AOT compiler can wedge
for hours (docs/PERF.md "int16 compute"); rounds 3 and 4 both ended with no
fresh TPU record because the wedge landed before the capture set was banked.
This tool decouples "the backend is healthy" from "somebody was watching":
run it in --watch mode at round start and it polls health with a bounded
subprocess (a wedged backend costs the POLLER 90 s, not the caller anything),
then runs every capture step sequentially with per-step timeouts and writes
one JSON artifact per sub-bench, atomically (tmp + rename), so a mid-capture
wedge still leaves every completed step banked.

Capture set (round-4 verdict item 1):
  headline         python bench.py                   -> the driver metric
  engine_gate      tools.tpu_engine_check            -> bench/TPU_GATE_r{N}.json
                   (first-ever hardware byte-compare of the relayout engines;
                   verdict item 6: persisted so "never ran" != "passed")
  profile_1080p    tools.profile_device              -> packed/planes/resident
  profile_4k       tools.profile_device 3840x2160    -> 4K floor re-race
  multistream_1    bench_lib --ms1                   -> MultiStreamDeblocker on a
                   1-device mesh (verdict item 5: the packed-ingest code path
                   itself gets a hardware number without multi-chip)
  multistream_4k   bench_lib --4k                    -> config-5 projection

Artifacts: bench/capture_r{N}/<step>.json + .log + MANIFEST.json, all atomic.

Usage:
  python -m tools.tpu_capture --watch --round 5     # poll, capture when live
  python -m tools.tpu_capture --once  --round 5     # single health+capture try
  python -m tools.tpu_capture --status --round 5    # what's banked so far

Respects /tmp/suite.lock (one CPU core: never overlap a test suite) and
touches it while capturing so nothing overlaps the measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SUITE_LOCK = "/tmp/suite.lock"
HEALTH_LOG = "/tmp/tpu_health.log"

# (name, timeout_s, argv).  Sequential; one chip, one core.  Ordered by
# driver value: the headline record first, then the never-yet-passed
# hardware gate, then the profiling floor races, then multistream.
STEPS: list[tuple[str, int, list[str]]] = [
    ("headline", 2700, [sys.executable, "bench.py"]),
    ("engine_gate", 3000, [sys.executable, "-m", "tools.tpu_engine_check",
                           "--timeout", "420"]),
    ("profile_1080p", 1500, [sys.executable, "-m", "tools.profile_device"]),
    ("profile_4k", 1800, [sys.executable, "-m", "tools.profile_device",
                          "--geometry", "3840x2160"]),
    ("multistream_1", 1500, [sys.executable, "-m", "bench.bench_lib", "--ms1"]),
    ("multistream_4k", 1800, [sys.executable, "-m", "bench.bench_lib", "--4k"]),
    # verdict item 7: packed-chroma retile fold, measured promote-or-reject.
    # At 4K the retile tax the fold erases is ~4x bigger (~71 us/frame,
    # docs/PERF.md "4K numbers") while the fold's extra MACs scale ~linearly
    # with pixels -- race both geometries before deciding.
    ("chromafold_race", 1500, [sys.executable, "-m", "tools.chromafold_exp",
                               "--race"]),
    ("chromafold_race_4k", 1500, [sys.executable, "-m", "tools.chromafold_exp",
                                  "--race", "--geometry", "3840x2160"]),
]


def _env() -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
    # never inherit a CPU-only override into the capture children
    env.pop("JAX_PLATFORM_NAME", None)
    env["JAX_PLATFORMS"] = "axon"
    # PALLAS_AXON_POOL_IPS must be NON-EMPTY: sitecustomize registers the
    # axon backend only when it is set (empty is the CPU-only escape hatch,
    # CLAUDE.md).  If a CPU override leaked in, restore the image's relay
    # address -- popping the var would make every child see
    # "Backend 'axon' is not in the list of known backends".
    if not env.get("PALLAS_AXON_POOL_IPS"):
        env["PALLAS_AXON_POOL_IPS"] = "127.0.0.1"
    return env


def _log_health(state: str) -> None:
    line = f"{time.strftime('%H:%M:%S')} {state}\n"
    try:
        with open(HEALTH_LOG, "a") as f:
            f.write(line)
    except OSError:
        pass
    print(line, end="", flush=True)


def probe_backend(timeout: int = 90) -> tuple[bool, str]:
    """Bounded subprocess probe; a wedged backend costs `timeout` seconds of
    the poller's time and nothing of the caller's (import jax would block).

    Returns (healthy, mode): mode distinguishes a HANG (the classic wedge:
    the probe eats its whole timeout) from a fast ERROR (the backend answers
    with e.g. UNAVAILABLE -- seen while the server recycles a stuck compile,
    round 5) -- different states, worth telling apart in the health log."""
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax; assert jax.devices(); print('OK')"],
            env=_env(), capture_output=True, text=True,
            timeout=timeout, cwd=REPO)
        if proc.returncode == 0 and "OK" in proc.stdout:
            return True, "ok"
        tail = proc.stderr.strip().splitlines()
        return False, f"error: {tail[-1][:90] if tail else proc.returncode}"
    except subprocess.TimeoutExpired:
        return False, f"hang (>{timeout}s)"


def backend_healthy(timeout: int = 90) -> bool:
    return probe_backend(timeout)[0]


def _atomic_write(path: str, payload) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        if isinstance(payload, str):
            f.write(payload)
        else:
            json.dump(payload, f, indent=2)
            f.write("\n")
    os.replace(tmp, path)


def _parse_json_tail(stdout: str):
    """Last parseable JSON value in stdout (benches print one JSON blob,
    possibly after warnings); multi-line json.dumps(indent=2) blobs are
    found by scanning candidate start lines from the end."""
    lines = stdout.splitlines()
    for i in range(len(lines) - 1, -1, -1):
        if lines[i].lstrip()[:1] in ("{", "["):
            try:
                return json.loads("\n".join(lines[i:]))
            except ValueError:
                continue
    return None


def _fresh(name: str, parsed) -> bool:
    """True iff `parsed` is a FRESH hardware measurement for this step.

    Several capture children exit 0 with a gracefully-degraded record that
    must NOT be banked as 'ok' (banking stops every retry for the round):
    bench.py emits `value: null, stale: true` when its internal watchdog
    fires on a wedged backend; tpu_engine_check exits 0 with `skipped: true`
    when every config skipped; chromafold --race and profile runs report an
    error/no-trace shape off-device."""
    if not isinstance(parsed, dict):
        return False
    if "error" in parsed:
        return False
    if name == "headline":
        return parsed.get("value") is not None and not parsed.get("stale")
    if name == "engine_gate":
        return parsed.get("skipped") is False
    if name.startswith("profile_"):
        return any(isinstance(v, dict)
                   and v.get("device_mpix_s") is not None
                   for v in parsed.values())
    return True


def _claim_suite_lock() -> bool:
    """Atomically create SUITE_LOCK; False if another process holds it.
    Only the claimant may remove it (a capture must never delete a lock a
    concurrently running test suite created — one CPU core)."""
    try:
        fd = os.open(SUITE_LOCK, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.close(fd)
        return True
    except FileExistsError:
        return False


def run_capture(round_no: int, only: list[str] | None = None) -> dict:
    cap_dir = os.path.join(REPO, "bench", f"capture_r{round_no}")
    os.makedirs(cap_dir, exist_ok=True)
    manifest_path = os.path.join(cap_dir, "MANIFEST.json")
    manifest: dict = {"round": round_no, "steps": {}}
    if os.path.exists(manifest_path):
        try:
            with open(manifest_path) as f:
                manifest = json.load(f)
        except ValueError:
            pass
    if not _claim_suite_lock():
        print("[capture] suite.lock held by another process; not capturing "
              "(one CPU core -- rerun when the suite finishes)")
        return manifest
    try:
        for name, step_timeout, argv in STEPS:
            if only and name not in only:
                continue
            prior = manifest["steps"].get(name, {})
            if prior.get("status") == "ok":
                print(f"[capture] {name}: already banked, skipping")
                continue
            print(f"[capture] {name}: running (timeout {step_timeout}s)")
            t0 = time.time()
            row = {"argv": argv, "started": time.strftime("%FT%T")}
            try:
                proc = subprocess.run(argv, env=_env(), cwd=REPO,
                                      capture_output=True, text=True,
                                      timeout=step_timeout)
                row["rc"] = proc.returncode
                _atomic_write(os.path.join(cap_dir, f"{name}.log"),
                              proc.stdout + "\n--- stderr ---\n" + proc.stderr)
                parsed = _parse_json_tail(proc.stdout)
                if (proc.returncode == 0 and parsed is not None
                        and not _fresh(name, parsed)):
                    # exited 0 but the record is a degraded/stale/skip shape
                    # -- leave it un-banked so a later healthy window retries
                    row["status"] = "stale"
                    row["stale_detail"] = json.dumps(parsed)[:300]
                elif proc.returncode == 0 and parsed is not None:
                    row["status"] = "ok"
                    _atomic_write(os.path.join(cap_dir, f"{name}.json"),
                                  {"round": round_no,
                                   "captured_at": time.strftime("%FT%T"),
                                   "result": parsed})
                    if name == "engine_gate":
                        _atomic_write(
                            os.path.join(REPO, "bench",
                                         f"TPU_GATE_r{round_no}.json"),
                            {"round": round_no,
                             "captured_at": time.strftime("%FT%T"),
                             "result": parsed})
                else:
                    row["status"] = "error"
                    row["stderr_tail"] = proc.stderr[-400:]
            except subprocess.TimeoutExpired:
                row["status"] = "timeout"
            row["elapsed_s"] = round(time.time() - t0, 1)
            manifest["steps"][name] = row
            _atomic_write(manifest_path, manifest)
            print(f"[capture] {name}: {row['status']} ({row['elapsed_s']}s)")
            if row["status"] in ("timeout", "stale") and not backend_healthy():
                print("[capture] backend wedged mid-capture; stopping "
                      "(banked steps are kept; re-run resumes)")
                break
    finally:
        try:
            os.remove(SUITE_LOCK)
        except OSError:
            pass
    return manifest


def status(round_no: int) -> dict:
    manifest_path = os.path.join(REPO, "bench", f"capture_r{round_no}",
                                 "MANIFEST.json")
    if not os.path.exists(manifest_path):
        return {"round": round_no, "steps": {}, "banked": 0,
                "total": len(STEPS)}
    with open(manifest_path) as f:
        manifest = json.load(f)
    banked = sum(1 for r in manifest["steps"].values()
                 if r.get("status") == "ok")
    return {"round": round_no,
            "steps": {k: v.get("status") for k, v in manifest["steps"].items()},
            "banked": banked, "total": len(STEPS)}


def watch(round_no: int, interval: int, max_hours: float,
          only: list[str] | None = None) -> int:
    wanted = [n for n, _, _ in STEPS if (not only or n in only)]
    deadline = time.time() + max_hours * 3600
    while time.time() < deadline:
        if os.path.exists(SUITE_LOCK):
            # a SIGKILLed capture/suite can orphan the lock; suites and
            # captures here run well under 2 h -- reap anything older
            try:
                age = time.time() - os.path.getmtime(SUITE_LOCK)
            except OSError:
                age = 0.0
            if age > 7200:
                _log_health(f"reaping stale suite.lock (age {age / 3600:.1f}h)")
                try:
                    os.remove(SUITE_LOCK)
                except OSError:
                    pass
            else:
                _log_health("capture-waiting (suite.lock present)")
        else:
            healthy, mode = probe_backend()
            if healthy:
                _log_health("HEALTHY")
                run_capture(round_no, only)
                st = status(round_no)
                # count banked among the REQUESTED steps only: other rounds'
                # banked rows must not satisfy an --only run
                done = sum(1 for n in wanted
                           if st["steps"].get(n) == "ok")
                if done >= len(wanted):
                    print(json.dumps(st, indent=2))
                    return 0
                # partial (wedged mid-capture): keep polling, resume later
            else:
                _log_health(f"wedged [{mode}]")
        time.sleep(interval)
    print(json.dumps(status(round_no), indent=2))
    return 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, required=True)
    ap.add_argument("--once", action="store_true")
    ap.add_argument("--watch", action="store_true")
    ap.add_argument("--status", action="store_true")
    ap.add_argument("--interval", type=int, default=480)
    ap.add_argument("--max-hours", type=float, default=11.0)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated subset of step names")
    args = ap.parse_args()
    only = args.only.split(",") if args.only else None
    if only:
        known = {n for n, _, _ in STEPS}
        bad = [n for n in only if n not in known]
        if bad:
            ap.error(f"unknown step(s) {bad}; known: {sorted(known)}")
    if args.status:
        print(json.dumps(status(args.round), indent=2))
        return 0
    if args.once:
        if not backend_healthy():
            _log_health("wedged")
            print("backend unreachable; nothing captured")
            return 1
        _log_health("HEALTHY")
        run_capture(args.round, only)
        print(json.dumps(status(args.round), indent=2))
        return 0
    return watch(args.round, args.interval, args.max_hours, only)


if __name__ == "__main__":
    sys.exit(main())
