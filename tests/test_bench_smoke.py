"""Bench harness smoke tests on CPU (tiny geometry): keeps bench.py from
bit-rotting between rounds.  Real numbers come from TPU runs."""

import json

import pytest


def test_bench_stream_smoke():
    from bench.bench_lib import bench_stream

    r = bench_stream(64, 48, backend="jnp", n_frames=4, repeats=1)
    assert r["kernel_us"] > 0 and r["pipelined_mpix_s"] > 0
    json.dumps(r)  # serializable


def test_headline_shape_contract(monkeypatch):
    """bench.py must emit the driver's expected keys (incl. the honesty kit:
    sustained rate, link microbench, resident step, 4K rows)."""
    from bench import bench_lib

    # monkeypatch the geometry down so the contract test runs on CPU
    # (capture the originals first -- the lambdas must not recurse)
    orig_soak, orig_link, orig_res, orig_df, orig_pl = (
        bench_lib.soak, bench_lib.link_h2d_microbench, bench_lib.bench_resident,
        bench_lib.bench_device_fed, bench_lib.bench_planes)
    monkeypatch.setattr(bench_lib, "bench_1080p", lambda **kw: bench_lib.bench_stream(
        64, 48, backend="jnp", n_frames=4, repeats=1))
    monkeypatch.setattr(bench_lib, "soak", lambda **kw: orig_soak(n_frames=8, w=64, h=48))
    monkeypatch.setattr(bench_lib, "link_h2d_microbench",
                        lambda **kw: orig_link(mb=0.01, n=4, repeats=1))
    monkeypatch.setattr(bench_lib, "bench_resident",
                        lambda **kw: orig_res(w=64, h=48, iters=3))
    monkeypatch.setattr(bench_lib, "bench_device_fed",
                        lambda w=64, h=48, **kw: orig_df(w=64, h=48, k=2,
                                                         n_steps=4, repeats=1))
    monkeypatch.setattr(bench_lib, "bench_planes",
                        lambda w=64, h=48, **kw: orig_pl(w=64, h=48, k=2, iters=3))
    out = bench_lib.headline()
    assert set(out) >= {"metric", "value", "unit", "vs_baseline"}
    for key in ("sustained_mpix_s", "link_h2d_gbs", "resident_step_us",
                "pipelined_mpix_s", "device_fed_overlap", "vs_north_star",
                "planes_full_graph", "planes_vs_baseline",
                "device_fed_4k", "planes_4k"):
        assert key in out["details"], key
    # headline contract: value IS the packed full-graph rate and the metric
    # says so (the resident kernel-only rate stays in details)
    assert "packed full graph" in out["metric"]
    assert out["vs_baseline"] == round(out["value"] / bench_lib.REF_KERNEL_MPIX_S, 2)
    line = json.dumps(out)
    assert line.startswith("{") and "\n" not in line


def _representative_headline() -> dict:
    """assemble_headline fed TPU-magnitude inputs (digit counts matter for
    the size bound, values don't)."""
    from bench.bench_lib import assemble_headline

    r = {"kernel_us": 132.84, "h2d_us": 2154.3, "dispatch_us": 3891.2,
         "kernel_mpix_s": 15611.4, "pipelined_mpix_s": 21.34,
         "pipelined_fps": 10.29,
         "device_split_us": {"deblock_kernels": 25.51,
                             "layout_and_copies": 107.33}}
    resident = {"step_us": 26.06, "mpix_s": 79566.0, "dispatch_us": 496.32}
    devfed = {"wall_us_per_frame": 533.21, "wall_mpix_s": 3889.3,
              "device_us_per_frame": 133.55, "device_mpix_s": 15527.4,
              "wire_gbs_to_sustain_device_rate": 23.284}
    devfed4k = {"wall_us_per_frame": 2133.21, "wall_mpix_s": 3889.3,
                "device_us_per_frame": 533.55, "device_mpix_s": 15547.4,
                "wire_gbs_to_sustain_device_rate": 23.314}
    planes = {"device_us_per_frame": 101.91, "device_mpix_s": 20348.1,
              "device_split_us": {"deblock_kernels": 25.51,
                                  "layout_and_copies": 76.4}}
    planes4k = {"device_us_per_frame": 502.44, "device_mpix_s": 16510.9,
                "device_split_us": {"deblock_kernels": 101.2,
                                    "layout_and_copies": 401.2}}
    link = {"gb_s": 1.624}
    sk = {"sustained_mpix_s": 102.3, "frames": 400}
    return assemble_headline(r, resident, devfed, planes, link, sk,
                             devfed4k, planes4k)


def test_headline_fits_driver_capture():
    """Round-3 failure mode, pinned forever: the driver records only the
    last 2000 bytes of bench.py stdout, and the round-3 headline grew past
    that (BENCH_r03.json parsed: null).  The assembled record with
    TPU-magnitude numbers must serialize well under the window."""
    line = json.dumps(_representative_headline())
    assert len(line) < 1900, f"headline JSON {len(line)} bytes >= 1900"


def test_headline_assembly_is_numeric():
    """No multi-sentence prose in the record: every string value is short
    (notes live in docs/PERF.md)."""
    out = _representative_headline()

    def walk(x):
        if isinstance(x, dict):
            for v in x.values():
                walk(v)
        elif isinstance(x, str):
            assert len(x) <= 120, f"prose leaked into headline: {x[:60]}..."

    walk(out)
    assert out["value"] == 15611.4
    assert out["details"]["device_fed_4k"]["device_mpix_s"] == 15547.4


def _load_bench_entry():
    """Load the repo-root bench.py by path (the name `bench` resolves to the
    bench/ package, so the entry script needs an explicit file load)."""
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = importlib.util.spec_from_file_location("bench_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_entry_watchdog(monkeypatch, capsys, tmp_path):
    """bench.py's watchdog must print exactly ONE parseable JSON line on all
    child outcomes (success / bad rc / timeout) -- a wedged device backend at
    round end must still yield a machine-readable record.  A success
    snapshots the headline; later failures re-emit it marked stale."""
    import subprocess

    mod = _load_bench_entry()
    monkeypatch.delenv("GVCT_BENCH_CHILD", raising=False)
    cache = tmp_path / "last_headline.json"
    monkeypatch.setenv("GVCT_BENCH_CACHE", str(cache))
    # isolate from the repo's real PROGRESS.jsonl / capture artifacts so the
    # same-round fallback can't fire here (it gets its own test below)
    monkeypatch.setenv("GVCT_PROGRESS_PATH", str(tmp_path / "progress.jsonl"))
    monkeypatch.setenv("GVCT_CAPTURE_ROOT", str(tmp_path / "capt"))

    class ProbeOk:
        returncode = 0
        stdout = "OK\n"
        stderr = ""

    class Ok:
        returncode = 0
        stdout = 'compile log noise\n{"metric": "m", "value": 1.0}\n'

    def _is_probe(argv):
        return "-c" in argv

    def dispatch(child):
        # the wedge probe runs first (python -c "import jax; ..."); the
        # measurement child is bench.py itself
        return lambda argv, **k: ProbeOk() if _is_probe(argv) else child()

    monkeypatch.setattr(mod.subprocess, "run", dispatch(Ok))
    mod.main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1 and json.loads(out[0])["value"] == 1.0
    assert json.loads(cache.read_text())["measured_at"]  # snapshot written

    class Bad:
        returncode = 3
        stdout = ""

    # with a snapshot present, failure emits a stale record whose top-level
    # value/vs_baseline are NULL (a naive parser can never book old numbers
    # as fresh); the real last measurement lives under last_measured
    monkeypatch.setattr(mod.subprocess, "run", dispatch(Bad))
    mod.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["stale"] is True
    assert rec["value"] is None and rec["vs_baseline"] is None
    assert rec["last_measured"]["value"] == 1.0
    assert "rc=3" in rec["stale_error"] and rec["last_measured"]["measured_at"]
    assert len(json.dumps(rec)) < 1900

    # a HANGING probe (the round-5 wedge mode: jax.devices() blocks while
    # import succeeds) must yield the stale record FAST -- before the child
    # is ever launched or its 2400 s timeout committed to
    def probe_hangs(argv, **k):
        if _is_probe(argv):
            raise subprocess.TimeoutExpired(cmd="probe", timeout=5)
        raise AssertionError("child must not launch when the probe hangs")

    monkeypatch.setattr(mod.subprocess, "run", probe_hangs)
    mod.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["stale"] is True and rec["value"] is None
    assert "wedged before bench" in rec["stale_error"]
    assert rec["last_measured"]["value"] == 1.0
    assert len(json.dumps(rec)) < 1900

    # without a snapshot, failure reports value: null with the error
    cache.unlink()

    def boom(argv, **k):
        if _is_probe(argv):
            return ProbeOk()
        raise subprocess.TimeoutExpired(cmd="bench", timeout=5)

    monkeypatch.setattr(mod.subprocess, "run", boom)
    mod.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] is None and "timed out" in rec["error"]
    assert len(json.dumps(rec)) < 1900


def test_bench_entry_same_round_fallback(monkeypatch, capsys, tmp_path):
    """A wedge at bench time must NOT erase a headline banked by
    tools.tpu_capture earlier in the SAME round: the watchdog re-emits the
    banked numbers with measured_this_round/banked_at (round 5: the backend
    recovered for one mid-round window, then could wedge again before the
    driver's end-of-round bench).  A capture from a DIFFERENT round must
    fall through to the stale-null record."""
    import subprocess

    mod = _load_bench_entry()
    monkeypatch.delenv("GVCT_BENCH_CHILD", raising=False)
    monkeypatch.setenv("GVCT_BENCH_CACHE", str(tmp_path / "last.json"))
    progress = tmp_path / "progress.jsonl"
    monkeypatch.setenv("GVCT_PROGRESS_PATH", str(progress))
    monkeypatch.setenv("GVCT_CAPTURE_ROOT", str(tmp_path))
    progress.write_text('{"round": 7, "commits": 1}\n')
    capdir = tmp_path / "capture_r7"
    capdir.mkdir()
    (capdir / "headline.json").write_text(json.dumps({
        "round": 7, "captured_at": "2026-08-18T12:30:15",
        "result": {"metric": "m", "value": 15571.7, "unit": "Mpix/s",
                   "vs_baseline": 20.93}}))

    def probe_hangs(argv, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=5)

    monkeypatch.setattr(mod.subprocess, "run", probe_hangs)
    mod.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] == 15571.7 and rec["vs_baseline"] == 20.93
    assert rec["measured_this_round"] is True
    assert rec["banked_at"] == "2026-08-18T12:30:15"
    assert "wedged" in rec["wedge_at_bench_time"]
    assert len(json.dumps(rec)) < 1900

    # round mismatch (stale capture from a previous round): no fallback
    progress.write_text('{"round": 8}\n')
    mod.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] is None

    # a capture whose own result is null (banked during a wedge) never
    # becomes a value either
    progress.write_text('{"round": 7}\n')
    (capdir / "headline.json").write_text(json.dumps({
        "round": 7, "result": {"value": None}}))
    mod.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] is None


def test_bench_device_fed_smoke():
    """Device-fed overlap harness: runs the real donated-step machinery on
    pre-staged HBM frames and reports wall + device rates (structure check
    on CPU; the >= 2 Gpix/s claim is a TPU artifact, see BENCH_r03)."""
    from bench.bench_lib import bench_device_fed

    r = bench_device_fed(w=64, h=48, k=2, n_steps=6, repeats=1)
    assert r["wall_mpix_s"] > 0 and r["device_mpix_s"] > 0
    assert r["wire_gbs_to_sustain_device_rate"] >= 0
    json.dumps(r)


def test_synthetic_frame_deterministic():
    from bench.bench_lib import synthetic_frame

    import numpy as np

    a = synthetic_frame(64, 48)
    b = synthetic_frame(64, 48)
    assert np.array_equal(a.y, b.y)


def test_soak_smoke():
    from bench.bench_lib import soak

    r = soak(n_frames=8, w=64, h=48)
    assert r["frames"] == 8 and r["sustained_fps"] > 0
    assert len(r["segment_s"]) == 4


@pytest.mark.slow
def test_autotune_smoke():
    """autotune runs (interpret mode on CPU) on a couple of block shapes."""
    import bench.bench_lib as bl

    r = bl.autotune_blocks(w=64, h=48, shapes=((8, 16), (4, 32)), iters=3)
    assert r["results_us"]


@pytest.mark.slow
def test_reference_cpu_bench_rows():
    """bench_reference_cpu compiles the actual reference and returns timed
    same-host rows (or a graceful error row when the checkout is absent)."""
    from bench.bench_lib import bench_reference_cpu

    rows = bench_reference_cpu(thread_counts=(1,), reps=1,
                               geometries=((64, 48, "tiny"),))
    assert rows
    if "error" not in rows[0]:
        assert rows[0]["filter_s"] > 0 and "compiled reference" in rows[0]["config"]


def test_multistream_bench_mesh_branch():
    """bench_4k_multistream takes the mesh-sharded branch on the 8-device
    virtual CPU mesh (tiny stand-in geometry)."""
    from bench.bench_lib import bench_4k_multistream

    r = bench_4k_multistream(n_streams=2, frames_per_stream=2, w=64, h=48)
    assert "sharded over 8 devices" in r["config"]
    assert r["mpix_s"] > 0


def test_multistream_1chip_bench():
    """bench_multistream_1chip drives MultiStreamDeblocker on a 1x1 mesh
    (round-4 verdict item 5): the staged H2D buffer must be exactly the
    packed bytes (n_streams x 3wh/2 -- nothing extended, nothing host-padded)
    and the overlapped wall loop must produce a rate."""
    from bench.bench_lib import bench_multistream_1chip

    r = bench_multistream_1chip(n_streams=2, w=64, h=48, n_batches=2,
                                backend="jnp", repeats=1)
    assert r["h2d_bytes_per_batch"] == 2 * (3 * 64 * 48 // 2)
    assert r["wall_mpix_s"] > 0
    assert "1x1 mesh" in r["config"]
    json.dumps(r)


@pytest.mark.slow
def test_cpu_interleaved_bench():
    """Interleaved native-vs-compiled-reference rows: structure + the
    1-core caveat annotation (round-2 verdict weak #4).  Tiny geometry,
    1 thread, few reps to keep it bounded."""
    from bench.bench_lib import bench_cpu_interleaved

    r = bench_cpu_interleaved(thread_counts=(1,), reps=2,
                              geometries=((64, 48, "tiny"),))
    if "error" in r:
        pytest.skip(r["error"])
    assert r["host_cpu_cores"] >= 1 and "caveat" in r
    row = r["rows"][0]
    assert row["native_s"] > 0 and row["reference_s"] > 0
    assert row["native_over_reference"] == round(
        row["reference_s"] / row["native_s"], 3)
