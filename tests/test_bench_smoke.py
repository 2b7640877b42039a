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
    sustained rate, link microbench, resident step)."""
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
                        lambda **kw: orig_df(w=64, h=48, k=2, n_steps=4, repeats=1))
    monkeypatch.setattr(bench_lib, "bench_planes",
                        lambda **kw: orig_pl(w=64, h=48, k=2, iters=3))
    out = bench_lib.headline()
    assert set(out) >= {"metric", "value", "unit", "vs_baseline"}
    for key in ("sustained_mpix_s", "link_h2d_gbs", "resident_step_us",
                "pipelined_mpix_s", "device_fed_overlap", "vs_north_star",
                "planes_full_graph", "planes_vs_baseline"):
        assert key in out["details"], key
    # round-3 headline contract: value IS the packed full-graph rate and
    # the metric says so (the resident kernel-only rate stays in details)
    assert out["value"] == round(out["details"]["packed_full_graph"]["kernel_mpix_s"], 1)
    assert "packed full graph" in out["metric"]
    assert out["vs_baseline"] == round(out["value"] / bench_lib.REF_KERNEL_MPIX_S, 2)
    line = json.dumps(out)
    assert line.startswith("{") and "\n" not in line


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
