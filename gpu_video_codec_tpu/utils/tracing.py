"""Device-trace timing: measure what the hardware executed, not host wall.

The reference brackets its GPU timing with CUDA events around an explicit
synchronize (gpu.cu:1264-1294) -- device execution time.  The TPU-native
equivalent is the runtime's own profiler trace: per-op device-lane events
recorded by the TPU runtime, immune to host dispatch overhead, async-queue
depth, and (in this dev environment) network-tunnel artifacts where
block_until_ready can return before device work completes (see
docs/PERF.md "Measurement methodology").

API:
  with jax.profiler.trace(d): ...         (stock JAX)
  device_op_totals(d)   -> {op_name: total_us} for device-lane LEAF events
  categorize_ops(totals)-> {deblock_kernels, layout_and_copies, other, total}
  profiled_device_us(thunk, iters) -> (per_iter_us, cats, top_ops) or None
                           if the backend emitted no device lanes (e.g. CPU)
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
from collections import defaultdict

# control/module scopes are not hardware ops; they also live on separate
# trace tracks ("XLA Modules") where per-track nesting can't catch them
_SCOPES = ("jit_", "jit__", "while", "condition", "body", "cond_")


def _load_trace_events(trace_dir: str) -> list[dict]:
    """Read every Chrome-trace event from a jax.profiler trace directory."""
    pats = os.path.join(trace_dir, "**", "*.trace.json.gz")
    events: list[dict] = []
    for path in glob.glob(pats, recursive=True):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        events.extend(data.get("traceEvents", []))
    return events


def device_op_totals(trace_dir: str) -> dict[str, float]:
    """Sum device-lane LEAF complete-event durations (us) by op name.

    Device lanes are identified by process-name metadata (the TPU runtime
    emits tracks like '/device:TPU:0'); host threads are excluded.
    Container events (XLA module/control scopes) enclose their children on
    the same track, so summing every event double-counts; leaf-only =
    events that contain no other event on their track."""
    events = _load_trace_events(trace_dir)
    pid_names: dict[int, str] = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device:" in name.lower() or "GPU" in name
    }
    by_track: dict[tuple, list[dict]] = defaultdict(list)
    for e in events:
        if (e.get("ph") == "X" and e.get("pid") in device_pids
                and not str(e.get("name", "")).startswith(_SCOPES)):
            by_track[(e["pid"], e.get("tid", 0))].append(e)
    totals: dict[str, float] = defaultdict(float)
    for track in by_track.values():
        track.sort(key=lambda e: (float(e["ts"]), -float(e.get("dur", 0.0))))
        stack: list[tuple[float, dict]] = []  # (end_ts, event) of open spans
        has_child: dict[int, bool] = {}

        def _close(parent):
            if not has_child.pop(id(parent), False):
                totals[parent.get("name", "?")] += float(parent.get("dur", 0.0))

        for e in track:
            ts = float(e["ts"])
            while stack and stack[-1][0] <= ts:
                _close(stack.pop()[1])
            if stack:
                has_child[id(stack[-1][1])] = True
            stack.append((ts + float(e.get("dur", 0.0)), e))
            has_child[id(e)] = False
        while stack:
            _close(stack.pop()[1])
    return dict(totals)


def categorize_ops(totals: dict[str, float]) -> dict[str, float]:
    """Bucket op names into deblock-kernel vs layout/copy vs other."""
    cats: dict[str, float] = defaultdict(float)
    for name, us in totals.items():
        n = name.lower()
        if n.startswith(_SCOPES):
            cats["scopes_should_be_empty"] += us
        elif "deblock" in n or "custom-call" in n or "mosaic" in n:
            cats["deblock_kernels"] += us
        elif any(k in n for k in ("copy", "transpose", "bitcast", "reshape",
                                  "concatenate", "pad", "slice", "fusion",
                                  "convert", "convolution", "dot")):
            cats["layout_and_copies"] += us
        else:
            cats["other"] += us
    cats["total"] = sum(v for k, v in cats.items() if k != "total")
    return dict(cats)


def profiled_device_us(thunk, iters: int = 20, trace_dir: str | None = None):
    """Run `thunk()` (returning a jax array or pytree) `iters` times under a
    profiler trace; return (device_us_per_iter, categories, top_ops) from
    device-lane leaf events, or None when the backend emitted no device
    lanes (CPU interpreter -- fall back to wall timing there).

    Completion is forced with a 1-element device_get on the LAST result
    before the trace closes: a real data read cannot return early, and TPU
    program order means the last result ready implies all prior dispatches
    executed inside the trace window."""
    import jax

    d = trace_dir or tempfile.mkdtemp(prefix="gvct_trace_")
    last = None
    with jax.profiler.trace(d):
        for _ in range(iters):
            last = thunk()
        leaf = jax.tree_util.tree_leaves(last)[0]
        jax.device_get(leaf.ravel()[:1])
    totals = device_op_totals(d)
    if not totals:
        return None
    cats = {k: v / iters for k, v in categorize_ops(totals).items()}
    top = {k: round(v / iters, 2)
           for k, v in sorted(totals.items(), key=lambda kv: -kv[1])[:12]}
    return cats["total"], cats, top
