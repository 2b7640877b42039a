"""Multi-stream deblocking over a device mesh (BASELINE config 5).

Wraps parallel/mesh.py's sharded batch step in a streaming interface: N
concurrent YV12 streams (e.g. N cameras or N transcode jobs) are zipped into
per-step frame batches, sharded over the ("data", "spatial") mesh -- frames
across the data axis, tile-row slabs across the spatial axis -- and returned
per stream, with the same copy/compute overlap story as the single-chip
pipeline: run() keeps `depth` batches in flight through JAX's async dispatch
queue, so batch i+1's host prep + H2D proceed under batch i's kernels and
only the oldest batch is drained per step (steady state = max(copy, compute)
per batch, not copy + compute -- the serialized copy->kernel->copy of the
reference's ExecuteGpu, gpu.cu:1248-1298, is the anti-pattern).

The reference has no distributed analogue (single GPU, single stream,
gpu.cu:1230-1306); this is the TPU-native scaling story for its hypothetical
multi-stream usage (SURVEY.md section 2, parallelism checklist).
"""

from __future__ import annotations

from collections import deque
from collections.abc import Iterable, Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import deblock_batch_sharded_jit
from ..ops.tables import HALF_BLOCK, get_beta, get_tc
from ..utils.bs import BoundaryStrength, chroma_segment_maps, luma_segment_maps
from ..utils.yuv import check_dims


class MultiStreamDeblocker:
    """Deblocks N same-geometry YV12 streams across a device mesh.

    mesh: a ("data", "spatial") Mesh (parallel.make_mesh).  The number of
    streams must be a multiple of the data axis.  Frames are raw packed
    YV12 buffers (bytes or uint8 arrays of 3*w*h/2).
    depth: sharded batches in flight during run() (2 = double buffering).
    """

    def __init__(self, mesh, n_streams: int, width: int, height: int, qp: int,
                 *, backend: str = "jnp", luma_only: bool = False,
                 bs: BoundaryStrength | None = None, depth: int = 2):
        check_dims(width, height)
        if n_streams % mesh.shape["data"]:
            raise ValueError(
                f"n_streams {n_streams} must divide by the data axis {mesh.shape['data']}"
            )
        self.mesh = mesh
        self.n = n_streams
        self.width, self.height = width, height
        self.frame_bytes = 3 * width * height // 2
        self.backend = backend
        self.luma_only = luma_only
        self.depth = max(1, depth)
        bs = bs or BoundaryStrength.intra_default(width, height)
        self._lm = luma_segment_maps(bs)
        self._cm = chroma_segment_maps(bs)
        self._beta, self._tc = get_beta(qp), get_tc(qp)

    def _to_planes(self, raws: Sequence) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        w, h = self.width, self.height
        cw, ch = w // 2, h // 2
        p = HALF_BLOCK
        ys, us, vs = [], [], []
        for raw in raws:
            arr = (np.frombuffer(raw, np.uint8) if isinstance(raw, (bytes, bytearray))
                   else np.asarray(raw, np.uint8).ravel())
            if arr.size != self.frame_bytes:
                raise ValueError(f"frame must be {self.frame_bytes} bytes, got {arr.size}")
            ys.append(np.pad(arr[: w * h].reshape(h, w), p))
            us.append(np.pad(arr[w * h : w * h + cw * ch].reshape(ch, cw), p))
            vs.append(np.pad(arr[w * h + cw * ch :].reshape(ch, cw), p))
        return np.stack(ys), np.stack(us), np.stack(vs)

    def _dispatch(self, raws: Sequence):
        """Enqueue one sharded batch (H2D + kernels) WITHOUT draining: returns
        device arrays still in flight behind JAX's async dispatch queue."""
        if len(raws) != self.n:
            raise ValueError(f"expected {self.n} frames (one per stream), got {len(raws)}")
        ys, us, vs = self._to_planes(raws)
        return deblock_batch_sharded_jit(
            self.mesh, jnp.asarray(ys), jnp.asarray(us), jnp.asarray(vs),
            self._lm, self._cm, self._beta, self._tc,
            luma_only=self.luma_only, backend=self.backend,
        )

    def _drain(self, handles) -> list[np.ndarray]:
        """Block on one in-flight batch and repack per stream."""
        yo, uo, vo = handles
        yo = jax.device_get(yo)
        uo = jax.device_get(uo)
        vo = jax.device_get(vo)
        w, h, p = self.width, self.height, HALF_BLOCK
        cw, ch = w // 2, h // 2
        return [
            np.concatenate([
                yo[i, p : p + h, p : p + w].ravel(),
                uo[i, p : p + ch, p : p + cw].ravel(),
                vo[i, p : p + ch, p : p + cw].ravel(),
            ])
            for i in range(self.n)
        ]

    def step(self, raws: Sequence) -> list[np.ndarray]:
        """One synchronous sharded batch step: one frame per stream in,
        filtered packed frames out (in stream order).  For overlapped
        multi-batch throughput use run() -- step() fully drains."""
        return self._drain(self._dispatch(raws))

    def run_batches(self, batches: Iterable[Sequence]) -> Iterator[list[np.ndarray]]:
        """Overlapped core: consume an iterable of n_streams-frame batches,
        keeping `depth` sharded batches in flight -- batch i+1's host prep
        and H2D ride under batch i's kernels, and draining lags dispatch by
        depth-1 batches (real cross-step copy/compute overlap, unlike a
        serial step() loop)."""
        inflight: deque = deque()
        for raws in batches:
            inflight.append(self._dispatch(raws))
            if len(inflight) >= self.depth:
                yield self._drain(inflight.popleft())
        while inflight:
            yield self._drain(inflight.popleft())

    def run(self, streams: Sequence[Iterable]) -> Iterator[list[np.ndarray]]:
        """Zip N frame iterables; yield one list of filtered frames (one per
        stream) per overlapped step until the shortest stream ends."""
        if len(streams) != self.n:
            raise ValueError(f"expected {self.n} streams, got {len(streams)}")
        return self.run_batches(list(raws) for raws in zip(*streams))
