"""ctypes bindings for the native C++ runtime (libgvct_runtime.so).

Builds the shared library on first use if the source is newer than the
binary (no pybind11 in this environment; plain C ABI + ctypes keeps the
dependency surface at zero).  All entry points raise NativeRuntimeError
with a clear message when the toolchain is unavailable, and the rest of the
framework falls back to the NumPy golden / JAX paths.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ..ops.tables import SAMPLE_BLOCK_SIZE
from ..utils.bs import BoundaryStrength
from ..utils.yuv import FramePlanes

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libgvct_runtime.so")


class NativeRuntimeError(RuntimeError):
    pass


_lib: ctypes.CDLL | None = None


def _build() -> None:
    try:
        subprocess.run(
            ["make", "-C", os.path.join(_DIR, "src"), "-s"],
            check=True, capture_output=True, text=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        raise NativeRuntimeError(f"failed to build native runtime: {detail}") from e


def load() -> ctypes.CDLL:
    """Load (building if needed) the native runtime library."""
    global _lib
    if _lib is not None:
        return _lib
    # stale if older than ANY build input (sources AND the Makefile -- a
    # flags-only change must rebuild too)
    src_dir = os.path.join(_DIR, "src")
    inputs = [os.path.join(src_dir, f) for f in os.listdir(src_dir)
              if f.endswith((".cpp", ".h")) or f == "Makefile"]
    if not os.path.exists(_LIB) or (
        inputs and os.path.getmtime(_LIB) < max(map(os.path.getmtime, inputs))
    ):
        _build()
    lib = ctypes.CDLL(_LIB)
    # plain void* for the pixel/BS buffers: _u8ptr passes raw addresses
    # (cached ints), which is ~10 us/frame cheaper than constructing
    # POINTER(c_uint8) objects per call -- at CIF that was ~10% of the
    # whole filter time (round-5 profile)
    u8p = ctypes.c_void_p
    lib.gvct_version.restype = ctypes.c_int
    lib.gvct_num_threads.restype = ctypes.c_int
    lib.gvct_active_isa.restype = ctypes.c_int
    lib.gvct_avx512_compiled.restype = ctypes.c_int
    lib.gvct_deblock_frame.restype = ctypes.c_int
    lib.gvct_deblock_frame.argtypes = [
        u8p, u8p, u8p, ctypes.c_int, ctypes.c_int,
        u8p, ctypes.c_longlong, u8p, ctypes.c_longlong,
        u8p, ctypes.c_longlong, u8p, ctypes.c_longlong,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.gvct_pack_tiles.restype = None
    lib.gvct_pack_tiles.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p]
    lib.gvct_unpack_tiles.restype = None
    lib.gvct_unpack_tiles.argtypes = [u8p, ctypes.c_int, ctypes.c_int, u8p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        load()
        return True
    except NativeRuntimeError:
        return False


def active_isa() -> str:
    """Active native SIMD tier: 'scalar', 'sse4.1', or 'avx512'.

    'avx512' is the 4-tiles-per-vector batched sweep (runtime cpuid-gated;
    deblock_cpu_avx512.cpp).  Setting GVCT_NATIVE_ISA=sse forces the SSE4.1
    tier; the override is re-read on every filter call, so tests can flip it
    within one process.  All tiers are bit-identical (tests/test_native.py).
    """
    return {0: "scalar", 1: "sse4.1", 2: "avx512"}[load().gvct_active_isa()]


def avx512_compiled() -> bool:
    """Whether the AVX-512 TU compiled the real kernels (vs the stub).
    Dispatch ANDs this into the cpuid check, so active_isa() can never
    report 'avx512' while the stub is linked (a silent no-op otherwise)."""
    return bool(load().gvct_avx512_compiled())


_ptr_cache: dict[int, int] = {}


def _u8ptr(a: np.ndarray) -> int:
    """Raw data address of `a`, cached by object identity.

    numpy's `.ctypes` interface object costs ~1-2 us per access -- 7
    conversions per deblock call made the fixed overhead ~20 us, ~20% of a
    CIF frame (round-5 profile).  The cache entry is evicted by a weakref
    finalizer at the array's deallocation, BEFORE its id can be reused, so
    a stale address can never be served.

    LIFETIME: this returns a bare int -- unlike `data_as(...)`, nothing
    keeps `a` alive through the FFI call.  A caller must hold a strong
    reference to `a` across the native call and must NEVER pass a
    temporary (`_u8ptr(np.ascontiguousarray(x))` is a use-after-free).
    Callers must also not in-place `resize()` cached arrays (nothing in
    this package does); views/copies have their own ids.  For arrays the
    wrapper itself just allocated (can never cache-hit), use _u8ptr_fresh."""
    k = id(a)
    p = _ptr_cache.get(k)
    if p is None:
        import weakref

        _ptr_cache[k] = p = a.ctypes.data
        weakref.finalize(a, _ptr_cache.pop, k, None)
    return p


def _u8ptr_fresh(a: np.ndarray) -> int:
    """Raw address of a freshly-allocated array, uncached (a per-call
    buffer can never hit the identity cache -- caching it would only add
    dict/finalizer churn).  Same lifetime rules as _u8ptr."""
    return a.ctypes.data


def deblock_frame_native(frame: FramePlanes, bs: BoundaryStrength, qp: int,
                         luma_only: bool = False, num_threads: int = 0,
                         inplace: bool = False) -> FramePlanes:
    """Deblock via the C++ OpenMP backend (reference ExecuteCpu parity).

    num_threads = 0 keeps the OpenMP default (the reference sweeps 1/2/4/6/8
    via omp_set_num_threads, cpu.h:135 / main.cu:40-82).

    inplace=True filters the frame's own plane buffers (they must be
    C-contiguous uint8) -- the reference's own in-place semantics
    (cpu.h:134-993) with zero copies; inplace=False (default) returns a new
    FramePlanes and leaves the input untouched."""
    lib = load()
    if inplace:
        y, u, v = frame.y, frame.u, frame.v
        for name, a in (("y", y), ("u", u), ("v", v)):
            if not (isinstance(a, np.ndarray) and a.dtype == np.uint8
                    and a.flags["C_CONTIGUOUS"] and a.flags["WRITEABLE"]):
                raise ValueError(f"inplace deblock needs writable C-contiguous "
                                 f"uint8 planes; plane {name} is not")
    else:
        y = np.ascontiguousarray(frame.y).copy()
        u = np.ascontiguousarray(frame.u).copy()
        v = np.ascontiguousarray(frame.v).copy()
    # planes: cached only when the caller reuses them (inplace steady
    # state); the non-inplace copies are per-call and would just churn the
    # cache.  BS arrays are stable attributes -> always cached.
    plane_ptr = _u8ptr if inplace else _u8ptr_fresh
    rc = lib.gvct_deblock_frame(
        plane_ptr(y), plane_ptr(u), plane_ptr(v), frame.width, frame.height,
        _u8ptr(bs.vert), bs.vert.size, _u8ptr(bs.hor), bs.hor.size,
        _u8ptr(bs.chroma_vert), bs.chroma_vert.size,
        _u8ptr(bs.chroma_hor), bs.chroma_hor.size,
        int(qp), int(luma_only), int(num_threads),
    )
    if rc != 0:
        raise NativeRuntimeError(f"gvct_deblock_frame returned {rc}")
    return FramePlanes(y=y, u=u, v=v, width=frame.width, height=frame.height)


def pack_tiles_native(plane: np.ndarray) -> np.ndarray:
    """(Hext, Wext) uint8 -> (8, 8, By, Bx) via the native packer."""
    lib = load()
    plane = np.ascontiguousarray(plane, dtype=np.uint8)
    h, w = plane.shape
    ny, nx = h // SAMPLE_BLOCK_SIZE, w // SAMPLE_BLOCK_SIZE
    out = np.empty((SAMPLE_BLOCK_SIZE, SAMPLE_BLOCK_SIZE, ny, nx), np.uint8)
    lib.gvct_pack_tiles(_u8ptr_fresh(plane), h, w, _u8ptr_fresh(out))
    return out


def unpack_tiles_native(tiles: np.ndarray, hext: int, wext: int) -> np.ndarray:
    """(8, 8, By, Bx) -> (Hext, Wext); uncovered remainder (if any) is zero."""
    lib = load()
    tiles = np.ascontiguousarray(tiles, dtype=np.uint8)
    out = np.zeros((hext, wext), np.uint8)
    lib.gvct_unpack_tiles(_u8ptr_fresh(tiles), hext, wext, _u8ptr_fresh(out))
    return out
