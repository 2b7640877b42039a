"""Tile-planes layout: extended plane (Hext, Wext) <-> (8, 8, By, Bx).

This layout is the central TPU-first design decision of the framework.  Every
deblocking edge segment of the reference reads and writes only pixels inside
its own shifted 8x8 tile (cpu.h:146-447), so after regrouping the plane into
per-tile-coordinate "planes" T[r, c] of shape (By, Bx), the *entire* filter
-- decisions, strong/normal luma, chroma, all four segments -- becomes pure
elementwise arithmetic between 64 such planes.  No gathers, no shifts, no
halos; the tile grid maps straight onto the VPU with tiles packed along the
8x128 vector lanes.  (The reference instead enumerates 32 pixel *pointers*
per segment, cpu.h:169-207 -- a CPU/SIMT idiom with no TPU analogue.)

Works on numpy and jax.numpy arrays alike (pure reshape/transpose).
"""

from __future__ import annotations

from ..ops.tables import SAMPLE_BLOCK_SIZE


def covered_extent(h: int, w: int) -> tuple[int, int]:
    """Rows/cols of an extended plane covered by the 8x8 tile grid.

    The reference computes tile counts with truncating integer division
    (num_blocks = new_dim / 8, cpu.h:141-142, 450-451), so when a chroma
    extended dim is not a multiple of 8 (e.g. 1080p: 540+8 = 548) the last
    (dim % 8) rows/cols -- always pure padding, never real pixels -- are
    simply outside the sweep.  Callers process the covered core and pass the
    remainder through untouched.
    """
    b = SAMPLE_BLOCK_SIZE
    return h - h % b, w - w % b


def split_covered(plane):
    """Split (.., H, W) into the tile-covered core and a paste-back closure."""
    h, w = plane.shape[-2], plane.shape[-1]
    ch, cw = covered_extent(h, w)
    core = plane[..., :ch, :cw]

    def paste(out_core, xp):
        if ch == h and cw == w:
            return out_core
        rows = xp.concatenate([out_core, plane[..., ch:, :cw]], axis=-2)
        return xp.concatenate([rows, plane[..., :, cw:]], axis=-1)

    return core, paste


def plane_to_tiles(plane):
    """(.., Hext, Wext) -> (.., 8, 8, By, Bx); T[.., r, c, by, bx] == plane[.., 8by+r, 8bx+c]."""
    b = SAMPLE_BLOCK_SIZE
    *lead, h, w = plane.shape
    if h % b or w % b:
        raise ValueError(f"extended plane dims must be multiples of {b}, got {h}x{w}")
    n = len(lead)
    t = plane.reshape(*lead, h // b, b, w // b, b)
    # (.., By, r, Bx, c) -> (.., r, c, By, Bx)
    return t.transpose(*range(n), n + 1, n + 3, n + 0, n + 2)


def tiles_to_plane(tiles):
    """(.., 8, 8, By, Bx) -> (.., Hext, Wext). Inverse of plane_to_tiles."""
    b = SAMPLE_BLOCK_SIZE
    *lead, r, c, by, bx = tiles.shape
    if r != b or c != b:
        raise ValueError(f"expected leading tile dims ({b},{b}), got ({r},{c})")
    n = len(lead)
    # (.., r, c, By, Bx) -> (.., By, r, Bx, c)
    t = tiles.transpose(*range(n), n + 2, n + 0, n + 3, n + 1)
    return t.reshape(*lead, by * b, bx * b)
