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


def split_covered(plane):
    """Split (.., H, W) into the tile-swept region and a paste-back closure.

    Quirk Q9 (discovered by fuzzing the compiled reference, see
    tools/validate_vs_reference.py --fuzz): the reference's chroma pointer
    arithmetic uses `num_chroma_blocks_x * 8` as the row stride
    (cpu.h:469-471 et al.) instead of the plane's actual `_new_chroma_width`.
    When the extended chroma width is not a multiple of 8 (w % 16 == 8,
    e.g. 56x72 frames), the filter therefore operates on a *sheared*
    reinterpretation of the buffer: the first (8*ncby)*(8*ncbx) bytes of the
    flat plane viewed as an (8*ncby, 8*ncbx) row-major image.  That view is
    deterministic and in-bounds, so bit-exactness requires reproducing it.
    When the extended width IS a multiple of 8 the view degenerates to the
    first 8*ncby true rows (possibly truncating bottom padding rows).

    Tile counts come from truncating division (num_blocks = new_dim / 8,
    cpu.h:141-142, 450-451).  Returns (core, paste): `core` is the
    (.., 8*ncby, 8*ncbx) tile-swept view; `paste(filtered_core, xp)` rebuilds
    the full (.., H, W) plane with the untouched flat remainder reattached.
    """
    b = SAMPLE_BLOCK_SIZE
    h, w = plane.shape[-2], plane.shape[-1]
    ncby, ncbx = h // b, w // b
    vh, vw = ncby * b, ncbx * b
    lead = plane.shape[:-2]
    flat = plane.reshape(*lead, h * w)
    core = flat[..., : vh * vw].reshape(*lead, vh, vw)

    def paste(out_core, xp):
        out_flat = out_core.reshape(*lead, vh * vw)
        if vh * vw != h * w:
            out_flat = xp.concatenate([out_flat, flat[..., vh * vw :]], axis=-1)
        return out_flat.reshape(*lead, h, w)

    return core, paste


def split_covered_data(plane):
    """Data-oriented split_covered: returns (core, remainder) as ARRAYS
    instead of (core, paste-closure), so the pieces can live inside jit
    pytrees (the device-resident streaming state).  Same Q9 semantics:
    `core` is the first (8*ncby)*(8*ncbx) bytes of the flat plane viewed as
    an (8*ncby, 8*ncbx) row-major image; `remainder` is the untouched flat
    tail (possibly containing real bottom chroma rows)."""
    core, _ = split_covered(plane)
    lead = plane.shape[:-2]
    h, w = plane.shape[-2], plane.shape[-1]
    vh, vw = core.shape[-2], core.shape[-1]
    rem = plane.reshape(*lead, h * w)[..., vh * vw :]
    return core, rem


def join_covered(core, rem, h, w, xp):
    """Inverse of split_covered_data: rebuild the (.., h, w) plane from the
    filtered core and the untouched flat remainder."""
    lead = core.shape[:-2]
    flat = core.reshape(*lead, core.shape[-2] * core.shape[-1])
    if rem.shape[-1]:
        flat = xp.concatenate([flat, rem], axis=-1)
    return flat.reshape(*lead, h, w)


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
