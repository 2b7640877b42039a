"""Fused Pallas TPU kernel: the flagship native compute component.

Replaces the reference's CUDA kernels (DeblockingFilterLumaKernel
gpu.cu:535-837, DeblockingFilterChromaKernel gpu.cu:839-1072, one thread per
8x8 tile) with a single fused kernel per plane that performs ALL four edge
phases -- vertical and horizontal, decision and filter, strong and normal --
in one sweep while the tiles stay resident in VMEM.  The reference needed
three kernel launches (luma, U, V) with every tile re-read from DRAM per
launch; here each tile makes exactly one HBM->VMEM->HBM round trip.

TPU mapping: input is the tile-planes tensor (8, 8, By, Bx) (utils/tiles.py).
A grid cell processes a (8, 8, BLOCK_BY, BLOCK_BX) block == BLOCK_BY*BLOCK_BX
tiles; the trailing (BLOCK_BY, BLOCK_BX) axes map straight onto the VPU's
8x128 vector registers (lanes = 128 tiles per VREG, BLOCK_BX a multiple of
128), so every one of the ~400 int32 ops in the filter runs on thousands of
tiles at once.  This sidesteps the "8x8 tile vs 8x128
lane" mismatch called out in SURVEY.md section 7: lanes index *tiles*, not
pixels.

Bit-exactness: the kernel body calls ops.deblock.deblock_planes_core -- the
same code the XLA path runs -- so the two paths are identical by
construction; tests/test_pallas.py asserts it anyway.

Compute dtype: int32 (matches the reference's C++ `int` semantics directly).
An int16 path exists end-to-end (every intermediate provably fits, and
tests/test_pallas.py::test_int16_compute_bitexact proves bit-equality), but
the current Mosaic TPU compiler does not legalize int16 vector ALU ops
(math.absi, arith.maxsi fail), and profiling shows the kernel is bound by
HBM traffic of the layout transposes rather than VPU throughput, so int32
stays the default on TPU.

Tail handling (quirk Q5 done right): the tile grid is zero-padded up to block
multiples with BS = 0, making padding tiles exact no-ops (the CUDA original
instead launched a rounded-up grid with no bounds check and read OOB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .deblock import deblock_planes_core
from ..utils.tiles import plane_to_tiles, split_covered, tiles_to_plane

# (sublane, lane) blocks over the tile grid, clamped per-geometry by
# deblock_tiles_pallas's adaptive tail logic (effective_block_bx).  The
# round-3 device-trace autotune (bench.bench_lib.autotune_all: luma+chroma
# x {1080p, 4K}, grids PRE-padded so the sweep times the kernel the way the
# pipelines launch it) picked:
#   luma (8, 512): clamps to the same 8x256 winner at 1080p (19.3 us) and
#     runs 8x512 at 4K (71.8 vs 74.3 us for 8x256); taller luma blocks lose
#     to VMEM pressure (16x/32x 5-20% worse).
#   chroma (32, 256): the fused U+V grid is short and wide; taller blocks
#     fill the VPU better -- 1080p 6.5 us vs 9.1 for the old (8, 128)
#     effective, 4K 18.7 vs 26.7.
# effective_block_bx also rounds grids up to a 128-lane multiple when the
# padding is cheap: the lane-aligned minor dim keeps the relayout residual
# reorders on the fast copy path.  Small frames clamp to their 8-aligned
# grid size.
BLOCK_BY = 8
BLOCK_BX = 512
CHROMA_BLOCK_BY = 32
CHROMA_BLOCK_BX = 256
CHROMA_BLOCK = (CHROMA_BLOCK_BY, CHROMA_BLOCK_BX)


def _kernel(beta_ref, tc_ref, t_ref, v1_ref, v2_ref, h1_ref, h2_ref, out_ref, *,
            chroma, dtype, batched=False):
    # beta/tc stay int32 scalars: Mosaic supports only i32 scalar arithmetic;
    # filters._thr casts derived thresholds to `dtype` in the vector domain
    beta = beta_ref[0]
    tc = tc_ref[0]
    t_in = t_ref[0] if batched else t_ref
    planes = [[t_in[r, c].astype(dtype) for c in range(8)] for r in range(8)]
    bs = (v1_ref, v2_ref, h1_ref, h2_ref)
    bs_maps = tuple((ref[0] if batched else ref[...]).astype(jnp.int32) for ref in bs)
    deblock_planes_core(planes, bs_maps, beta, tc, chroma, dtype=dtype)
    for r in range(8):
        for c in range(8):
            if batched:
                out_ref[0, r, c] = planes[r][c].astype(out_ref.dtype)
            else:
                out_ref[r, c] = planes[r][c].astype(out_ref.dtype)


def effective_block_bx(requested: int, grid_bx: int) -> int:
    """Lane-dimension block clamp shared by the kernel and every layout that
    pre-pads grids for it (streaming/resident must agree with the kernel
    exactly).

    Baseline: clamp the requested block to the 8-aligned grid size so small
    grids aren't padded all the way up (CIF: Bx=45 -> 48, not 256).  On top
    of that, round up to a 128-lane-aligned width when the extra padding is
    cheap (<= ~10%): the relayout residual reorders around the kernel move
    bxg-contiguous chunks, and a lane-aligned minor dim keeps them on the
    fast copy path (1080p: grid 248 -> 256 costs +3% kernel work but saves
    ~20 us of layout per frame -- device-trace measured)."""
    tight = min(requested, -(-grid_bx // 8) * 8)
    if tight >= 128:
        aligned = -(-grid_bx // 128) * 128
        if aligned <= requested and aligned * 10 <= tight * 11:
            return aligned
    return tight


def _pad_to(x, by, bx):
    """Zero-pad the trailing (By, Bx) axes up to multiples of (by, bx)."""
    pb = (-x.shape[-2]) % by
    px = (-x.shape[-1]) % bx
    if pb == 0 and px == 0:
        return x
    pad = [(0, 0)] * (x.ndim - 2) + [(0, pb), (0, px)]
    return jnp.pad(x, pad)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


@functools.partial(
    jax.jit, static_argnames=("chroma", "block_by", "block_bx", "interpret", "dtype")
)
def deblock_tiles_pallas(
    tiles,
    bs_ver1,
    bs_ver2,
    bs_hor1,
    bs_hor2,
    beta,
    tc,
    chroma: bool = False,
    block_by: int = BLOCK_BY,
    block_bx: int = BLOCK_BX,
    interpret: bool | None = None,
    dtype=jnp.int32,
):
    """Fused deblock of a (8, 8, By, Bx) uint8 tile tensor on TPU.

    A leading batch axis is supported natively: tiles (NB, 8, 8, By, Bx)
    with bs maps (NB, By, Bx) -- or (1, By, Bx) to share one map across the
    batch -- runs the batch as the outermost grid dimension (frames /
    planes per launch with zero data reordering).

    bs_*: (By, Bx) uint8 segment BS maps.  beta/tc: int32 scalars.
    interpret: force Pallas interpreter mode (auto: on when not on a TPU,
    so CPU tests exercise the same kernel code).
    """
    if interpret is None:
        interpret = not _on_tpu()
    batched = tiles.ndim == 5
    if batched:
        nb = tiles.shape[0]
        for name, m in (("bs_ver1", bs_ver1), ("bs_ver2", bs_ver2),
                        ("bs_hor1", bs_hor1), ("bs_hor2", bs_hor2)):
            if m.ndim != 3 or m.shape[0] not in (1, nb):
                raise ValueError(
                    f"batched tiles (leading batch {nb}) need 3-D BS maps with "
                    f"a leading dim of 1 (shared) or {nb} (per-frame); "
                    f"{name} has shape {m.shape}")
    by, bx = tiles.shape[-2], tiles.shape[-1]
    # adaptive tail blocks: a grid narrower than the default block would be
    # zero-padded all the way up (e.g. CIF: Bx=45 -> 128, 2.8x HBM traffic);
    # shrink the block to the 8-aligned grid size instead -- except where
    # lane alignment is cheap (see effective_block_bx).
    block_by = min(block_by, -(-by // 8) * 8)
    block_bx = effective_block_bx(block_bx, bx)
    t = _pad_to(tiles, block_by, block_bx)
    maps = [_pad_to(m, block_by, block_bx) for m in (bs_ver1, bs_ver2, bs_hor1, bs_hor2)]
    pby, pbx = t.shape[-2], t.shape[-1]
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    if batched:
        nb = t.shape[0]
        grid = (nb, pby // block_by, pbx // block_bx)
        tile_spec = pl.BlockSpec((1, 8, 8, block_by, block_bx),
                                 lambda b, i, j: (b, 0, 0, i, j),
                                 memory_space=pltpu.VMEM)
        map_specs = [
            pl.BlockSpec((1, block_by, block_bx),
                         (lambda b, i, j: (b, i, j)) if m.shape[0] != 1
                         else (lambda b, i, j: (0, i, j)),
                         memory_space=pltpu.VMEM)
            for m in maps
        ]
    else:
        grid = (pby // block_by, pbx // block_bx)
        tile_spec = pl.BlockSpec((8, 8, block_by, block_bx),
                                 lambda i, j: (0, 0, i, j),
                                 memory_space=pltpu.VMEM)
        map_specs = [pl.BlockSpec((block_by, block_bx), lambda i, j: (i, j),
                                  memory_space=pltpu.VMEM)] * 4

    out = pl.pallas_call(
        functools.partial(_kernel, chroma=chroma, dtype=dtype, batched=batched),
        out_shape=jax.ShapeDtypeStruct(t.shape, t.dtype),
        grid=grid,
        in_specs=[scalar_spec, scalar_spec, tile_spec] + map_specs,
        out_specs=tile_spec,
        interpret=interpret,
    )(
        jnp.asarray(beta, jnp.int32).reshape(1),
        jnp.asarray(tc, jnp.int32).reshape(1),
        t,
        *maps,
    )
    return out[..., :by, :bx]


def deblock_frame_pallas(y_ext, u_ext, v_ext, luma_maps, chroma_maps, beta, tc,
                         luma_only=False, interpret=None, dtype=jnp.int32,
                         luma_block=(BLOCK_BY, BLOCK_BX),
                         chroma_block=CHROMA_BLOCK):
    """Full-frame deblock via the fused Pallas kernel.

    Luma runs as one kernel call; U and V fold into a single chroma call by
    concatenating their tile grids along the By axis (tiles are independent,
    so any tile-aligned packing is exact) -- 2 launches per frame vs the
    reference's 3 (gpu.cu:1269-1285).

    luma_block/chroma_block: per-plane grid block shapes over the tile grid,
    the TPU analogue of ExecuteGpu's separate luma/chroma CUDA block dims
    (main.cu:87-89, caller-chosen at main.cu:138).  Defaults are within noise
    of the autotuned best (bench.bench_lib.autotune_blocks).
    """
    yt = plane_to_tiles(y_ext)
    y_out = deblock_tiles_pallas(yt, *luma_maps, beta, tc, chroma=False,
                                 interpret=interpret, dtype=dtype,
                                 block_by=luma_block[0], block_bx=luma_block[1])
    y_plane = tiles_to_plane(y_out)
    if luma_only:
        return y_plane, u_ext, v_ext
    u_plane, v_plane = deblock_chroma_ext_pallas(
        u_ext, v_ext, chroma_maps, beta, tc,
        interpret=interpret, dtype=dtype, chroma_block=chroma_block)
    return y_plane, u_plane, v_plane


def deblock_chroma_ext_pallas(u_ext, v_ext, chroma_maps, beta, tc,
                              interpret=None, dtype=jnp.int32,
                              chroma_block=CHROMA_BLOCK):
    """Chroma-only deblock of extended U/V planes (one fused launch).

    Chroma sweeps the reference's flat (8*ncby, 8*ncbx) view (quirk Q9:
    sheared when the extended width isn't 8-aligned; the flat remainder,
    possibly containing real bottom rows, is untouched)."""
    u_core, u_paste = split_covered(u_ext)
    v_core, v_paste = split_covered(v_ext)
    ut = plane_to_tiles(u_core)
    vt = plane_to_tiles(v_core)
    uv = jnp.concatenate([ut, vt], axis=2)  # stack tile grids along By
    cmaps = [jnp.concatenate([m, m], axis=0) for m in chroma_maps]
    uv_out = deblock_tiles_pallas(uv, *cmaps, beta, tc, chroma=True,
                                  interpret=interpret, dtype=dtype,
                                  block_by=chroma_block[0], block_bx=chroma_block[1])
    cby = ut.shape[2]
    u_plane = u_paste(tiles_to_plane(uv_out[:, :, :cby]), jnp)
    v_plane = v_paste(tiles_to_plane(uv_out[:, :, cby:]), jnp)
    return u_plane, v_plane


@functools.partial(jax.jit, static_argnames=("luma_only", "dtype"))
def deblock_frame_pallas_jit(y, u, v, luma_maps, chroma_maps, beta, tc, luma_only=False,
                             dtype=jnp.int32):
    return deblock_frame_pallas(y, u, v, luma_maps, chroma_maps, beta, tc,
                                luma_only=luma_only, dtype=dtype)
