"""Experiment: can the fused kernel consume the DOT-NATIVE tile layout?

The forward relayout dot produces (rows=8*By, [c, t]) which reshapes FREE
(row-major factorization) to (By, r, c, Bx); the kernel's canonical layout
(8, 8, By, Bx) = (r, c, By, Bx) costs a transpose copy each way
(~9.4 us in + ~5.1 us out per 1080p luma plane, device-trace).  If a
kernel variant indexes the (By, r, c, Bx) layout directly --
planes[r][c] = block[:, r, c, :] -- both transposes disappear from the
graph.  The question is what Mosaic charges for the sublane-fixed slice:
the VMEM block's native (8, 128) tiling covers (c, Bx), so fixing c
addresses one sublane per tile (a strided read the canonical layout gets
for free).

Usage: JAX_PLATFORMS with a TPU; prints device-trace us for the canonical
kernel, the rows-layout kernel, and the bit-exactness check.
"""

from __future__ import annotations

import functools
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpu_video_codec_tpu.ops.deblock import deblock_planes_core
from gpu_video_codec_tpu.ops.pallas_kernel import deblock_tiles_pallas
from gpu_video_codec_tpu.utils.tracing import profiled_device_us


def _rows_kernel(beta_ref, tc_ref, t_ref, v1_ref, v2_ref, h1_ref, h2_ref,
                 out_ref, *, chroma, dtype):
    beta = beta_ref[0]
    tc = tc_ref[0]
    planes = [[t_ref[:, r, c, :].astype(dtype) for c in range(8)] for r in range(8)]
    bs_maps = tuple(ref[...].astype(jnp.int32) for ref in (v1_ref, v2_ref, h1_ref, h2_ref))
    deblock_planes_core(planes, bs_maps, beta, tc, chroma, dtype=dtype)
    for r in range(8):
        for c in range(8):
            out_ref[:, r, c, :] = planes[r][c].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("chroma", "block_by", "block_bx"))
def deblock_rows_layout(tiles_rows, v1, v2, h1, h2, beta, tc, chroma=False,
                        block_by=8, block_bx=256):
    """tiles_rows: (By, 8, 8, Bx) -- the free reshape of the dot output."""
    by, bx = tiles_rows.shape[0], tiles_rows.shape[-1]
    grid = (by // block_by, bx // block_bx)
    tile_spec = pl.BlockSpec((block_by, 8, 8, block_bx), lambda i, j: (i, 0, 0, j),
                             memory_space=pltpu.VMEM)
    map_spec = pl.BlockSpec((block_by, block_bx), lambda i, j: (i, j),
                            memory_space=pltpu.VMEM)
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(_rows_kernel, chroma=chroma, dtype=jnp.int32),
        out_shape=jax.ShapeDtypeStruct(tiles_rows.shape, tiles_rows.dtype),
        grid=grid,
        in_specs=[scalar_spec, scalar_spec, tile_spec] + [map_spec] * 4,
        out_specs=tile_spec,
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(beta, jnp.int32).reshape(1), jnp.asarray(tc, jnp.int32).reshape(1),
      tiles_rows, v1, v2, h1, h2)


def main():
    rng = np.random.default_rng(0)
    by, bx = 136, 256  # 1080p luma grid (lane-aligned)
    tiles = rng.integers(0, 256, (8, 8, by, bx), dtype=np.uint8)
    maps = [rng.integers(0, 3, (by, bx), dtype=np.uint8) for _ in range(4)]
    beta, tc = 54, 8
    td = jnp.asarray(tiles)
    rows_d = jnp.asarray(np.ascontiguousarray(tiles.transpose(2, 0, 1, 3)))
    maps_d = [jnp.asarray(m) for m in maps]

    can = deblock_tiles_pallas(td, *maps_d, beta, tc, chroma=False)
    rows = deblock_rows_layout(rows_d, *maps_d, beta, tc, chroma=False)
    jax.block_until_ready((can, rows))
    exact = bool(np.array_equal(np.asarray(jax.device_get(rows)).transpose(1, 2, 0, 3),
                                np.asarray(jax.device_get(can))))

    def run_can():
        return deblock_tiles_pallas(td, *maps_d, beta, tc, chroma=False)

    def run_rows():
        return deblock_rows_layout(rows_d, *maps_d, beta, tc, chroma=False)

    out = {"bit_exact": exact}
    for name, fn in (("canonical", run_can), ("rows_layout", run_rows)):
        prof = profiled_device_us(fn, iters=20)
        out[name + "_us"] = round(prof[0], 2) if prof else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
