"""Fused Pallas kernel vs the XLA tile-plane path and the golden oracle.

On CPU the kernel runs in Pallas interpreter mode (same kernel code, same
core filter functions); the real-TPU compile is exercised by __graft_entry__
and bench.py on hardware.
"""

import numpy as np
import pytest

from gpu_video_codec_tpu.models.golden import deblock_frame_golden
from gpu_video_codec_tpu.models.pipeline import DeblockPipeline
from gpu_video_codec_tpu.utils.bs import BoundaryStrength
from gpu_video_codec_tpu.utils.yuv import FramePlanes, extend_plane


def _random_frame(rng, w, h):
    return FramePlanes(
        extend_plane(rng.integers(0, 256, (h, w), dtype=np.uint8)),
        extend_plane(rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)),
        extend_plane(rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8)),
        w, h,
    )


@pytest.mark.parametrize("qp", [17, 35, 51])
def test_pallas_matches_golden_random(rng, qp):
    w, h = 64, 48
    frame = _random_frame(rng, w, h)
    bs = BoundaryStrength.intra_default(w, h)
    gold = deblock_frame_golden(frame, bs, qp)
    out = DeblockPipeline(w, h, qp, backend="pallas")(frame)
    for name in ("y", "u", "v"):
        assert np.array_equal(getattr(gold, name), getattr(out, name)), name


def test_pallas_matches_jnp_on_cif(testdata_dir):
    import os

    from gpu_video_codec_tpu.utils.yuv import read_yv12

    frame = read_yv12(os.path.join(testdata_dir, "image1_352x288_yv12.yuv"), 352, 288)
    bs = BoundaryStrength.intra_default(352, 288)
    a = DeblockPipeline(352, 288, 35, backend="jnp", bs=bs)(frame)
    b = DeblockPipeline(352, 288, 35, backend="pallas", bs=bs)(frame)
    for name in ("y", "u", "v"):
        assert np.array_equal(getattr(a, name), getattr(b, name)), name


def test_pallas_tail_blocks(rng):
    """Tile grids far from block multiples must round-trip exactly
    (the padded no-op tiles may not leak into real output)."""
    import jax.numpy as jnp

    from gpu_video_codec_tpu.ops.deblock import deblock_tiles
    from gpu_video_codec_tpu.ops.pallas_kernel import deblock_tiles_pallas
    from gpu_video_codec_tpu.utils.bs import BoundaryStrength, luma_segment_maps
    from gpu_video_codec_tpu.utils.tiles import plane_to_tiles

    w, h = 24, 16  # tile grid 3x4 -- tiny vs the 8x128 block
    frame = _random_frame(rng, w, h)
    bs = BoundaryStrength.intra_default(w, h)
    maps = luma_segment_maps(bs)
    tiles = jnp.asarray(plane_to_tiles(frame.y))
    ref = np.asarray(deblock_tiles(tiles, *[jnp.asarray(m) for m in maps], 32, 4))
    out = np.asarray(
        deblock_tiles_pallas(tiles, *[jnp.asarray(m) for m in maps], 32, 4)
    )
    assert np.array_equal(ref, out)


@pytest.mark.parametrize("qp", [18, 35, 51])
def test_int16_compute_bitexact(rng, qp):
    """int16 compute dtype (the kernel fast path) must be bit-identical to
    int32 (the reference's C++ `int` semantics) -- every intermediate fits."""
    import jax.numpy as jnp

    from gpu_video_codec_tpu.ops.deblock import deblock_tiles
    from gpu_video_codec_tpu.ops.tables import get_beta, get_tc
    from gpu_video_codec_tpu.utils.bs import BoundaryStrength, luma_segment_maps, chroma_segment_maps
    from gpu_video_codec_tpu.utils.tiles import plane_to_tiles

    w, h = 64, 48
    frame = _random_frame(rng, w, h)
    bs = BoundaryStrength.intra_default(w, h)
    beta, tc = get_beta(qp), get_tc(qp)
    for plane, maps, chroma in (
        (frame.y, luma_segment_maps(bs), False),
        (frame.u, chroma_segment_maps(bs), True),
    ):
        tiles = jnp.asarray(np.asarray(plane_to_tiles(plane)))
        ms = [jnp.asarray(m) for m in maps]
        a = np.asarray(deblock_tiles(tiles, *ms, beta, tc, chroma=chroma, dtype=jnp.int32))
        b = np.asarray(deblock_tiles(tiles, *ms, beta, tc, chroma=chroma, dtype=jnp.int16))
        assert np.array_equal(a, b), (qp, chroma)
