import numpy as np

from gpu_video_codec_tpu.utils.tiles import plane_to_tiles, tiles_to_plane


def test_roundtrip(rng):
    plane = rng.integers(0, 256, (40, 64), dtype=np.uint8)
    t = plane_to_tiles(plane)
    assert t.shape == (8, 8, 5, 8)
    assert np.array_equal(tiles_to_plane(t), plane)


def test_address_mapping(rng):
    """T[r, c, by, bx] must equal plane[8*by + r, 8*bx + c]."""
    plane = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    t = plane_to_tiles(plane)
    for by in range(3):
        for bx in range(4):
            for r in range(8):
                for c in range(8):
                    assert t[r, c, by, bx] == plane[8 * by + r, 8 * bx + c]


def test_leading_batch_dims(rng):
    planes = rng.integers(0, 256, (2, 3, 16, 24), dtype=np.uint8)
    t = plane_to_tiles(planes)
    assert t.shape == (2, 3, 8, 8, 2, 3)
    assert np.array_equal(tiles_to_plane(t), planes)
    assert np.array_equal(t[1, 2], plane_to_tiles(planes[1, 2]))
