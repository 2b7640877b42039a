"""Residual row-block reorder helpers (+ the record of a rejected design).

The MXU relayout engines (utils/tiles.py) leave one residual permutation per
direction: (Byg, 8, 8, Bxg) <-> (8, 8, Byg, Bxg).  After the round-3
convert-placement fix it is a pure uint8 copy XLA runs at ~500 GB/s
(~7 us at 1080p) -- these helpers are that copy, as jnp.transpose.

REJECTED design (round 3, kept as documentation): expressing the reorder as
64 strided HBM->HBM `pltpu.make_async_copy` DMAs.  Mosaic rejects size-1
slices of TILED memref dims -- HBM arrays carry (8,128)-tiling, so slicing
the 8-wide r/c dims (which sit second-minor in every useful view) fails with
`Slice shape along dimension 2 must be aligned to tiling (8)`, and any
reshape that moves them to sliceable positions is itself a retiling copy.
An OOB variant of this kernel also wedged the remote TPU until backend
restart, so no DMA formulation is shipped; see tools/reorder_exp.py and
docs/PERF.md "rejected" for the measurements.
"""

from __future__ import annotations

import jax.numpy as jnp


def rowblocks_to_tiles(x):
    """(.., Byg, 8, 8, Bxg) -> (.., 8, 8, Byg, Bxg): the forward relayout's
    residual reorder."""
    n = x.ndim - 4
    return jnp.transpose(x, (*range(n), n + 1, n + 2, n + 0, n + 3))


def tiles_to_rowblocks(x):
    """(.., 8, 8, Byg, Bxg) -> (.., Byg, 8, 8, Bxg): the inverse relayout's
    residual reorder."""
    n = x.ndim - 4
    return jnp.transpose(x, (*range(n), n + 2, n + 0, n + 1, n + 3))
