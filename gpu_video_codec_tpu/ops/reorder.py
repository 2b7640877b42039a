"""Pallas DMA reorder: the residual row-block permutation of the MXU
relayout engine, as 64 strided HBM->HBM async copies.

The one-hot relayout dot (utils/tiles.py) leaves one residual data movement
per direction: (Byg, 8, 8, Bxg) <-> (8, 8, Byg, Bxg) -- a pure permutation
of (Byg, Bxg)-shaped planes past the (r, c) tile-coordinate axes.  XLA
lowers it to a generic transpose-copy (~15-20 us each way at 1080p,
device-trace measured).  Expressed directly as what it is -- 64 independent
strided block copies -- the TPU's DMA engines do it at HBM bandwidth with
no vector-unit involvement at all: each (r, c) plane is one async copy
whose source (or destination) walks Byg rows of Bxg contiguous bytes at a
64*Bxg stride.  No VMEM staging, no vector relayout, no gather.

This is a TPU-native design with no reference analogue (the reference's
layouts never change on device; its only data movement is cudaMemcpy,
gpu.cu:1248-1298).

Bit-exactness: a permutation copy is value-preserving by construction;
tests/test_tiles.py races it against jnp.transpose on every geometry.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reorder_kernel(i_ref, o_ref, sems, *, inverse: bool, lead: int):
    """64 (or 64*n for batched inputs) async HBM->HBM plane copies.

    inverse=False: (.., Byg, 8, 8, Bxg) -> (.., 8, 8, Byg, Bxg)
    inverse=True:  (.., 8, 8, Byg, Bxg) -> (.., Byg, 8, 8, Bxg)
    """
    nb = i_ref.shape[0] if lead else 1
    for b in range(nb):
        copies = []
        for r in range(8):
            for c in range(8):
                src = i_ref.at[b] if lead else i_ref
                dst = o_ref.at[b] if lead else o_ref
                if inverse:
                    cp = pltpu.make_async_copy(
                        src.at[r, c], dst.at[:, r, c], sems.at[r, c])
                else:
                    cp = pltpu.make_async_copy(
                        src.at[:, r, c], dst.at[r, c], sems.at[r, c])
                copies.append(cp)
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()


@functools.partial(jax.jit, static_argnames=("inverse",))
def _reorder_pallas(x, inverse: bool):
    lead = x.ndim - 4
    if lead not in (0, 1):
        raise ValueError(f"reorder expects 4-D or 5-D input, got shape {x.shape}")
    if inverse:
        *b, r, c, by, bx = x.shape
        out_shape = (*b, by, r, c, bx)
    else:
        *b, by, r, c, bx = x.shape
        out_shape = (*b, r, c, by, bx)
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    return pl.pallas_call(
        functools.partial(_reorder_kernel, inverse=inverse, lead=lead),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        in_specs=[any_spec],
        out_specs=any_spec,
        scratch_shapes=[pltpu.SemaphoreType.DMA((8, 8))],
    )(x)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def rowblocks_to_tiles(x):
    """(.., Byg, 8, 8, Bxg) -> (.., 8, 8, Byg, Bxg): the forward relayout's
    residual reorder.  DMA kernel on TPU; jnp.transpose elsewhere."""
    n = x.ndim - 4
    if _on_tpu():
        return _reorder_pallas(x, inverse=False)
    return jnp.transpose(x, (*range(n), n + 1, n + 2, n + 0, n + 3))


def tiles_to_rowblocks(x):
    """(.., 8, 8, Byg, Bxg) -> (.., Byg, 8, 8, Bxg): the inverse relayout's
    residual reorder.  DMA kernel on TPU; jnp.transpose elsewhere."""
    n = x.ndim - 4
    if _on_tpu():
        return _reorder_pallas(x, inverse=True)
    return jnp.transpose(x, (*range(n), n + 2, n + 0, n + 1, n + 3))
