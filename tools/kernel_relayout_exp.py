"""Experiment: the relayout as an IN-KERNEL MXU pass (Pallas).

Instead of XLA-side one-hot dots + residual transpose copies around the
deblock kernel, do the whole plane->tile-planes relayout inside a Pallas
kernel: per 64-row block, one big s8 col-deinterleave dot (K=Wg dense one-hot)
+ 8 tiny row-pick dots, all on the MXU, with only ALIGNED lane slices
(Mosaic-legal).  If fast enough, this fuses straight into the deblock kernel:
raw rows in HBM -> VMEM -> MXU relayout -> filter -> MXU relayout -> rows out,
one HBM round trip for everything.

OUTCOME (round 3, real v5e): bit-exact but 63.6 us fwd / 59.3 us inv at
1080p luma vs the XLA engines' ~41/35 -- Mosaic lowers the in-kernel s8
dots far below native MXU rate and re-fetches the 4 MB one-hot operand per
grid step (index_map-constant blocks are not cached on this toolchain).
Rejected; re-probe on newer Mosaic (docs/PERF.md "rejected").
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

from gpu_video_codec_tpu.utils.tracing import profiled_device_us

B = 8


def _col_perm(wg: int):
    bx = wg // B
    j = np.arange(wg)
    p = np.zeros((wg, wg), np.int8)
    p[j, (j % B) * bx + j // B] = 1
    return p


def _row_picks(rows: int):
    """R (8, 8, rows): R[r] picks rows {8k + r}."""
    nby = rows // B
    r = np.zeros((B, nby, rows), np.int8)
    for i in range(B):
        r[i, np.arange(nby), np.arange(nby) * B + i] = 1
    return r.reshape(B, nby, rows)


def fwd_kernel(x_ref, p_ref, r_ref, o_ref):
    xs = (x_ref[...].astype(jnp.int32) - 128).astype(jnp.int8)
    cols = jax.lax.dot_general(xs, p_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32).astype(jnp.int8)
    wg = cols.shape[1]
    bx = wg // B
    for r in range(B):
        tr = jax.lax.dot_general(r_ref[r], cols, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        for c in range(B):
            o_ref[r, c] = (tr[:, c * bx : (c + 1) * bx] + 128).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("rows_blk",))
def fwd_inkernel(xp, p, rp, rows_blk=64):
    rows, wg = xp.shape
    bx = wg // B
    nblk = rows // rows_blk
    byb = rows_blk // B
    return pl.pallas_call(
        fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((B, B, rows // B, bx), jnp.uint8),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((rows_blk, wg), lambda i: (i, 0)),
            pl.BlockSpec((wg, wg), lambda i: (0, 0)),
            pl.BlockSpec((B, byb, rows_blk), lambda i: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((B, B, byb, bx), lambda i: (0, 0, i, 0)),
    )(xp, p, rp)


def inv_kernel(t_ref, pt_ref, q_ref, o_ref):
    byb = t_ref.shape[2]
    bx = t_ref.shape[3]
    wg = B * bx
    parts = []
    for r in range(B):
        row = [
            (t_ref[r, c].astype(jnp.int32) - 128).astype(jnp.int8)
            for c in range(B)
        ]
        parts.append(jnp.concatenate(row, axis=1))  # (byb, wg), c-major cols
    tall = jnp.concatenate(parts, axis=0)  # (8*byb, wg), r-major rows
    rows = jax.lax.dot_general(q_ref[...], tall, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32).astype(jnp.int8)
    o = jax.lax.dot_general(rows, pt_ref[...], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    o_ref[...] = (o + 128).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("rows_blk",))
def inv_inkernel(tiles, pt, q, rows_blk=64):
    _, _, byg, bx = tiles.shape
    wg = B * bx
    rows = byg * B
    nblk = rows // rows_blk
    byb = rows_blk // B
    return pl.pallas_call(
        inv_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, wg), jnp.uint8),
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((B, B, byb, bx), lambda i: (0, 0, i, 0)),
            pl.BlockSpec((wg, wg), lambda i: (0, 0)),
            pl.BlockSpec((rows_blk, rows_blk), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rows_blk, wg), lambda i: (i, 0)),
    )(tiles, pt, q)


def main():
    rows, wg = 1088, 2048
    byg, bx = rows // B, wg // B
    rng = np.random.default_rng(0)
    xp = jnp.asarray(rng.integers(0, 256, (rows, wg), dtype=np.uint8))
    p = jnp.asarray(_col_perm(wg))
    rp = jnp.asarray(_row_picks(64))

    # reference: pure reshape/transpose
    ref = np.asarray(xp).reshape(byg, B, bx, B).transpose(1, 3, 0, 2)
    out = jax.device_get(fwd_inkernel(xp, p, rp))
    res = {"fwd_exact": bool(np.array_equal(out, ref))}

    # inverse operands
    pt = jnp.asarray(_col_perm(wg).T.copy())
    # q scatters r-major rows (r, byb) back to plane order (byb, r)
    qm = np.zeros((64, 64), np.int8)
    for k in range(8):
        for r in range(8):
            qm[k * 8 + r, r * 8 + k] = 1
    q = jnp.asarray(qm)
    tiles = jnp.asarray(rng.integers(0, 256, (B, B, byg, bx), dtype=np.uint8))
    ref_i = np.asarray(tiles).transpose(2, 0, 3, 1).reshape(rows, wg)
    out_i = jax.device_get(inv_inkernel(tiles, pt, q))
    res["inv_exact"] = bool(np.array_equal(out_i, ref_i))

    for name, fn in [("fwd", lambda: fwd_inkernel(xp, p, rp)),
                     ("inv", lambda: inv_inkernel(tiles, pt, q))]:
        jax.block_until_ready(fn())
        prof = profiled_device_us(fn, iters=30)
        res[name + "_us"] = round(prof[0], 2) if prof else None
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
