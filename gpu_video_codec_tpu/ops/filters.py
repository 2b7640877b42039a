"""Vectorized, branchless HEVC deblocking edge filters.

This is the spec layer: the per-4-row-segment filter math of the reference
(cpu.h:1074-1488), re-expressed as masked elementwise int32 arithmetic over
arbitrary batches of segments.  The same functions run:

* under `jax.jit` on whole-frame tile-plane batches (ops/deblock.py),
* inside the fused Pallas TPU kernel (ops/pallas_kernel.py) on VMEM blocks,
* and (via jax on CPU) in tests against the scalar golden model.

Conventions
-----------
A luma segment is 4 filter rows x 8 pixels across the edge:
    p[r, j] = j-th pixel on the P side of row r (j = distance from the edge),
    q[r, j] = j-th pixel on the Q side.
Arrays are int32 shaped (4, 4, *B) for luma and (4, 2, *B) for chroma, where
B is any batch shape (e.g. the (By, Bx) tile grid).  All arithmetic is signed
32-bit with arithmetic right shift, matching the reference's `int` math
(cpu.h:1154, 1253 et al.; quirk Q8).

The reference's `if` cascades become masks; outputs equal inputs wherever a
gate is off, which is exactly the reference's in-place no-write behavior.
"""

from __future__ import annotations

import jax.numpy as jnp

from .tables import MAX_PIXEL


def _clip1(delta, c):
    """Clamp to [-c, c] (cpu.h:1117-1120). c >= 0 always holds here."""
    return jnp.clip(delta, -c, c)


def _clip2(value):
    """Clamp to [0, 255] (cpu.h:1123-1126 with max_v = (1<<8)-1, cpu.h:1202)."""
    return jnp.clip(value, 0, MAX_PIXEL)


def _asr(x, n: int):
    """Arithmetic shift right; jnp >> on int32 is arithmetic for signed dtypes."""
    return x >> n


def _iabs(x):
    """|x| as max(x, -x): Mosaic has no absi for int16 vectors, and the
    magnitudes here never approach the dtype minimum."""
    return jnp.maximum(x, -x)


def _thr(value, dtype):
    """Scalar threshold -> (1, 1) `dtype` vector usable in vector compares.

    Threshold derivations (//, *) happen in int32 *before* this call, and the
    int32 scalar is broadcast to a (1, 1) vector *before* the dtype cast:
    Mosaic supports only i1/i32 scalars in kernels, so every int16 value must
    be vectorial.  int16 holds all threshold values (max 10*tc = 200) exactly.
    Batch shapes must therefore have rank >= 2 (the tile grid always does).
    """
    return jnp.broadcast_to(jnp.asarray(value, jnp.int32), (1, 1)).astype(dtype)


def luma_segment_decisions(p, q, beta, tc, dtype=jnp.int32):
    """Per-segment filter decisions from rows 0 and 3 (cpu.h:1074-1114).

    beta/tc: int32 scalars (python ints or traced).  p/q: `dtype` arrays.
    Returns (cond1, strong): cond1 gates any filtering (local adaptivity),
    strong selects the strong filter (conditions 2 AND 3 AND 4).  Shapes *B.
    """
    d_p = _iabs(p[0, 2] - 2 * p[0, 1] + p[0, 0]) + _iabs(p[3, 2] - 2 * p[3, 1] + p[3, 0])
    d_q = _iabs(q[0, 2] - 2 * q[0, 1] + q[0, 0]) + _iabs(q[3, 2] - 2 * q[3, 1] + q[3, 0])
    # condition (1), cpu.h:1086-1088
    cond1 = (d_p + d_q) < _thr(beta, dtype)

    beta8 = _thr(beta // 8, dtype)
    # condition (2), cpu.h:1099-1100
    cond2 = (
        (_iabs(p[0, 2] - 2 * p[0, 1] + p[0, 0]) + _iabs(q[0, 2] - 2 * q[0, 1] + q[0, 0])) < beta8
    ) & (
        (_iabs(p[3, 2] - 2 * p[3, 1] + p[3, 0]) + _iabs(q[3, 2] - 2 * q[3, 1] + q[3, 0])) < beta8
    )
    # condition (3), cpu.h:1104-1105
    cond3 = ((_iabs(p[0, 3] - p[0, 0]) + _iabs(q[0, 0] - q[0, 3])) < beta8) & (
        (_iabs(p[3, 3] - p[3, 0]) + _iabs(q[3, 0] - q[3, 3])) < beta8
    )
    # condition (4), cpu.h:1109-1110; 5*tc/2 in C++ int division
    tc52 = _thr((5 * tc) // 2, dtype)
    cond4 = (_iabs(p[0, 0] - q[0, 0]) < tc52) & (_iabs(p[3, 0] - q[3, 0]) < tc52)

    return cond1, cond2 & cond3 & cond4


def _strong_deltas(x0, x1, x2, x3, y0, y1, c):
    """Strong-filter deltas for one side (cpu.h:1152-1199), vectorized over rows.

    x* = own side pixels at distance 0..3, y0/y1 = opposite side at 0..1.
    Returns clipped (d0, d1, d2) for distances 0..2.
    """
    d0 = _clip1(_asr(x2 + 2 * x1 - 6 * x0 + 2 * y0 + y1 + 4, 3), c)  # cpu.h:1154
    d1 = _clip1(_asr(x2 - 3 * x1 + x0 + y0 + 2, 2), c)               # cpu.h:1160
    d2 = _clip1(_asr(2 * x3 - 5 * x2 + x1 + x0 + y0 + 4, 3), c)      # cpu.h:1166
    return d0, d1, d2


def luma_edge_filter(p, q, bs_mask, beta, tc, dtype=jnp.int32):
    """Full luma edge dispatch for a batch of segments (cpu.h:1359-1429).

    p, q: integer (4 rows, 4 dists, *B).  bs_mask: bool *B (True where the
    segment's BS gate passes -- `BS > 0` for luma, cpu.h:164).
    beta, tc: int scalars (python ints or traced, same dtype as `dtype`).
    dtype: compute dtype.  int32 matches the reference's C++ `int` math; the
    default fast path may use int16, which is bit-identical here because
    every intermediate fits: the largest magnitudes are the strong-filter
    delta numerators (|.| <= 6*255 + 2*255 + 255 + 4 < 2**12) and the normal
    filter's 9*(q0-p0) - 3*(q1-p1) + 8 (|.| <= 12*255 + 8 < 2**12), far
    inside int16 range -- while int16 doubles VPU lane throughput on TPU.
    Returns (new_p, new_q), same shapes; distance-3 pixels never change.
    """
    p = p.astype(dtype)
    q = q.astype(dtype)
    cond1, strong = luma_segment_decisions(p, q, beta, tc, dtype=dtype)
    gate = bs_mask & cond1
    use_strong = gate & strong      # cpu.h:1394
    use_normal = gate & ~strong     # cpu.h:1413

    c = _thr(2 * tc, dtype)  # cpu.h:1191, 1235

    # ---- strong filter (cpu.h:1128-1213): all rows, 3 pixels each side ----
    sp0, sp1, sp2 = _strong_deltas(p[:, 0], p[:, 1], p[:, 2], p[:, 3], q[:, 0], q[:, 1], c)
    sq0, sq1, sq2 = _strong_deltas(q[:, 0], q[:, 1], q[:, 2], q[:, 3], p[:, 0], p[:, 1], c)
    strong_p = jnp.stack([_clip2(p[:, 0] + sp0), _clip2(p[:, 1] + sp1), _clip2(p[:, 2] + sp2)], axis=1)
    strong_q = jnp.stack([_clip2(q[:, 0] + sq0), _clip2(q[:, 1] + sq1), _clip2(q[:, 2] + sq2)], axis=1)

    # ---- normal filter (cpu.h:1215-1357): per-row gate, 2 pixels each side ----
    c2 = _thr(tc // 2, dtype)  # cpu.h:1236
    beta316 = _thr((3 * beta) // 16, dtype)
    # cond5/cond6 per segment from rows 0 and 3 (cpu.h:1243-1249)
    cond5 = (_iabs(p[0, 2] - 2 * p[0, 1] + p[0, 0]) + _iabs(p[3, 2] - 2 * p[3, 1] + p[3, 0])) < beta316
    cond6 = (_iabs(q[0, 2] - 2 * q[0, 1] + q[0, 0]) + _iabs(q[3, 2] - 2 * q[3, 1] + q[3, 0])) < beta316

    # per-row delta0 and gate |delta0| < 10*tc (cpu.h:1253-1254)
    delta0 = _asr(9 * (q[:, 0] - p[:, 0]) - 3 * (q[:, 1] - p[:, 1]) + 8, 4)
    row_gate = _iabs(delta0) < _thr(10 * tc, dtype)
    big_d = _clip1(delta0, c)
    dp1 = _clip1(_asr(_asr(p[:, 2] + p[:, 0] + 1, 1) - p[:, 1] + big_d, 1), c2)  # cpu.h:1259-1260
    dq1 = _clip1(_asr(_asr(q[:, 2] + q[:, 0] + 1, 1) - q[:, 1] - big_d, 1), c2)  # cpu.h:1264-1265
    normal_p0 = _clip2(p[:, 0] + big_d)   # cpu.h:1268
    normal_q0 = _clip2(q[:, 0] - big_d)   # cpu.h:1269
    normal_p1 = _clip2(p[:, 1] + dp1)     # cpu.h:1272 (gated by cond5)
    normal_q1 = _clip2(q[:, 1] + dq1)     # cpu.h:1275 (gated by cond6)

    # ---- masked select; untouched wherever every gate is off ----
    def sel(use_s, strong_v, use_n, normal_v, orig):
        return jnp.where(use_s, strong_v, jnp.where(use_n, normal_v, orig))

    nrow = use_normal & row_gate
    new_p = jnp.stack(
        [
            sel(use_strong, strong_p[:, 0], nrow, normal_p0, p[:, 0]),
            sel(use_strong, strong_p[:, 1], nrow & cond5, normal_p1, p[:, 1]),
            sel(use_strong, strong_p[:, 2], jnp.zeros_like(nrow), p[:, 2], p[:, 2]),
            p[:, 3],
        ],
        axis=1,
    )
    new_q = jnp.stack(
        [
            sel(use_strong, strong_q[:, 0], nrow, normal_q0, q[:, 0]),
            sel(use_strong, strong_q[:, 1], nrow & cond6, normal_q1, q[:, 1]),
            sel(use_strong, strong_q[:, 2], jnp.zeros_like(nrow), q[:, 2], q[:, 2]),
            q[:, 3],
        ],
        axis=1,
    )
    return new_p, new_q


def chroma_edge_filter(p, q, bs_mask, tc, dtype=jnp.int32):
    """Chroma edge filter for a batch of segments (cpu.h:1431-1488).

    p, q: integer (4 rows, 2 dists, *B).  bs_mask: bool *B (True where BS == 2,
    cpu.h:463 -- note chroma gates on equality, unlike luma's `> 0`).
    Only distance-0 pixels change.  The P/Q delta asymmetry of the reference
    (delta_q computed with operands swapped then *subtracted*, cpu.h:1453-1461,
    1475-1476) is replicated exactly.  See luma_edge_filter for the int16
    bit-exactness argument (chroma's largest intermediate is 4*255 + 255 + 4).
    """
    p = p.astype(dtype)
    q = q.astype(dtype)
    tc = _thr(tc, dtype)
    dp = _clip1(_asr(4 * (p[:, 0] - q[:, 0]) + p[:, 1] - q[:, 1] + 4, 3), tc)  # cpu.h:1453, 1464
    dq = _clip1(_asr(4 * (q[:, 0] - p[:, 0]) + q[:, 1] - p[:, 1] + 4, 3), tc)  # cpu.h:1458, 1469
    new_p0 = jnp.where(bs_mask, _clip2(p[:, 0] + dp), p[:, 0])  # cpu.h:1475
    new_q0 = jnp.where(bs_mask, _clip2(q[:, 0] - dq), q[:, 0])  # cpu.h:1476
    new_p = jnp.stack([new_p0, p[:, 1]], axis=1)
    new_q = jnp.stack([new_q0, q[:, 1]], axis=1)
    return new_p, new_q
