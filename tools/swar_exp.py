"""SWAR lane-doubling experiment for the VPU-bound resident step (round 4).

Motivation: the resident 1080p step (~26 us) is VPU-op-bound at ~4x its HBM
floor (docs/PERF.md "Floors"); int16 would double the vector lanes but
Mosaic does not legalize int16 vector ALU and the AOT compile hangs
(tools/int16_probe.py, re-confirmed every round).  The remaining
lane-doubling candidate is SWAR: pack TWO tiles' pixels into one int32 lane
as two 16-bit fields and run the filter arithmetic on both at once.  Every
filter intermediate provably fits 12 bits + sign (ops/filters.py
luma_edge_filter docstring), so two biased-unsigned 13-bit payloads fit a
32-bit lane with guard headroom.

This module implements the COMPLETE luma + chroma edge filters in SWAR form
(`SwarVal` tracks the bias and value interval of every intermediate at trace
time, inserting renormalizations exactly where the static analysis requires
them -- no runtime overhead beyond the emitted ops), a full 4-phase tile
sweep (`swar_deblock_tiles`), a bit-exactness check against the production
path, and a device-trace race.

Verdict (2026-08, round 4; docs/PERF.md "rejected"): bit-exact (--check:
4/4 luma+chroma cases, QP 0-51) but predicted SLOWER than the int32 path.
Static op counts from this implementation (--ops): the SWAR sweep emits
10,300 ops on half-width vectors vs 2,175 jaxpr eqns full-width native =
2.37x lane-equivalent cost.  The filter is clamp/select-heavy, and a SWAR
clip costs ~5x the native op count (per-field compare masks + xor blends
vs native min/max), which eats the 2x lane win with a large margin.
--race measures the device-trace ratio on hardware.

Usage:
  python -m tools.swar_exp --check          # CPU bit-exactness
  python -m tools.swar_exp --race           # device-trace race (on TPU)
  python -m tools.swar_exp --ops            # static SWAR-vs-native op count
"""

from __future__ import annotations

import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B16 = 1 << 16
HI = 0x80008000  # bit 15 of each field
DEFAULT_BIAS = 8192

# global op counter (static: counts ops EMITTED at trace time)
_OPS = [0]


def _op(x):
    _OPS[0] += 1
    return x


def _c32(pattern: int):
    """int32 constant from a raw 32-bit bit pattern (may have bit 31 set —
    plain jnp.int32(0x80008000) raises OverflowError)."""
    pattern &= 0xFFFFFFFF
    if pattern >= 1 << 31:
        pattern -= 1 << 32
    return jnp.int32(pattern)


def _packc(c: int):
    """Packed per-field constant (c in both halves); c must be a valid
    unsigned field value."""
    assert 0 <= c < B16, c
    return _c32((c << 16) | c)


def _addc(arr, c: int):
    """Per-field add of a (possibly negative) Python int constant.

    Positive adds / negative subtracts are carry-free across the field
    boundary because every STORED field value the trace-time interval
    analysis admits stays in [0, 2^16): lo_new >= 0 means no borrow out of
    the lo field on subtract, lo_new < 2^16 means no carry on add."""
    if c == 0:
        return arr
    if c > 0:
        return _op(arr + _packc(c))
    return _op(arr - _packc(-c))


def _lsr(x, k: int):
    """Logical (zero-fill) >> on int32 — jnp's >> is arithmetic and smears
    the sign bit across the hi field when bit 31 is set."""
    return jax.lax.shift_right_logical(x, jnp.int32(k))


class SwarVal:
    """A packed pair of 16-bit biased-unsigned fields per int32 lane.

    arr holds (value + bias) per field; (vmin, vmax) bound the VALUE domain
    (both fields).  All bookkeeping is Python-side at trace time: the only
    runtime ops are the jnp ops counted by _OPS.
    """

    __slots__ = ("arr", "bias", "vmin", "vmax")

    def __init__(self, arr, bias: int, vmin: int, vmax: int):
        if vmin + bias < 0 or vmax + bias >= B16:
            raise OverflowError(f"field range [{vmin}+{bias}, {vmax}+{bias}] "
                                f"outside [0, 65536)")
        self.arr, self.bias, self.vmin, self.vmax = arr, bias, vmin, vmax

    # -- construction / deconstruction ------------------------------------

    @staticmethod
    def pack(lo, hi, vmin=0, vmax=255, bias=DEFAULT_BIAS) -> "SwarVal":
        """Pack two int32 arrays (values in [vmin, vmax]) into fields."""
        p = _op(_op(_op(hi.astype(jnp.int32) << 16) | lo.astype(jnp.int32))
                + _packc(bias))
        return SwarVal(p, bias, vmin, vmax)

    def unpack(self):
        """-> (lo, hi) int32 value arrays."""
        lo = _op(_op(self.arr & jnp.int32(0xFFFF)) - jnp.int32(self.bias))
        hi = _op(_op(_lsr(self.arr, 16)) - jnp.int32(self.bias))
        return lo, hi

    # -- bias management ---------------------------------------------------

    def renorm(self, bias: int = DEFAULT_BIAS) -> "SwarVal":
        """Shift the stored bias (value unchanged); 1 op, or 0 if already."""
        if bias == self.bias:
            return self
        d = bias - self.bias
        return SwarVal(_addc(self.arr, d), bias, self.vmin, self.vmax)

    def _fit(self, vmin, vmax, pref=DEFAULT_BIAS) -> "SwarVal":
        """Renormalize so that the op producing [vmin, vmax] stays in field
        range at the CURRENT bias; prefers `pref`."""
        b = self.bias
        if vmin + b >= 0 and vmax + b < B16:
            return self
        if vmin + pref >= 0 and vmax + pref < B16:
            return self.renorm(pref)
        b = max(0, -vmin)
        if vmax + b >= B16:
            raise OverflowError(f"value range [{vmin}, {vmax}] cannot fit")
        return self.renorm(b)

    # -- arithmetic --------------------------------------------------------

    def __add__(self, o):
        if isinstance(o, int):
            return SwarVal(_addc(self.arr, o), self.bias,
                           self.vmin + o, self.vmax + o)
        vmin, vmax = self.vmin + o.vmin, self.vmax + o.vmax
        a, b = self, o
        # joint bias = a.bias + b.bias must keep the stored sum in [0, 2^16);
        # fall back to minimal per-operand biases (each stays individually
        # representable since value spans are far below 2^16)
        if not (0 <= vmin + a.bias + b.bias and vmax + a.bias + b.bias < B16):
            a = a.renorm(max(0, -a.vmin))
            b = b.renorm(max(0, -b.vmin))
            if vmax + a.bias + b.bias >= B16:
                raise OverflowError(f"sum range [{vmin}, {vmax}] cannot fit")
        return SwarVal(_op(a.arr + b.arr), a.bias + b.bias, vmin, vmax)

    def __sub__(self, o):
        if isinstance(o, int):
            return self + (-o)
        vmin, vmax = self.vmin - o.vmax, self.vmax - o.vmin
        rb = self.bias - o.bias
        if 0 <= vmin + rb and vmax + rb < B16:
            return SwarVal(_op(self.arr - o.arr), rb, vmin, vmax)
        return self + (-o)  # negate-and-add keeps every stored range valid

    def __neg__(self):
        # 0 - x via a packed constant: per-field reverse subtract is
        # borrow-free because the result's stored fields are >= 0 by the
        # SwarVal range invariant (checked in the ctor below).
        vmin, vmax = -self.vmax, -self.vmin
        b = max(DEFAULT_BIAS, -vmin)
        x = self
        if b + x.bias >= B16:          # reverse-subtract constant must fit
            x = x.renorm(max(0, -x.vmin))
            if b + x.bias >= B16:
                b = max(0, -vmin)
                if b + x.bias >= B16:
                    raise OverflowError(
                        f"negate range [{vmin}, {vmax}] at bias {x.bias}")
        return SwarVal(_op(_packc(b + x.bias) - x.arr), b, vmin, vmax)

    def shl(self, k: int) -> "SwarVal":
        vmin, vmax = self.vmin << k, self.vmax << k
        x = self
        # (value + bias) << k must stay below 2^16
        while (x.vmax + x.bias) << k >= B16:
            nb = x.bias // 2
            if (x.vmin + nb) < 0 or nb == x.bias:
                raise OverflowError(f"shl{k} range [{vmin}, {vmax}] cannot fit")
            x = x.renorm(nb)
        # clear the lo field's leak into the hi field's low k bits
        p = _op(_op(x.arr << k) & _c32(0xFFFFFFFF ^ (((1 << k) - 1) << 16)))
        return SwarVal(p, x.bias << k, vmin, vmax)

    def asr(self, k: int) -> "SwarVal":
        """Per-field arithmetic >> k (exact on the biased representation:
        floor((v + b)/2^k) == (v >> k) + b/2^k when b % 2^k == 0)."""
        x = self
        if x.bias % (1 << k):
            x = x.renorm(-(-x.bias // (1 << k)) * (1 << k))
        # logical shift: stored fields are unsigned; an arithmetic >> would
        # smear bit 31 across the hi field.  Mask clears the hi field's low
        # bits that leaked into the lo field's top k bits.
        p = _op(_op(_lsr(x.arr, k)) & _c32(0xFFFF0000 | (0xFFFF >> k)))
        return SwarVal(p, x.bias >> k, x.vmin >> k, x.vmax >> k)

    # -- compares / selects (masks are 0xFFFF per true field) --------------

    def _ge_bit(self, o) -> jax.Array:
        """bit15-per-field set where self >= o (both fields < 2^15 stored)."""
        a, b = self, o

        def fits(x, bias):
            return x.vmin + bias >= 0 and x.vmax + bias < (1 << 15)

        for cand in (a.bias, b.bias, DEFAULT_BIAS // 2,
                     max(0, -a.vmin, -b.vmin)):
            if fits(a, cand) and fits(b, cand):
                a, b = a.renorm(cand), b.renorm(cand)
                break
        else:
            raise OverflowError(
                f"compare operands [{a.vmin},{a.vmax}] vs [{b.vmin},{b.vmax}] "
                "exceed 15-bit fields at any common bias")
        return _op(_op(_op(a.arr | _c32(HI)) - b.arr) & _c32(HI))

    @staticmethod
    def _expand(bit15) -> jax.Array:
        """bit15 mask -> full 0xFFFF-per-field mask.

        Logical shift + per-field 1-bit mask: an arithmetic >>15 would smear
        the hi field's bit 31 over the whole hi field AND the lo field's
        result bit."""
        ones = _op(_op(_lsr(bit15, 15)) & _c32(0x00010001))
        return _op(bit15 | _op(bit15 - ones))

    def ge_mask(self, o) -> jax.Array:
        return self._expand(self._ge_bit(o))

    def lt_mask(self, o) -> jax.Array:
        return _op(~self.ge_mask(o))

    @staticmethod
    def select(mask, a: "SwarVal", b: "SwarVal") -> "SwarVal":
        """mask ? a : b (mask = 0xFFFF per true field)."""
        if a.bias != b.bias:
            a = a.renorm(b.bias)
        vmin, vmax = min(a.vmin, b.vmin), max(a.vmax, b.vmax)
        p = _op(b.arr ^ _op(_op(a.arr ^ b.arr) & mask))
        return SwarVal(p, b.bias, vmin, vmax)

    def abs(self) -> "SwarVal":
        zero = SwarVal.const_like(self, 0)
        return SwarVal.select(zero.ge_mask(self), -self, self)

    @staticmethod
    def const_like(x: "SwarVal", c: int) -> "SwarVal":
        # packed constants are free at trace time (folded), but broadcasting
        # one into a vector costs ~1 op in practice; count it
        return SwarVal(_op(jnp.broadcast_to(_packc(c + DEFAULT_BIAS),
                                            x.arr.shape).astype(jnp.int32)),
                       DEFAULT_BIAS, c, c)

    def clip1(self, c: int) -> "SwarVal":
        """clamp to [-c, c] (c a python int >= 0; cpu.h:1117-1120)."""
        cc = SwarVal.const_like(self, c)
        nc = SwarVal.const_like(self, -c)
        x = SwarVal.select(self.ge_mask(cc), cc, self)
        x = SwarVal.select(nc.ge_mask(x), nc, x)
        return SwarVal(x.arr, x.bias, max(-c, self.vmin), min(c, self.vmax))

    def clip2(self) -> "SwarVal":
        """clamp to [0, 255] (cpu.h:1123-1126)."""
        lo = SwarVal.const_like(self, 0)
        hi = SwarVal.const_like(self, 255)
        x = SwarVal.select(self.ge_mask(hi), hi, self)
        x = SwarVal.select(lo.ge_mask(x), lo, x)
        return SwarVal(x.arr, x.bias, max(0, self.vmin), min(255, self.vmax))


def _sd(a):
    """second derivative |a2 - 2 a1 + a0| (cpu.h:1086)."""
    return (a[2] - a[1].shl(1) + a[0]).abs()


def swar_luma_filter_planes(p, q, gate_mask, beta: int, tc: int):
    """SWAR twin of ops.filters.luma_edge_filter_planes.

    p, q: 4x4 nested lists of SwarVal (pixel fields, values 0..255).
    gate_mask: packed 0xFFFF-per-field mask (BS > 0).  beta/tc: python ints
    (per-frame scalars, ops/tables.py).  Returns (new_p, new_q).
    """
    dp0, dp3 = _sd(p[0]), _sd(p[3])
    dq0, dq3 = _sd(q[0]), _sd(q[3])
    pq0, pq3 = dp0 + dq0, dp3 + dq3

    def _ltc(x, c):  # x < const
        return x.lt_mask(SwarVal.const_like(x, c))

    cond1 = _ltc(pq0 + pq3, beta)
    beta8 = beta // 8
    cond2 = _op(_ltc(pq0, beta8) & _ltc(pq3, beta8))
    cond3 = _op(_ltc((p[0][3] - p[0][0]).abs() + (q[0][0] - q[0][3]).abs(), beta8)
                & _ltc((p[3][3] - p[3][0]).abs() + (q[3][0] - q[3][3]).abs(), beta8))
    tc52 = (5 * tc) // 2
    cond4 = _op(_ltc((p[0][0] - q[0][0]).abs(), tc52)
                & _ltc((p[3][0] - q[3][0]).abs(), tc52))

    gate = _op(gate_mask & cond1)
    s234 = _op(_op(cond2 & cond3) & cond4)
    use_strong = _op(gate & s234)
    use_normal = _op(gate & _op(~s234))

    c = 2 * tc
    c2 = tc // 2
    beta316 = (3 * beta) // 16
    tc10 = 10 * tc
    cond5 = _ltc(dp0 + dp3, beta316)
    cond6 = _ltc(dq0 + dq3, beta316)

    new_p = [[None] * 4 for _ in range(4)]
    new_q = [[None] * 4 for _ in range(4)]
    for r in range(4):
        p0, p1, p2, p3 = p[r]
        q0, q1, q2, q3 = q[r]
        tpq = p0 + q0
        t = p1 + tpq
        u = q1 + tpq
        s0p = ((t.shl(1) + p2 + q1 + 4).asr(3) - p0).clip1(c)
        s1p = ((t + p2 + 2).asr(2) - p1).clip1(c)
        s2p = (((p3 + p2).shl(1) + p2 + t + 4).asr(3) - p2).clip1(c)
        s0q = ((u.shl(1) + q2 + p1 + 4).asr(3) - q0).clip1(c)
        s1q = ((u + q2 + 2).asr(2) - q1).clip1(c)
        s2q = (((q3 + q2).shl(1) + q2 + u + 4).asr(3) - q2).clip1(c)

        d0 = q0 - p0
        d1 = q1 - p1
        delta0 = (d0.shl(3) + d0 - (d1.shl(1) + d1) + 8).asr(4)
        row_gate = delta0.abs().lt_mask(SwarVal.const_like(delta0, tc10))
        big_d = delta0.clip1(c)
        dp1 = ((p2 + p0 + 1).asr(1) - p1 + big_d).asr(1).clip1(c2)
        dq1 = ((q2 + q0 + 1).asr(1) - q1 - big_d).asr(1).clip1(c2)

        nrow = _op(use_normal & row_gate)
        zero = SwarVal.const_like(p0, 0)
        sel = SwarVal.select
        new_p[r][0] = (p0 + sel(use_strong, s0p, sel(nrow, big_d, zero))).clip2()
        new_p[r][1] = (p1 + sel(use_strong, s1p,
                                sel(_op(nrow & cond5), dp1, zero))).clip2()
        new_p[r][2] = (p2 + sel(use_strong, s2p, zero)).clip2()
        new_p[r][3] = p3
        new_q[r][0] = (q0 + sel(use_strong, s0q, sel(nrow, -big_d, zero))).clip2()
        new_q[r][1] = (q1 + sel(use_strong, s1q,
                                sel(_op(nrow & cond6), dq1, zero))).clip2()
        new_q[r][2] = (q2 + sel(use_strong, s2q, zero)).clip2()
        new_q[r][3] = q3
    return new_p, new_q


def swar_chroma_filter_planes(p, q, gate_mask, tc: int):
    """SWAR twin of ops.filters.chroma_edge_filter_planes (BS == 2 gate)."""
    new_p = [[None, p[r][1]] for r in range(4)]
    new_q = [[None, q[r][1]] for r in range(4)]
    sel = SwarVal.select
    for r in range(4):
        p0, p1 = p[r]
        q0, q1 = q[r]
        dp = ((p0 - q0).shl(2) + p1 - q1 + 4).asr(3).clip1(tc)
        dq = ((q0 - p0).shl(2) + q1 - p1 + 4).asr(3).clip1(tc)
        zero = SwarVal.const_like(p0, 0)
        new_p[r][0] = (p0 + sel(gate_mask, dp, zero)).clip2()
        new_q[r][0] = (q0 - sel(gate_mask, dq, zero)).clip2()
    return new_p, new_q


# -- full 4-phase sweep on packed tile-planes --------------------------------

from gpu_video_codec_tpu.ops.deblock import _PHASE_ORDER, _SEGMENT_GEOMETRY  # noqa: E402


def swar_deblock_planes_core(planes, bs_masks, beta: int, tc: int, chroma=False):
    """4-phase sweep (quirk Q7 order) on an 8x8 list of SwarVal planes.

    bs_masks: 4 packed 0xFFFF-per-true-field gate masks (already reflecting
    `BS > 0` for luma / `BS == 2` for chroma)."""
    nj = 2 if chroma else 4
    for phase, gate in zip(_PHASE_ORDER, bs_masks):
        p_at, q_at = _SEGMENT_GEOMETRY[phase]
        p = [[planes[p_at(r, j)[0]][p_at(r, j)[1]] for j in range(nj)]
             for r in range(4)]
        q = [[planes[q_at(r, j)[0]][q_at(r, j)[1]] for j in range(nj)]
             for r in range(4)]
        if chroma:
            new_p, new_q = swar_chroma_filter_planes(p, q, gate, tc)
            touched = 1
        else:
            new_p, new_q = swar_luma_filter_planes(p, q, gate, beta, tc)
            touched = 3
        for r in range(4):
            for j in range(touched):
                pr, pc = p_at(r, j)
                planes[pr][pc] = new_p[r][j]
                qr, qc = q_at(r, j)
                planes[qr][qc] = new_q[r][j]
    return planes


def _pack_mask(mlo, mhi):
    """Two bool (By, Bx/2) maps -> packed 0xFFFF-per-true-field mask."""
    lo = _op(jnp.where(mlo, jnp.int32(0xFFFF), jnp.int32(0)))
    hi = _op(jnp.where(mhi, jnp.int32(-65536), jnp.int32(0)))  # 0xFFFF0000
    return _op(lo | hi)


def swar_deblock_tiles(tiles, bs_maps, beta: int, tc: int, chroma=False):
    """SWAR twin of ops.deblock.deblock_tiles on an (8, 8, By, Bx) uint8
    tensor with Bx even: fields pack tile columns [0, Bx/2) with
    [Bx/2, Bx)."""
    by, bx = tiles.shape[-2], tiles.shape[-1]
    assert bx % 2 == 0
    half = bx // 2
    t32 = tiles.astype(jnp.int32)
    planes = [[SwarVal.pack(t32[r, c, :, :half], t32[r, c, :, half:])
               for c in range(8)] for r in range(8)]
    gate = (lambda m: m == 2) if chroma else (lambda m: m > 0)
    masks = [_pack_mask(gate(m)[:, :half], gate(m)[:, half:]) for m in bs_maps]
    swar_deblock_planes_core(planes, masks, beta, tc, chroma=chroma)
    out = np.empty((8, 8), object)
    for r in range(8):
        for c in range(8):
            lo, hi = planes[r][c].unpack()
            out[r, c] = jnp.concatenate([lo, hi], axis=-1).astype(tiles.dtype)
    return jnp.stack([jnp.stack(list(row)) for row in out])


def op_report() -> dict:
    """Static op counts: trace both formulations and count emitted jnp ops.

    SWAR ops run on HALF-width vectors, so its lane-equivalent cost is
    swar_ops / 2; the ratio vs the int32 path is the predicted slowdown on a
    purely VPU-bound kernel (ignoring Mosaic scheduling effects)."""
    from gpu_video_codec_tpu.ops.deblock import deblock_tiles

    by, bx = 8, 16
    tiles = jnp.zeros((8, 8, by, bx), jnp.uint8)
    maps = [jnp.full((by, bx), 2, jnp.uint8)] * 4

    _OPS[0] = 0
    jax.make_jaxpr(lambda t, m: swar_deblock_tiles(t, m, 36, 4))(tiles, maps)
    swar_ops = _OPS[0]

    jaxpr = jax.make_jaxpr(
        lambda t, m: deblock_tiles(t, *m, jnp.int32(36), jnp.int32(4)))(tiles, maps)
    native_ops = sum(1 for eqn in jaxpr.jaxpr.eqns)
    return {
        "swar_emitted_ops_half_width": swar_ops,
        "native_jaxpr_eqns_full_width": native_ops,
        "swar_lane_equivalent_ops": swar_ops / 2,
        "predicted_ratio_vs_native": round(swar_ops / 2 / native_ops, 2),
    }


def check(n: int = 64) -> bool:
    """CPU bit-exactness: SWAR 4-phase sweep == production deblock_tiles."""
    from gpu_video_codec_tpu.ops.deblock import deblock_tiles

    rng = np.random.default_rng(0)
    ok = True
    for case in range(4):
        by, bx = int(rng.integers(2, 8)), 2 * int(rng.integers(2, 8))
        chroma = bool(case % 2)
        qp = [0, 20, 37, 51][case]
        from gpu_video_codec_tpu.ops.tables import get_beta, get_tc

        beta, tc = get_beta(qp), get_tc(qp)
        tiles = jnp.asarray(rng.integers(0, 256, (8, 8, by, bx), np.uint8))
        maps = [jnp.asarray(rng.integers(0, 3, (by, bx), np.uint8))
                for _ in range(4)]
        want = jax.device_get(jax.jit(
            lambda t, m: deblock_tiles(t, *m, jnp.int32(beta), jnp.int32(tc),
                                       chroma=chroma))(tiles, maps))
        got = jax.device_get(jax.jit(
            lambda t, m: swar_deblock_tiles(t, m, beta, tc,
                                            chroma=chroma))(tiles, maps))
        same = np.array_equal(want, got)
        print(f"case {case}: {by}x{bx} chroma={chroma} qp={qp}: "
              f"{'bit-exact' if same else 'MISMATCH'}")
        ok &= same
    return ok


def race(by: int = 136, bx: int = 256, iters: int = 30) -> dict:
    """Device-trace race at a 1080p-luma-like grid: the production fused
    Pallas kernel vs a SWAR Pallas kernel doing the identical 4-phase sweep
    on a half-width packed grid."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from gpu_video_codec_tpu.ops.pallas_kernel import deblock_tiles_pallas
    from gpu_video_codec_tpu.utils.tracing import profiled_device_us

    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.integers(0, 256, (8, 8, by, bx), np.uint8))
    maps = [jnp.asarray(rng.integers(0, 3, (by, bx), np.uint8)) for _ in range(4)]
    beta, tc = 36, 4
    interpret = jax.default_backend() != "tpu"

    half = bx // 2

    def _swar_kernel(t_ref, m1, m2, m3, m4, o_ref):
        t32 = t_ref[...].astype(jnp.int32)
        planes = [[SwarVal.pack(t32[r, c, :, :half], t32[r, c, :, half:])
                   for c in range(8)] for r in range(8)]
        # fields pack tile columns [0, half) with [half, bx)
        masks = []
        for m in (m1, m2, m3, m4):
            mm = m[...]
            masks.append(_pack_mask(mm[:, :half] > 0, mm[:, half:] > 0))
        swar_deblock_planes_core(planes, masks, beta, tc)
        for r in range(8):
            for c in range(8):
                lo, hi = planes[r][c].unpack()
                o_ref[r, c, :, :half] = lo.astype(jnp.uint8)
                o_ref[r, c, :, half:] = hi.astype(jnp.uint8)

    spec_t = pl.BlockSpec((8, 8, by, bx), lambda: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((by, bx), lambda: (0, 0), memory_space=pltpu.VMEM)

    @jax.jit
    def swar_call(t, m1, m2, m3, m4):
        return pl.pallas_call(
            _swar_kernel,
            out_shape=jax.ShapeDtypeStruct(t.shape, t.dtype),
            in_specs=[spec_t] + [spec_m] * 4,
            out_specs=spec_t,
            interpret=interpret,
        )(t, m1, m2, m3, m4)

    ref = deblock_tiles_pallas(tiles, *maps, jnp.int32(beta), jnp.int32(tc))
    got = swar_call(tiles, *maps)
    exact = bool(np.array_equal(jax.device_get(ref), jax.device_get(got)))

    out = {"grid": f"{by}x{bx}", "bit_exact": exact}
    prof_ref = profiled_device_us(
        lambda: deblock_tiles_pallas(tiles, *maps, jnp.int32(beta), jnp.int32(tc)),
        iters=iters)
    prof_swar = profiled_device_us(lambda: swar_call(tiles, *maps), iters=iters)
    if prof_ref is not None:
        out["int32_kernel_us"] = round(prof_ref[0], 2)
    if prof_swar is not None:
        out["swar_kernel_us"] = round(prof_swar[0], 2)
    if prof_ref and prof_swar:
        out["swar_over_int32"] = round(prof_swar[0] / prof_ref[0], 2)
    return out


if __name__ == "__main__":
    if "--check" in sys.argv:
        sys.exit(0 if check() else 1)
    elif "--ops" in sys.argv:
        print(json.dumps(op_report(), indent=2))
    elif "--race" in sys.argv:
        print(json.dumps(race(), indent=2))
    else:
        print(__doc__)
