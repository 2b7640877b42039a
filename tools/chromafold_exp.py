"""Experiment: fold the packed-graph chroma retiles into the relayout dots.

The packed YV12 graph pays two chroma retiling copies the planes contract
doesn't: `buf[h:].reshape(2, ch, cw)` on ingest and `uv_int.reshape(h/2, w)`
on write-back -- a minor-dim width change (w <-> cw) that the TPU's (8,128)
tiled layout realizes as byte-shuffle copies (~17 us/frame at 1080p over a
~5 us pure-HBM floor; docs/PERF.md "4K numbers").  Round-4 verdict item 7:
try folding those retiles into the relayout dot operands, else write a
measured rejection.

Formulation (non-sheared Q9 geometries, the 1080p/4K case):

  The packed chroma region is (h/2, w) rows; packed row r of plane P holds
  plane rows 2r and 2r+1 side by side (w = 2*cw).  A width-contraction dot
  keeps the row dim, so the PARITY (which of the two plane rows a byte
  belongs to) must ride in the OUTPUT COLUMN space: the forward one-hot
  grows to (w, 2*8*cbxg) -- packed col c = q*cw + c_int maps to block q of a
  de-interleaved (c8, t) layout -- and the existing residual-reorder
  transpose absorbs the parity by splitting packed rows (By, rh) and
  merging r8 = 2*rh + q, with the minor dim (Bx) untouched (same cost class
  as the production reorder).  Inverse is symmetric: transpose packs
  (q, c8, Bx) into a 2*8*cbxg minor, one (2*8*cbxg, w) one-hot dot emits
  packed rows directly.  Bit-exact by construction (one-hot selection).

  Cost trade (the reason this needs a RACE, not an argument): both fold
  dots contract over 2x the column space (w vs cw+2p per plane-batch), so
  the chroma relayout MACs double (1080p: ~1.1G -> ~2.1G per direction,
  ~+7 us each at the measured chroma dot rate) to erase ~12 us of retile
  copies -- near-neutral on paper, decided by the measured shape
  efficiency of the bigger dot.

Usage:
  python -m tools.chromafold_exp --check          # CPU bit-exactness
  python -m tools.chromafold_exp --race           # TPU device-trace race
                                                  # (full packed steps)

Verdict: see docs/PERF.md "Optimizations tried and rejected" or the
promotion commit, whichever the race decides.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from gpu_video_codec_tpu.ops.tables import HALF_BLOCK, SAMPLE_BLOCK_SIZE  # noqa: E402


def fold_geometry(w: int, h: int, chroma_block=(32, 256)):
    """Shared geometry: (cw, ch, cby, cbxg, rows_per_plane_packed, pad_rows).

    cby counts Q9 COVERED tile rows ((ch + 2p) // 8, truncating); the packed
    rows per plane that the fold touches are the covered ext rows / 2."""
    from gpu_video_codec_tpu.ops.pallas_kernel import effective_block_bx

    b, p = SAMPLE_BLOCK_SIZE, HALF_BLOCK
    cw, ch = w // 2, h // 2
    if (cw + 2 * p) % b:
        raise ValueError("fold requires a non-sheared Q9 geometry (w % 16 == 0)")
    cbx = (cw + 2 * p) // b
    cbxg = -(-cbx // effective_block_bx(chroma_block[1], cbx)) * \
        effective_block_bx(chroma_block[1], cbx)
    cby = (ch + 2 * p) // b
    cov_rows = cby * b                  # covered ext rows per plane
    packed_rows = cov_rows // 2         # packed rows per plane after pad
    pad_packed = p // 2                 # top zero pad in packed-row units
    return cw, ch, cby, cbxg, packed_rows, pad_packed


@functools.lru_cache(maxsize=None)
def _fold_perm_np(w: int, h: int, cbxg: int, inverse: bool):
    """One-hot for the parity-split de-interleave of the packed chroma rows.

    Forward (w, 2*8*cbxg): packed col c = q*cw + c_int -> output col
    q*(8*cbxg) + (g % 8)*cbxg + g//8 with g = c_int + pad (the interior
    column offset); padding/grid-tail output columns select nothing -> 0
    (Q6 free, same as _perm_np_interior).  Inverse (2*8*cbxg, w): transpose
    of the forward selection restricted to interior columns."""
    b, p = SAMPLE_BLOCK_SIZE, HALF_BLOCK
    cw = w // 2
    cols = 2 * b * cbxg
    c = np.arange(w)
    q, c_int = c // cw, c % cw
    g = c_int + p
    tgt = q * (b * cbxg) + (g % b) * cbxg + g // b
    if inverse:
        m = np.zeros((cols, w), np.float32)
        m[tgt, c] = 1.0
    else:
        m = np.zeros((w, cols), np.float32)
        m[c, tgt] = 1.0
    return m


def fold_perm_device(w: int, h: int, cbxg: int, inverse: bool):
    from gpu_video_codec_tpu.utils.tiles import _perm_device

    return _perm_device(_fold_perm_np(w, h, cbxg, inverse))


def fused_chroma_fwd(region, w: int, h: int, perm, chroma_block=(32, 256)):
    """Packed chroma rows (h/2, w) -> (2, 8, 8, cby, cbxg) tile-planes,
    bit-equal to buf[h:].reshape(2,ch,cw) -> interior_to_tiles(...), with
    the plane-split retile folded into the dot."""
    import jax
    import jax.numpy as jnp

    from gpu_video_codec_tpu.utils.tiles import _onehot_dot

    b = SAMPLE_BLOCK_SIZE
    cw, ch, cby, cbxg, packed_rows, pad_packed = fold_geometry(w, h, chroma_block)
    reg3 = region.reshape(2, ch // 2, w)           # leading split: free
    bot = packed_rows - pad_packed - ch // 2       # covered bottom pad rows
    reg3 = jnp.pad(reg3, ((0, 0), (pad_packed, bot), (0, 0)))
    o = _onehot_dot(reg3, perm, 1)                 # (2, rows, 2*8*cbxg) i32
    o = jax.lax.optimization_barrier(o.astype(jnp.uint8))
    # rows = (By, rh); minor flat = (q, c8, t).  r8 = 2*rh + q.
    o = o.reshape(2, cby, 4, 2, b, cbxg)
    o = o.transpose(0, 2, 3, 4, 1, 5)              # (pl, rh, q, c8, By, Bx)
    return o.reshape(2, b, b, cby, cbxg)           # merge (rh, q) -> r8


def fused_chroma_inv(tiles, w: int, h: int, perm, chroma_block=(32, 256)):
    """(2, 8, 8, cby, cbxg) filtered tile-planes -> packed chroma rows
    (h/2, w), bit-equal to tiles_to_interior(...) -> reshape(h/2, w), with
    the write-back retile folded into the dot."""
    import jax.numpy as jnp

    from gpu_video_codec_tpu.utils.tiles import _onehot_dot

    b = SAMPLE_BLOCK_SIZE
    cw, ch, cby, cbxg, packed_rows, pad_packed = fold_geometry(w, h, chroma_block)
    o = tiles.reshape(2, 4, 2, b, cby, cbxg)       # r8 -> (rh, q)
    o = o.transpose(0, 4, 1, 2, 3, 5)              # (pl, By, rh, q, c8, Bx)
    o = o.reshape(2, packed_rows, 2 * b * cbxg)    # rows=(By,rh); minor=(q,c8,t)
    o = o[:, pad_packed : pad_packed + ch // 2, :]  # interior rows BEFORE dot
    o = _onehot_dot(o, perm, 1)                    # (2, ch/2, w)
    return o.astype(jnp.uint8).reshape(h // 2, w)  # leading merge: free


def reference_chroma_path(region, w: int, h: int, chroma_block=(32, 256)):
    """The production packed-graph chroma boundary (retile -> relayout ->
    inverse -> retile), with NO filtering in between -- the layout round-trip
    both formulations must reproduce byte-for-byte."""
    from gpu_video_codec_tpu.utils.tiles import interior_to_tiles, tiles_to_interior

    cw, ch, cby, cbxg, _, _ = fold_geometry(w, h, chroma_block)
    uv = region.reshape(2, ch, cw)
    t = interior_to_tiles(uv, HALF_BLOCK, bx_grid=cbxg)
    uv2 = tiles_to_interior(t, HALF_BLOCK, ch, cw)
    return t, uv2.reshape(h // 2, w)


def check(geometries=((64, 48), (1920, 1080), (352, 288))) -> dict:
    """CPU bit-exactness: fused fwd/inv must equal the production retile
    path on the layout round-trip AND through the actual chroma kernel."""
    os.environ.setdefault("GVCT_RELAYOUT", "mxu")  # engines on, off-TPU
    import jax.numpy as jnp

    out = {}
    rng = np.random.default_rng(3)
    for w, h in geometries:
        region = rng.integers(0, 256, (h // 2, w), dtype=np.uint8)
        dreg = jnp.asarray(region)
        fwd = fold_perm_device(w, h, fold_geometry(w, h)[3], False)
        inv = fold_perm_device(w, h, fold_geometry(w, h)[3], True)
        t_ref, reg_ref = reference_chroma_path(dreg, w, h)
        t_fold = fused_chroma_fwd(dreg, w, h, fwd)
        reg_fold = fused_chroma_inv(t_fold, w, h, inv)
        out[f"{w}x{h}"] = {
            "fwd_tiles_equal": bool(np.array_equal(np.asarray(t_ref),
                                                   np.asarray(t_fold))),
            "roundtrip_equal": bool(np.array_equal(np.asarray(reg_ref),
                                                   np.asarray(reg_fold))),
            "roundtrip_is_identity": bool(np.array_equal(
                np.asarray(reg_fold), region)),
        }
    out["ok"] = all(all(v.values()) for k, v in out.items() if k != "ok")
    return out


def _packed_step_fold(sd, w, h):
    """A packed step twin of StreamingDeblocker._step with the folded chroma
    boundary (luma via the production planes path, chroma via the fold)."""
    import jax
    import jax.numpy as jnp

    from gpu_video_codec_tpu.models.streaming import _deblock_planes_impl
    from gpu_video_codec_tpu.ops.pallas_kernel import deblock_tiles_pallas

    cbxg = fold_geometry(w, h, sd._chroma_block)[3]
    fwd = fold_perm_device(w, h, cbxg, False)
    inv = fold_perm_device(w, h, cbxg, True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step(buf, lm, cm, beta, tc):
        # dummy uv: _deblock_planes_impl unpacks it unconditionally, but the
        # luma_only=True path never reads the values
        dummy_uv = jnp.zeros((2, 8, 8), jnp.uint8)
        y_int, _ = _deblock_planes_impl(
            buf[:h], dummy_uv, lm, cm, beta, tc, w, h, True, "pallas",
            sd._luma_block, sd._chroma_block, sd._yperms, sd._luma_grid)
        t = fused_chroma_fwd(buf[h:], w, h, fwd, sd._chroma_block)
        cmaps = [m[None] for m in cm]
        t_out = deblock_tiles_pallas(t, *cmaps, beta, tc, chroma=True,
                                     block_by=sd._chroma_block[0],
                                     block_bx=sd._chroma_block[1])
        reg = fused_chroma_inv(t_out, w, h, inv, sd._chroma_block)
        out = jax.lax.dynamic_update_slice(buf, y_int, (0, 0))
        return jax.lax.dynamic_update_slice(out, reg, (h, 0))

    return step


def race(w: int = 1920, h: int = 1080, qp: int = 35, iters: int = 30) -> dict:
    """Device-trace race: production packed step vs the folded-chroma twin,
    both chained on rotating donated buffers.  Also byte-compares one step's
    output so the race can't quietly time a wrong graph."""
    import jax

    from bench.bench_lib import packed_yv12, synthetic_frame
    from gpu_video_codec_tpu.models.streaming import StreamingDeblocker
    from gpu_video_codec_tpu.utils.tracing import profiled_device_us

    sd = StreamingDeblocker(w, h, qp)
    fold_step = _packed_step_fold(sd, w, h)
    raw = packed_yv12(synthetic_frame(w, h))
    rows = raw.reshape(3 * h // 2, w)

    base = np.asarray(jax.device_get(sd._step_borrow(jax.device_put(rows))))
    folded = np.asarray(jax.device_get(fold_step(
        jax.device_put(rows), sd._lm, sd._cm, sd._beta, sd._tc)))
    equal = bool(np.array_equal(base, folded))

    k = 4
    cells = [sd._step(sd._put(raw)) for _ in range(k)]
    jax.block_until_ready(cells)
    i = [0]

    def prod():
        cells[i[0] % k] = sd._step(cells[i[0] % k])
        i[0] += 1
        return cells[i[0] % k]

    fcells = [fold_step(sd._put(raw), sd._lm, sd._cm, sd._beta, sd._tc)
              for _ in range(k)]
    jax.block_until_ready(fcells)
    j = [0]

    def fold():
        fcells[j[0] % k] = fold_step(fcells[j[0] % k], sd._lm, sd._cm,
                                     sd._beta, sd._tc)
        j[0] += 1
        return fcells[j[0] % k]

    p_prod = profiled_device_us(prod, iters=iters)
    p_fold = profiled_device_us(fold, iters=iters)
    out = {"geometry": f"{w}x{h}", "bit_exact_vs_production": equal}
    if p_prod is None or p_fold is None:
        out["error"] = "no device trace lanes (not on TPU?)"
        return out
    out["production_us"] = round(p_prod[0], 2)
    out["folded_us"] = round(p_fold[0], 2)
    out["production_split_us"] = {k2: round(v, 1) for k2, v in p_prod[1].items()}
    out["folded_split_us"] = {k2: round(v, 1) for k2, v in p_fold[1].items()}
    out["fold_wins"] = p_fold[0] < p_prod[0]
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--race", action="store_true")
    ap.add_argument("--geometry", default="1920x1080")
    a = ap.parse_args()
    if a.check:
        print(json.dumps(check(), indent=2))
    if a.race:
        gw, gh = (int(x) for x in a.geometry.split("x"))
        print(json.dumps(race(gw, gh), indent=2))
