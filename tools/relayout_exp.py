"""Experiment: race plane->tile-planes relayout formulations on device.

The device trace (tools/profile_device.py) shows the packed pipeline's
plane <-> tile-planes relayout dominating its step (~717 us of ~850 us at
1080p) -- the uint8 minor-dim transpose runs at ~35 GB/s effective.  This
harness times candidate formulations with DEVICE-trace accounting:

  A  current: reshape (By,8,Bx,8) + transpose -> (8,8,By,Bx) uint8
  B  int32-widen first, same transpose (word-granularity shuffles)
  C  bitcast rows to i32 words: (By,8,Bx,8)u8 -> (By,8,Bx,2)i32 ->
     transpose -> (8,2,By,Bx) packed words (kernel would unpack in VMEM)
  D  two-stage: (By,8,Bx,8)->(By,Bx,8,8) u8 (minor dim kept), bitcast
     (By,Bx,8,2)i32, transpose -> (8,2,By,Bx)
  E  MXU one-hot: contract the tile-col axis with an identity in bf16 so
     the minor-dim change rides the MXU; remaining major reorder is a
     contiguous-row copy.  Exact for uint8 values (<=255 in bf16).

Each candidate is checked for equivalence against A (modulo packing) on a
small case first, then profiled at 1080p.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.profile_device import categorize, device_op_durations

B = 8


def v_a_current(x):
    h, w = x.shape
    t = x.reshape(h // B, B, w // B, B)
    return t.transpose(1, 3, 0, 2)


def v_b_int32(x):
    h, w = x.shape
    t = x.astype(jnp.int32).reshape(h // B, B, w // B, B)
    return t.transpose(1, 3, 0, 2)


def v_c_bitcast(x):
    h, w = x.shape
    t = x.reshape(h // B, B, w // B, 2, 4)
    words = jax.lax.bitcast_convert_type(t, jnp.int32)  # (By,8,Bx,2)
    return words.transpose(1, 3, 0, 2)  # (8,2,By,Bx) packed words


def v_d_twostage(x):
    h, w = x.shape
    t = x.reshape(h // B, B, w // B, B).transpose(0, 2, 1, 3)  # (By,Bx,8,8)
    words = jax.lax.bitcast_convert_type(t.reshape(h // B, w // B, B, 2, 4),
                                         jnp.int32)  # (By,Bx,8,2)
    return words.transpose(2, 3, 0, 1)  # (8,2,By,Bx)


def v_e_mxu(x):
    h, w = x.shape
    by, bx = h // B, w // B
    t = x.reshape(by, B, bx, B).astype(jnp.bfloat16)  # (y,k,x,c)
    eye = jnp.eye(bx, dtype=jnp.bfloat16)
    # contract tile-col x with identity: out (y,k,c,w) -- minor dim becomes Bx
    o = jax.lax.dot_general(t, eye, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # (y,k,c,w) -> (k,c,y,w): minor dim unchanged, contiguous-row reorder
    return o.transpose(1, 2, 0, 3).astype(jnp.uint8)


def unpack_words(wds):
    """(8,2,By,Bx) i32 -> (8,8,By,Bx) u8 on host for equivalence checks."""
    a = np.asarray(wds).astype(np.uint32)
    out = np.zeros((B, B) + a.shape[2:], np.uint8)
    for half in range(2):
        for j in range(4):
            out[:, 4 * half + j] = ((a[:, half] >> (8 * j)) & 0xFF).astype(np.uint8)
    return out


def v_e2_mxu_fullperm(x):
    """out[:, c*Bx+t] = x[:, 8t+c] via one (W,W) one-hot matmul, then the
    remaining row reorder (minor dim Bx unchanged -> contiguous-row copy)."""
    h, w = x.shape
    by, bx = h // B, w // B
    t_idx = np.arange(w)
    perm = np.zeros((w, w), np.float32)
    perm[t_idx, (t_idx % B) * bx + t_idx // B] = 1.0
    p = jnp.asarray(perm, jnp.bfloat16)
    o = jax.lax.dot_general(x.astype(jnp.bfloat16), p, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (H, [c,t])
    o = o.reshape(by, B, B, bx).transpose(1, 2, 0, 3)  # (k,c,y,t)
    return o.astype(jnp.uint8)


def v_e3_mxu_grouped(x):
    """Group 128 lanes = 16 tiles; transpose (16,8)->(8,16) within each group
    on the MXU with one shared (128,128) one-hot; the residual transpose
    moves 16-byte contiguous chunks instead of single bytes."""
    h, w = x.shape
    by, bx = h // B, w // B
    gw = -(-w // 128) * 128  # pad cols to lane groups
    xg = jnp.pad(x, ((0, 0), (0, gw - w)))
    ng = gw // 128
    i = np.arange(128)
    perm = np.zeros((128, 128), np.float32)
    perm[i, (i % B) * 16 + i // B] = 1.0  # (t,c) -> (c,t) within a group
    p = jnp.asarray(perm, jnp.bfloat16)
    o = jax.lax.dot_general(xg.reshape(h * ng, 128).astype(jnp.bfloat16), p,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o = o.reshape(by, B, ng, B, 16).transpose(1, 3, 0, 2, 4)  # (k,c,y,g,16)
    o = o.reshape(B, B, by, ng * 16)[..., :bx]
    return o.astype(jnp.uint8)


def v_e3b_mxu_grouped_u8(x):
    """E3 with the bf16->u8 convert BEFORE the residual transpose (4x less
    data moved by the chunked copy)."""
    h, w = x.shape
    by, bx = h // B, w // B
    gw = -(-w // 128) * 128
    xg = jnp.pad(x, ((0, 0), (0, gw - w)))
    ng = gw // 128
    i = np.arange(128)
    perm = np.zeros((128, 128), np.float32)
    perm[i, (i % B) * 16 + i // B] = 1.0
    p = jnp.asarray(perm, jnp.bfloat16)
    o = jax.lax.dot_general(xg.reshape(h * ng, 128).astype(jnp.bfloat16), p,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(jnp.uint8)
    o = o.reshape(by, B, ng, B, 16).transpose(1, 3, 0, 2, 4)
    return o.reshape(B, B, by, ng * 16)[..., :bx]


def _inv_norm(o):
    """normalize inverse-direction output: identity (it's already a plane)."""
    return np.asarray(o)


def v_inv_a_current(tiles):
    r, c, by, bx = tiles.shape
    return tiles.transpose(2, 0, 3, 1).reshape(by * B, bx * B)


def v_inv_e2_mxu(tiles):
    """(8,8,By,Bx) -> (Hext,Wext) via the transposed one-hot."""
    r, c, by, bx = tiles.shape
    w = bx * B
    t_idx = np.arange(w)
    perm = np.zeros((w, w), np.float32)
    perm[(t_idx % B) * bx + t_idx // B, t_idx] = 1.0
    p = jnp.asarray(perm, jnp.bfloat16)
    o = tiles.transpose(2, 0, 1, 3).reshape(by * B, B * bx)  # (y,k,[c,t]) rows
    o = jax.lax.dot_general(o.astype(jnp.bfloat16), p, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return o.astype(jnp.uint8)


VARIANTS = {
    "A_current_u8_transpose": (v_a_current, lambda o: np.asarray(o)),
    "B_int32_widen": (v_b_int32, lambda o: np.asarray(o).astype(np.uint8)),
    "C_bitcast_words": (v_c_bitcast, unpack_words),
    "D_twostage_words": (v_d_twostage, unpack_words),
    "E_mxu_onehot": (v_e_mxu, lambda o: np.asarray(o)),
    "E2_mxu_fullperm": (v_e2_mxu_fullperm, lambda o: np.asarray(o)),
    "E3_mxu_grouped": (v_e3_mxu_grouped, lambda o: np.asarray(o)),
    "E3b_grouped_u8": (v_e3b_mxu_grouped_u8, lambda o: np.asarray(o)),
}

INVERSE_VARIANTS = {
    "IA_current": (v_inv_a_current, _inv_norm),
    "IE2_mxu_fullperm": (v_inv_e2_mxu, _inv_norm),
}


def check_equivalence() -> None:
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (48, 64), np.uint8)
    ref = np.asarray(jax.jit(v_a_current)(x))
    for name, (fn, norm) in VARIANTS.items():
        got = norm(jax.device_get(jax.jit(fn)(x)))
        assert np.array_equal(got, ref), f"{name} mismatch"
    for name, (fn, norm) in INVERSE_VARIANTS.items():
        got = norm(jax.device_get(jax.jit(fn)(ref)))
        assert np.array_equal(got, x), f"{name} mismatch"
    print("equivalence: all variants OK", file=sys.stderr)


def profile(w: int = 1928, h: int = 2088, iters: int = 10) -> dict:
    rng = np.random.default_rng(0)
    xs = [jax.device_put(rng.integers(0, 256, (h, w), np.uint8)) for _ in range(4)]
    ts = [jax.jit(v_a_current)(x) for x in xs]
    report = {}
    for name, (fn, _) in INVERSE_VARIANTS.items():
        jf = jax.jit(fn)
        jax.block_until_ready([jf(t) for t in ts])
        d = tempfile.mkdtemp(prefix=f"relayout_{name}_")
        with jax.profiler.trace(d):
            jax.block_until_ready([jf(ts[i % 4]) for i in range(iters)])
        tot = device_op_durations(d)
        report[name] = {
            "per_call_us": {k: round(v / iters, 1) for k, v in categorize(tot).items()},
            "top_ops_us": {k: round(v / iters, 1)
                           for k, v in sorted(tot.items(), key=lambda kv: -kv[1])[:6]},
        }
    for name, (fn, _) in VARIANTS.items():
        jf = jax.jit(fn)
        jax.block_until_ready([jf(x) for x in xs])  # compile
        d = tempfile.mkdtemp(prefix=f"relayout_{name}_")
        with jax.profiler.trace(d):
            jax.block_until_ready([jf(xs[i % 4]) for i in range(iters)])
        tot = device_op_durations(d)
        cats = categorize(tot)
        top = sorted(tot.items(), key=lambda kv: -kv[1])[:6]
        report[name] = {
            "per_call_us": {k: round(v / iters, 1) for k, v in cats.items()},
            "top_ops_us": {k: round(v / iters, 1) for k, v in top},
        }
    return report


if __name__ == "__main__":
    check_equivalence()
    print(json.dumps(profile(), indent=2))
