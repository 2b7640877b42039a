"""Device-mesh parallelism: multi-stream / batched deblocking via shard_map.

The reference's only parallelism is intra-node (OpenMP over tile columns,
cpu.h:145; one CUDA thread per tile, gpu.cu:540-545) on a single device.
The TPU-native scaling story exploits the same property that made those
race-free -- every tile is independent -- so distribution is pure data
parallelism with ZERO collectives:

  * axis "data":    frames of a batch / concurrent streams across chips
  * axis "spatial": tile-row slabs of each frame across chips (a single 4K
                    frame can be split row-wise; slabs are tile-aligned and
                    exact, no halo exchange is ever needed)

Geometry never has to divide the mesh: the tile grid is padded with no-op
tiles (zero pixels, BS = 0 -- exact identities) up to the spatial axis size,
then unpadded.  Chroma planes go through the reference's tile-swept flat
view (quirk Q9; utils/tiles.split_covered).

Communication cost: the only inter-chip traffic is the initial shard scatter
and final gather done by jit's sharding machinery over ICI; steady-state
filtering is fully local, which is the optimum for this workload (SURVEY.md
section 2, parallelism checklist).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.deblock import deblock_frame
from ..ops.tables import HALF_BLOCK
from ..utils.tiles import SAMPLE_BLOCK_SIZE as _B, split_covered


def make_mesh(n_data: int, n_spatial: int, devices=None) -> Mesh:
    """Build a ("data", "spatial") mesh from the first n_data*n_spatial devices."""
    devices = devices if devices is not None else jax.devices()
    need = n_data * n_spatial
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.asarray(devices[:need]).reshape(n_data, n_spatial)
    return Mesh(arr, ("data", "spatial"))


def default_mesh_shape(n_devices: int) -> tuple[int, int]:
    """Split n devices into (data, spatial): largest power-of-two data axis
    that still leaves >= 2-way spatial sharding when possible."""
    if n_devices <= 1:
        return 1, 1
    n_data = 2 ** int(math.log2(n_devices) // 2) if (n_devices & (n_devices - 1)) == 0 else 1
    while n_devices % n_data:
        n_data //= 2
    return n_data, n_devices // n_data


def _pad_rows_to(plane_batch, maps, mult: int):
    """Pad tile-grid rows of (N, Hext, Wext) planes (and their (By, Bx) BS
    maps) with no-op tiles so By % mult == 0.  Returns (planes, maps, by)."""
    h = plane_batch.shape[-2]
    by = h // _B
    pad_tiles = (-by) % mult
    if pad_tiles:
        plane_batch = jnp.pad(plane_batch, ((0, 0), (0, pad_tiles * _B), (0, 0)))
        maps = tuple(jnp.pad(jnp.asarray(m), ((0, pad_tiles), (0, 0))) for m in maps)
    return plane_batch, maps, by


def deblock_batch_sharded(
    mesh: Mesh,
    y_batch,
    u_batch,
    v_batch,
    luma_maps,
    chroma_maps,
    beta,
    tc,
    luma_only: bool = False,
    backend: str = "jnp",
):
    """Deblock a batch of frames sharded over a ("data", "spatial") mesh.

    y_batch: (N, Hext, Wext) uint8; u/v: (N, cHext, cWext).  N must divide by
    the data axis; tile rows are padded to the spatial axis automatically.
    backend: "jnp" (XLA) or "pallas" -- each device runs the fused kernel on
    its local slab.  Returns filtered (y, u, v) batches with original shapes.
    """
    n_data = mesh.shape["data"]
    n_sp = mesh.shape["spatial"]
    if y_batch.shape[0] % n_data:
        raise ValueError(
            f"batch {y_batch.shape[0]} not divisible by data axis {n_data}"
        )

    # chroma planes go through the reference's tile-swept view (quirk Q9 --
    # flat buffer as an (8*ncby, 8*ncbx) image; see utils/tiles.split_covered),
    # sharded like any tile grid; the flat remainder is reattached afterwards.
    u_core, u_paste = split_covered(u_batch)
    v_core, v_paste = split_covered(v_batch)

    y_p, lmaps, by = _pad_rows_to(y_batch, luma_maps, n_sp)
    u_p, cmaps, cby = _pad_rows_to(u_core, chroma_maps, n_sp)
    v_p, _, _ = _pad_rows_to(v_core, chroma_maps, n_sp)

    plane_spec = P("data", "spatial", None)
    map_spec = P("spatial", None)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(plane_spec, plane_spec, plane_spec,
                  (map_spec,) * 4, (map_spec,) * 4, P(), P()),
        out_specs=(plane_spec, plane_spec, plane_spec),
        # pallas_call outputs carry no varying-mesh-axes metadata in this
        # JAX version; the specs above fully describe the sharding anyway
        check_vma=False,
    )
    def _local(y, u, v, lm, cm, b, t):
        # each device deblocks its own tile-aligned slab; tiles are
        # self-contained so no halo/collective is needed
        if backend == "pallas":
            from ..ops.pallas_kernel import deblock_frame_pallas

            # fold the local frame batch into tile rows (frames and slabs are
            # tile-aligned, so row-concat is exact), run the fused kernel once
            n, hy, wy = y.shape
            nc, hc, wc = u.shape
            lm2 = tuple(jnp.concatenate([m] * n, axis=0) for m in lm)
            cm2 = tuple(jnp.concatenate([m] * n, axis=0) for m in cm)
            yo, uo, vo = deblock_frame_pallas(
                y.reshape(n * hy, wy), u.reshape(nc * hc, wc), v.reshape(nc * hc, wc),
                lm2, cm2, b, t, luma_only=luma_only,
            )
            return (yo.reshape(n, hy, wy), uo.reshape(nc, hc, wc), vo.reshape(nc, hc, wc))
        return deblock_frame(y, u, v, lm, cm, b, t, luma_only=luma_only)

    yo, uo, vo = _local(
        y_p, u_p, v_p, tuple(jnp.asarray(m) for m in lmaps),
        tuple(jnp.asarray(m) for m in cmaps),
        jnp.int32(beta), jnp.int32(tc),
    )
    yo = yo[:, : by * _B]
    uo, vo = uo[:, : cby * _B], vo[:, : cby * _B]
    return yo, u_paste(uo, jnp), v_paste(vo, jnp)


def deblock_packed_batch_sharded(mesh, buf, luma_maps, chroma_maps, beta, tc,
                                 *, w, h, luma_only=False, backend="jnp"):
    """Packed sharded full graph: (N, 3wh/2) raw YV12 batch in -> filtered
    (N, 3wh/2) batch out, everything between the DMAs on device.

    This is the mesh twin of the single-chip packed graph
    (models/streaming._deblock_yv12_packed_impl): plane split, Q6 zero
    extension padding, the sharded deblock, interior slicing and output
    repack all run inside ONE jit, so the host ships exactly the packed
    bytes (one H2D per step) and gets exactly the packed bytes back --
    never the ~1.35x extended planes, and never a host-side np.pad.  The
    reference's pinned-memory copies (gpu.cu:1248-1256) shipped extended
    planes per frame; ours ships the minimal transfer, like everywhere
    else in this repo.  Pad/reshape/slice are per-frame elementwise over
    the batch, so GSPMD carries the batch sharding through to the
    shard_map'ed filter and back."""
    p = HALF_BLOCK
    cw, ch = w // 2, h // 2
    n = buf.shape[0]
    pad = ((0, 0), (p, p), (p, p))
    y = jnp.pad(buf[:, : w * h].reshape(n, h, w), pad)
    u = jnp.pad(buf[:, w * h : w * h + cw * ch].reshape(n, ch, cw), pad)
    v = jnp.pad(buf[:, w * h + cw * ch :].reshape(n, ch, cw), pad)
    yo, uo, vo = deblock_batch_sharded(mesh, y, u, v, luma_maps, chroma_maps,
                                       beta, tc, luma_only=luma_only,
                                       backend=backend)
    return jnp.concatenate([
        yo[:, p : p + h, p : p + w].reshape(n, h * w),
        uo[:, p : p + ch, p : p + cw].reshape(n, ch * cw),
        vo[:, p : p + ch, p : p + cw].reshape(n, ch * cw),
    ], axis=-1)


@functools.lru_cache(maxsize=32)
def _packed_sharded_jit(mesh: Mesh, w: int, h: int, luma_only: bool,
                        backend: str):
    return jax.jit(functools.partial(deblock_packed_batch_sharded, mesh,
                                     w=w, h=h, luma_only=luma_only,
                                     backend=backend))


def deblock_packed_batch_sharded_jit(mesh, buf, *args, w, h, luma_only=False,
                                     backend="jnp"):
    """jit-wrapped packed sharded graph (compiles once per geometry/mesh)."""
    return _packed_sharded_jit(mesh, w, h, luma_only, backend)(buf, *args)


def packed_batch_sharding(mesh: Mesh, frame_bytes: int) -> NamedSharding:
    """Input sharding for a packed (N, frame_bytes) batch: frames across
    "data", and frame BYTES across "spatial" when it exists and divides --
    so the total host->HBM volume is exactly the packed bytes (each byte
    lands on one chip; GSPMD redistributes byte slabs into tile-row slabs
    over ICI, which is orders of magnitude faster than the host wire)."""
    if "spatial" in mesh.shape and frame_bytes % mesh.shape["spatial"] == 0:
        return NamedSharding(mesh, P("data", "spatial"))
    return NamedSharding(mesh, P("data"))


@functools.lru_cache(maxsize=32)
def _sharded_jit(mesh: Mesh, luma_only: bool, backend: str):
    # one cached jit per (mesh, options); calling jax.jit afresh on every
    # invocation would defeat the compile cache and retrace each step
    return jax.jit(
        functools.partial(deblock_batch_sharded, mesh, luma_only=luma_only,
                          backend=backend)
    )


def deblock_batch_sharded_jit(mesh, *args, luma_only=False, backend="jnp"):
    """jit-wrapped sharded batch deblock (compiles once per geometry/mesh)."""
    return _sharded_jit(mesh, luma_only, backend)(*args)
