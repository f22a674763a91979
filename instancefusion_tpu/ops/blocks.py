"""Sparse voxel-block TSDF map: directory + packed block payloads.

TPU-native replacement for GPU voxel hashing (the BASELINE contract maps
the reference's dense-map storage to "sharded block tables" — SURVEY.md §3
"Voxel hashing").  The classic CUDA design (Niessner-style bucketed hash
with pointers and atomics) is hostile to XLA: dynamic shapes, pointer
chasing, link lists.  The TPU-first design here:

- **Dense block directory** ``i32[Nb, Nb, Nb]``: block coordinate ->
  payload slot (or -1).  At 512^3 with 8^3 blocks this is 64^3 int32 =
  1 MB — cheaper than any hash table and O(1) lookup by a plain gather
  *from an argument* (constant-operand gathers poison this runtime).
- **Packed payloads** ``f32[capacity, 512]``: one row per live block,
  voxels flattened so the last dim is 512 = 4x128 lanes (VPU-aligned).
- **Out-of-band SDF sentinel**: unobserved voxels store sdf = 2.0
  (outside the truncation-normalized [-1, 1]).  Trilinear validity is
  then `max(corner sdf) < 1.5` — the raycaster never gathers the weight
  plane at all, cutting its random-access HBM traffic by ~40%.
- **Allocation by prefix sum**: touched-block mask -> cumsum assigns new
  slots in one pass; no atomics, no CAS loops, deterministic.
- **Per-frame work is compacted**: only the ≤ K blocks touched by the
  current frame's truncation band are gathered, updated, scattered back
  (`K` static; overflow counted, never UB).

All shapes static; everything jit-safe; payload arrays shard over the
slot axis for multi-device maps.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from instancefusion_tpu.config import TsdfConfig
from instancefusion_tpu.ops.common import decimate
from instancefusion_tpu.geometry.camera import Intrinsics, project, ray_directions
from instancefusion_tpu.geometry.se3 import se3_inverse, transform_points

# Unobserved-voxel SDF sentinel (stored sdf is in [-1, 1] once fused).
UNOBSERVED = 2.0


class BlockMap(NamedTuple):
    """Sparse TSDF volume as a block table (see module docstring)."""

    directory: jnp.ndarray  # i32[Nb,Nb,Nb] block coord -> slot, -1 = empty
    block_coords: jnp.ndarray  # i32[C,3] slot -> block coord (-1 = free)
    n_active: jnp.ndarray  # () i32 — number of live slots
    overflow: jnp.ndarray  # () i32 — blocks dropped due to capacity
    sdf: jnp.ndarray  # f32[C, B^3] normalized to [-1,1]
    weight: jnp.ndarray  # f32[C, B^3]
    # Packed per-row color planes: [r | g | b] channel segments of B^3
    # lanes each, f32[C, 3*B^3] (or [C, 0] when disabled).  Channel-
    # segmented rows keep every per-channel access a contiguous lane
    # slice, so the Pallas integrate/splat kernels read and update color
    # in place with zero split/stack copies of the (hundreds of MB)
    # payload per frame — the [C, B^3, 3] interleaved layout cost two
    # full-payload reshuffles per frame at 512^3.
    color: jnp.ndarray  # f32[C, 3*B^3]


def num_blocks_per_axis(cfg: TsdfConfig) -> int:
    assert cfg.grid_size % cfg.block_size == 0
    return cfg.grid_size // cfg.block_size


def allocate(cfg: TsdfConfig, with_color: bool = True) -> BlockMap:
    nb = num_blocks_per_axis(cfg)
    c = cfg.table_capacity
    b3 = cfg.block_size**3
    return BlockMap(
        directory=jnp.full((nb, nb, nb), -1, jnp.int32),
        block_coords=jnp.full((c, 3), -1, jnp.int32),
        n_active=jnp.zeros((), jnp.int32),
        overflow=jnp.zeros((), jnp.int32),
        sdf=jnp.full((c, b3), UNOBSERVED, jnp.float32),
        weight=jnp.zeros((c, b3), jnp.float32),
        color=jnp.zeros((c, 3 * b3 if with_color else 0), jnp.float32),
    )


def pack_color(c3: jnp.ndarray) -> jnp.ndarray:
    """Interleaved (..., B^3, 3) color -> packed (..., 3*B^3) rows."""
    return jnp.concatenate([c3[..., c] for c in range(3)], axis=-1)


def unpack_color(packed: jnp.ndarray) -> jnp.ndarray:
    """Packed (..., 3*B^3) color rows -> interleaved (..., B^3, 3)."""
    b3 = packed.shape[-1] // 3
    return jnp.stack(
        [packed[..., c * b3 : (c + 1) * b3] for c in range(3)], axis=-1
    )


def _local_offsets(cfg: TsdfConfig, dtype=jnp.int32) -> jnp.ndarray:
    """Voxel offsets within a block, (B^3, 3), iota-derived (no const table)."""
    b = cfg.block_size
    idx = jax.lax.broadcasted_iota(dtype, (b * b * b, 1), 0)[:, 0]
    ix = idx // (b * b)
    iy = (idx // b) % b
    iz = idx % b
    return jnp.stack([ix, iy, iz], axis=-1)


def touched_blocks_mask(
    depth: jnp.ndarray,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    cfg: TsdfConfig,
    samples: int = 5,
    stride: int = 1,
) -> jnp.ndarray:
    """Blocks intersected by this frame's truncation band: bool[Nb^3].

    Samples each pixel's ray at `samples` z-offsets spanning
    [-trunc-voxel, +trunc+voxel] around the measured depth and marks the
    containing block.  Dense rays (HW of them) make sparse along-ray
    sampling sufficient — the band is ~2 blocks thick.  `stride`
    subsamples pixels (blocks subtend >= ~10 px at practical voxel sizes
    and ranges, so stride 2 cannot miss one; scatters are the cost here).
    """
    nb = num_blocks_per_axis(cfg)
    rays = ray_directions(intr)  # (H,W,3) unit-z
    if stride > 1:
        rays = decimate(rays, stride)
        depth = decimate(depth, stride)
    R = T_wc[:3, :3]
    o = T_wc[:3, 3]
    dirs_w = rays.reshape(-1, 3) @ R.T  # unit-z dirs in world
    valid = (depth > 0.0).reshape(-1)
    d = depth.reshape(-1)

    band = cfg.trunc + cfg.voxel_size
    offs = jnp.linspace(-band, band, samples)
    origin = jnp.asarray(cfg.origin, jnp.float32)
    bsz = cfg.block_size * cfg.voxel_size

    mask = jnp.zeros((nb * nb * nb,), jnp.int32)
    for i in range(samples):
        p = o[None, :] + dirs_w * (d + offs[i])[:, None]
        g = jnp.floor((p - origin) / bsz).astype(jnp.int32)
        inb = jnp.all((g >= 0) & (g < nb), axis=-1) & valid
        flat = (g[:, 0] * nb + g[:, 1]) * nb + g[:, 2]
        flat = jnp.where(inb, flat, nb * nb * nb)  # OOB -> dropped
        mask = mask.at[flat].max(1, mode="drop")
    return mask.astype(bool)


def frustum_allocated_mask(
    bm: BlockMap,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    cfg: TsdfConfig,
    near: float,
    far: float,
) -> jnp.ndarray:
    """Already-allocated blocks whose center lies in the view frustum.

    Feeding these into the per-frame integrate list *space-carves* free
    space: projective-TSDF fins (spurious in-band voxels in the shadow of
    depth edges, fused from grazing views) sit between the camera and the
    real surface, outside the measurement band — they are only erased if
    allocated in-frustum blocks keep receiving free-space (+1) updates.
    Returns bool[Nb^3] over the directory.
    """
    nb = num_blocks_per_axis(cfg)
    bsz = cfg.block_size * cfg.voxel_size
    origin = jnp.asarray(cfg.origin, jnp.float32)
    c = bm.block_coords.shape[0]
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)[:, 0]
    allocated = (slot_ids < bm.n_active) & (bm.block_coords[:, 0] >= 0)
    centers = origin + (bm.block_coords.astype(jnp.float32) + 0.5) * bsz
    p_c = transform_points(se3_inverse(T_wc), centers)
    z = p_c[:, 2]
    zs = jnp.maximum(z, 1e-3)
    u = intr.fx * p_c[:, 0] / zs + intr.cx
    v = intr.fy * p_c[:, 1] / zs + intr.cy
    m = intr.fx * bsz / zs  # screen-space margin ~ block radius
    inview = (
        allocated
        & (z > near - bsz)
        & (z < far)
        & (u > -m)
        & (u < intr.width - 1 + m)
        & (v > -m)
        & (v < intr.height - 1 + m)
    )
    bc = bm.block_coords
    flat = (bc[:, 0] * nb + bc[:, 1]) * nb + bc[:, 2]
    flat = jnp.where(inview, flat, nb * nb * nb)  # OOB -> dropped
    mask = jnp.zeros((nb * nb * nb,), jnp.int32).at[flat].max(1, mode="drop")
    return mask.astype(bool)


def discover_allocate(
    bm: BlockMap,
    depth: jnp.ndarray,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    cfg: TsdfConfig,
    samples: int = 3,
    stride: int = 4,
    alloc_cap: int = 4096,
) -> BlockMap:
    """Allocate this frame's new band blocks without any directory-sized scatter.

    The mask-based path (`touched_blocks_mask` + `allocate_touched`)
    scatters into — and cumsums over — the Nb^3 directory every frame;
    XLA scatters on TPU serialize at ~10^8 elem/s, making that the
    dominant map-bookkeeping cost (~12 ms/frame at 512^3).  This path
    works on *lists* instead:

    1. sample the measurement band (as `touched_blocks_mask`) into flat
       block ids, (samples * H/stride * W/stride,);
    2. one gather from the directory filters ids that are already
       allocated (the overwhelming majority after warm-up);
    3. `top_k` over the remaining ids sorts duplicates adjacent; a
       neighbor-compare dedups them;
    4. the <= alloc_cap unique new ids are assigned slots by a short
       cumsum and scattered into directory/coords — alloc_cap-sized
       scatters, not Nb^3-sized.

    Rays with no measured depth discover nothing — their band covers
    already-predicted, hence already-allocated, blocks.  Blocks missed by
    the stride subsampling (footprints < stride px, i.e. beyond ~8 m at
    1 cm voxels) are picked up by a later frame; integrate/predict lists
    come from `frustum_slots`, so a late allocation is never UB.
    """
    nb = num_blocks_per_axis(cfg)
    nb3 = nb * nb * nb
    c = cfg.table_capacity
    rays = ray_directions(intr)
    if stride > 1:
        rays = decimate(rays, stride)
        depth = decimate(depth, stride)
    R = T_wc[:3, :3]
    o = T_wc[:3, 3]
    dirs_w = rays.reshape(-1, 3) @ R.T
    d = depth.reshape(-1)
    valid = d > 0.0

    band = cfg.trunc + cfg.voxel_size
    offs = jnp.linspace(-band, band, samples)
    origin = jnp.asarray(cfg.origin, jnp.float32)
    bsz = cfg.block_size * cfg.voxel_size

    ids = []
    for i in range(samples):
        p = o[None, :] + dirs_w * (d + offs[i])[:, None]
        g = jnp.floor((p - origin) / bsz).astype(jnp.int32)
        inb = jnp.all((g >= 0) & (g < nb), axis=-1) & valid
        flat = (g[:, 0] * nb + g[:, 1]) * nb + g[:, 2]
        ids.append(jnp.where(inb, flat, -1))
    flat_all = jnp.concatenate(ids)

    # Dedup BEFORE selecting: a plain top_k over the samples would fill
    # its window with duplicates of the largest ids (a block's footprint
    # is sampled dozens of times).  Sort (dups adjacent) -> keep first
    # occurrence -> top_k selects among *distinct* ids; only those
    # <= alloc_cap survivors hit the directory (one tiny gather) to filter
    # already-allocated blocks.
    srt = jnp.sort(flat_all)
    prev_s = jnp.concatenate([jnp.full((1,), -2, jnp.int32), srt[:-1]])
    first = (srt >= 0) & (srt != prev_s)
    # Small cameras can produce fewer candidate samples than alloc_cap;
    # top_k requires k <= n.
    alloc_cap = min(alloc_cap, flat_all.shape[0])
    top, _ = jax.lax.top_k(jnp.where(first, srt, -1), alloc_cap)
    have = bm.directory.reshape(-1)[jnp.maximum(top, 0)] >= 0
    uniq = (top >= 0) & jnp.logical_not(have)
    order = jnp.cumsum(uniq.astype(jnp.int32)) - 1
    new_slot = bm.n_active + order
    fits = uniq & (new_slot < c - RESERVED_SLOTS)
    n_new = jnp.sum(fits.astype(jnp.int32))
    n_drop = jnp.sum(uniq.astype(jnp.int32)) - n_new

    dir_ids = jnp.where(fits, top, nb3)  # OOB -> dropped
    dir_new = (
        bm.directory.reshape(-1).at[dir_ids].set(new_slot, mode="drop")
    )
    coords = jnp.stack(
        [top // (nb * nb), (top // nb) % nb, top % nb], axis=-1
    ).astype(jnp.int32)
    slot_ids = jnp.where(fits, new_slot, c)  # OOB -> dropped
    block_coords = bm.block_coords.at[slot_ids].set(coords, mode="drop")

    return bm._replace(
        directory=dir_new.reshape(bm.directory.shape),
        block_coords=block_coords,
        n_active=bm.n_active + n_new,
        overflow=bm.overflow + n_drop,
    )


def compact_mask_indices(
    mask: jnp.ndarray, k: int, fill: int = 0
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of set bits of `mask` (ascending), compacted to length k.

    Same contract as the `jax.lax.top_k(mask.astype(int32), k)` index
    output this replaces, but via prefix-sum + bounded scatter: top_k at
    k ~ 1024 is a k-deep partial sort (~3 ms/frame on TPU at 8k inputs on
    the per-frame path); the cumsum + k-sized scatter is ~0.1 ms.
    Returns (idx i32[k], valid bool[k]); set bits beyond k are dropped
    (callers account overflow via sum(mask) vs k, as before).
    """
    n = mask.shape[0]
    m = mask.astype(jnp.int32)
    order = jnp.cumsum(m) - 1  # rank of each set bit
    pos = jnp.where(mask & (order < k), order, k)  # k = dropped
    src = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)[:, 0]
    idx = jnp.full((k,), fill, jnp.int32).at[pos].set(src, mode="drop")
    count = jnp.minimum(order[-1] + 1, k)
    valid = jax.lax.broadcasted_iota(jnp.int32, (k, 1), 0)[:, 0] < count
    return idx, valid


def frustum_mask(
    bm: BlockMap,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    cfg: TsdfConfig,
    near: float,
    far: float,
) -> jnp.ndarray:
    """Allocated blocks whose center is inside the view frustum: bool[C]."""
    c = bm.block_coords.shape[0]
    bsz = cfg.block_size * cfg.voxel_size
    origin = jnp.asarray(cfg.origin, jnp.float32)
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)[:, 0]
    allocated = (slot_ids < bm.n_active) & (bm.block_coords[:, 0] >= 0)
    centers = origin + (bm.block_coords.astype(jnp.float32) + 0.5) * bsz
    p_c = transform_points(se3_inverse(T_wc), centers)
    z = p_c[:, 2]
    zs = jnp.maximum(z, 1e-3)
    u = intr.fx * p_c[:, 0] / zs + intr.cx
    v = intr.fy * p_c[:, 1] / zs + intr.cy
    m = intr.fx * bsz / zs
    return (
        allocated
        & (z > near - bsz)
        & (z < far)
        & (u > -m)
        & (u < intr.width - 1 + m)
        & (v > -m)
        & (v < intr.height - 1 + m)
    )


def frustum_slots(
    bm: BlockMap,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    cfg: TsdfConfig,
    near: float,
    far: float,
    k: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Compacted list of allocated in-frustum payload slots: (i32[k], bool[k]).

    Replaces the `frustum_allocated_mask` -> directory scatter ->
    `compact_touched_slots` round trip for the per-frame fast path: the
    in-view test runs directly over the slot axis (block_coords) and the
    slot *indices* are compacted with one prefix-sum scatter over the
    capacity axis — no Nb^3 array is ever touched.  Every band block is in-frustum by
    construction (it projects into the image), so after
    `discover_allocate` this list covers integration, space carving, and
    splat prediction in one.
    """
    inview = frustum_mask(bm, T_wc, intr, cfg, near, far)
    return compact_mask_indices(inview, k)


def frustum_groups(
    bm: BlockMap,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    cfg: TsdfConfig,
    near: float,
    far: float,
    kg: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """In-frustum payload ROW GROUPS: (gids i32[kg], row_valid bool[kg, 8]).

    The group-indexed fast path (ops/pallas/tsdf.fused_integrate_groups /
    raycast.splat_depth_groups): payload rows are addressed as groups of 8
    consecutive slots, which Pallas kernels read/write directly through
    data-dependent BlockSpec index maps — eliminating the XLA row
    gather + scatter (~1 ms per plane per frame at 2048 rows) entirely.
    Pad entries point at the RESERVED last group (never allocated — see
    `reserved_slots`), so duplicate-visit hazards cannot occur.
    """
    c = bm.block_coords.shape[0]
    inview = frustum_mask(bm, T_wc, intr, cfg, near, far)
    by_group = inview.reshape(-1, 8)
    gmask = jnp.any(by_group, axis=1)
    gids, gvalid = compact_mask_indices(gmask, kg, fill=c // 8 - 1)
    row_valid = by_group[gids] & gvalid[:, None]
    return gids, row_valid


def frustum_groups_binned(
    bm: BlockMap,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    cfg: TsdfConfig,
    near: float,
    far: float,
    ks: int,
    kl: int,
    th_small: int = 64,
    rmax: int = 8,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """`frustum_groups` split by projected-window footprint.

    The r3 profile's biggest remaining lever: both group kernels run a
    fixed 128-row one-hot window while the median 512^3/VGA block
    footprint is ~42 px — so groups whose every member block's projected
    bbox (with the splat tent margin, the wider of the two kernels') fits
    a `th_small`-row tile-aligned window go to the SMALL bin and run the
    th=64 kernel variant at roughly half the matmul area; the rest
    (near-camera blocks, camera-plane straddlers, clipped windows) go to
    the LARGE bin with the full 128-row window.  Returns
    (gids_s i32[ks], rv_s bool[ks,8], gids_l i32[kl], rv_l bool[kl,8]);
    the two lists are disjoint and their union is `frustum_groups`'s.
    """
    c = bm.block_coords.shape[0]
    hp = -(-intr.height // 8) * 8
    inview = frustum_mask(bm, T_wc, intr, cfg, near, far)

    # Per-slot projected v-extent, mirroring pallas.raycast.block_windows.
    b = cfg.block_size
    bsz = b * cfg.voxel_size
    origin = jnp.asarray(cfg.origin, jnp.float32)
    T_cw = se3_inverse(T_wc)
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    corner = jnp.stack(
        [jnp.array([i // 4, (i // 2) % 2, i % 2], jnp.float32) for i in range(8)]
    )
    coords = jnp.maximum(bm.block_coords, 0)
    p_w = origin + (coords[:, None, :].astype(jnp.float32) + corner[None]) * bsz
    p_c = p_w @ R.T + t  # (C, 8, 3)
    z = p_c[..., 2]
    z_min = jnp.min(z, axis=1)
    zs = jnp.maximum(z, 1e-3)
    v = intr.fy * p_c[..., 1] / zs + intr.cy
    z_cen = jnp.mean(z, axis=1)
    r_tent = jnp.clip(
        0.7 * intr.fx * cfg.voxel_size / jnp.maximum(z_cen, 0.3),
        1.0, float(rmax),
    )
    vmin = jnp.min(v, axis=1) - r_tent
    vmax = jnp.max(v, axis=1) + r_tent
    ths = min(th_small, hp)
    v0 = jnp.clip(
        (jnp.floor(vmin).astype(jnp.int32) // 8) * 8, 0, max(hp - ths, 0)
    )
    fits = (z_min > 1e-3) & (vmax <= (v0 + ths - 1).astype(jnp.float32))

    by_group = inview.reshape(-1, 8)
    # A group is small iff every in-view member fits the small window.
    gsmall = jnp.all(jnp.logical_not(by_group) | fits.reshape(-1, 8), axis=1)
    gmask = jnp.any(by_group, axis=1)
    fill = c // 8 - 1  # the reserved pad group
    gids_s, gv_s = compact_mask_indices(gmask & gsmall, ks, fill=fill)
    gids_l, gv_l = compact_mask_indices(gmask & ~gsmall, kl, fill=fill)
    rv_s = by_group[gids_s] & gv_s[:, None]
    rv_l = by_group[gids_l] & gv_l[:, None]
    return gids_s, rv_s, gids_l, rv_l


# Payload slots reserved as the Pallas group-kernels' pad target: the last
# group of 8 rows is never allocated, so pad grid steps that read/write it
# can never race with a real update.
RESERVED_SLOTS = 8


def allocate_touched(bm: BlockMap, touched: jnp.ndarray, cfg: TsdfConfig) -> BlockMap:
    """Assign payload slots to touched-but-unallocated blocks (prefix sum).

    Replaces the reference pattern of atomic-CAS hash insertion with a
    deterministic cumsum over the (small) directory.  Blocks beyond
    capacity are dropped and counted in `overflow`.
    """
    nb = num_blocks_per_axis(cfg)
    c = cfg.table_capacity
    dir_flat = bm.directory.reshape(-1)
    need = touched & (dir_flat < 0)
    order = jnp.cumsum(need.astype(jnp.int32)) - 1  # rank among new blocks
    new_slot = bm.n_active + order
    fits = need & (new_slot < c - RESERVED_SLOTS)
    n_new = jnp.sum(fits.astype(jnp.int32))
    n_drop = jnp.sum(need.astype(jnp.int32)) - n_new

    dir_new = jnp.where(fits, new_slot, dir_flat).astype(jnp.int32)

    # Write slot -> block coord for the new slots.
    idx = jax.lax.broadcasted_iota(jnp.int32, (nb * nb * nb, 1), 0)[:, 0]
    coords = jnp.stack([idx // (nb * nb), (idx // nb) % nb, idx % nb], axis=-1)
    scatter_slot = jnp.where(fits, new_slot, c)  # OOB -> dropped
    block_coords = bm.block_coords.at[scatter_slot].set(coords, mode="drop")

    return bm._replace(
        directory=dir_new.reshape(bm.directory.shape),
        block_coords=block_coords,
        n_active=bm.n_active + n_new,
        overflow=bm.overflow + n_drop,
    )


def compact_touched_slots(
    bm: BlockMap, touched: jnp.ndarray, cfg: TsdfConfig, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Static-size list of payload slots to update this frame.

    Returns (slots i32[k], valid bool[k]).  A prefix-sum compaction over
    the directory-sized 0/1 mask selects the touched set; beyond-k blocks
    are skipped this frame (counted by the caller via sum(touched) vs k).
    """
    idx, tvalid = compact_mask_indices(touched, k)
    slots = bm.directory.reshape(-1)[idx]
    valid = tvalid & (slots >= 0)
    return jnp.where(valid, slots, 0), valid


def integrate(
    bm: BlockMap,
    depth: jnp.ndarray,
    color: jnp.ndarray | None,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    cfg: TsdfConfig,
    max_touched: int | None = None,
) -> BlockMap:
    """Fuse one frame: allocate band blocks, update only those blocks.

    Identical math to the dense `tsdf.integrate` (its golden test target),
    but touches `max_touched * B^3` voxels instead of `grid_size^3`.
    """
    if max_touched is None:
        max_touched = cfg.touched_capacity
    touched = touched_blocks_mask(depth, T_wc, intr, cfg)
    bm = allocate_touched(bm, touched, cfg)
    nb3 = num_blocks_per_axis(cfg) ** 3
    slots, valid = compact_touched_slots(bm, touched, cfg, min(max_touched, nb3))
    return integrate_slots(bm, slots, valid, depth, color, T_wc, intr, cfg)


def integrate_slots(
    bm: BlockMap,
    slots: jnp.ndarray,  # i32[K] payload rows to update
    valid: jnp.ndarray,  # bool[K]
    depth: jnp.ndarray,
    color: jnp.ndarray | None,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    cfg: TsdfConfig,
    color_gain: float = 1.0,
) -> BlockMap:
    """Fuse one frame into an explicit (already compacted) block list.

    Split out of `integrate` so the engine can share one touched-block
    list between integration and the splat raycaster.

    On TPU with cfg.use_pallas the whole update — including the per-voxel
    depth/color image association — runs as ONE Pallas kernel with the
    gather mapped onto the MXU (ops/pallas/tsdf.fused_integrate); the XLA
    path below is its golden and the CPU fallback.
    """
    if cfg.use_pallas and jax.default_backend() == "tpu":
        from instancefusion_tpu.ops.pallas.tsdf import fused_integrate

        frame_color = color if (color is not None and bm.color.size) else None
        sdf_rows, w_rows, color_rows, out_slots = fused_integrate(
            slots, valid, bm.block_coords, bm.sdf, bm.weight, bm.color,
            depth, frame_color, T_wc, intr, cfg, color_gain=color_gain,
        )
        new = bm._replace(
            sdf=bm.sdf.at[out_slots].set(sdf_rows, mode="drop"),
            weight=bm.weight.at[out_slots].set(w_rows, mode="drop"),
        )
        if color_rows is not None:
            new = new._replace(
                color=bm.color.at[out_slots].set(color_rows, mode="drop")
            )
        return new

    # (The Pallas path above skips blocks straddling the camera plane —
    # their projected window is meaningless; this jnp golden keeps exact
    # per-voxel semantics, matching the dense reference.  The divergence
    # only affects blocks the camera is physically inside of, nearer than
    # any sensor's depth_min.)
    b3 = cfg.block_size**3
    coords = bm.block_coords[slots]  # (K,3)
    local = _local_offsets(cfg)  # (B^3,3)
    origin = jnp.asarray(cfg.origin, jnp.float32)
    vox_idx = coords[:, None, :] * cfg.block_size + local[None, :, :]  # (K,B^3,3)
    p_w = origin + (vox_idx.astype(jnp.float32) + 0.5) * cfg.voxel_size

    T_cw = se3_inverse(T_wc)
    p_c = transform_points(T_cw, p_w.reshape(-1, 3)).reshape(p_w.shape)
    u, v, z = project(intr, p_c)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    in_img = (ui >= 0) & (ui < intr.width) & (vi >= 0) & (vi < intr.height)
    uic = jnp.clip(ui, 0, intr.width - 1)
    vic = jnp.clip(vi, 0, intr.height - 1)
    d = depth[vic, uic]
    sdf_obs = d - z
    ok = in_img & (z > 0.0) & (d > 0.0) & (sdf_obs > -cfg.trunc) & valid[:, None]
    psi = jnp.clip(sdf_obs / cfg.trunc, -1.0, 1.0)
    w_obs = jnp.where(ok, 1.0, 0.0)

    sdf_old = bm.sdf[slots]
    w_old = bm.weight[slots]
    has_color = color is not None and bm.color.size
    out_slots = jnp.where(valid, slots, bm.sdf.shape[0])  # OOB -> dropped

    if cfg.use_pallas and has_color:
        # Fused read-modify-write of all payload planes in one pass
        # (ops/pallas/tsdf.py); association gather above stays XLA.
        from instancefusion_tpu.ops.pallas.tsdf import fused_tsdf_update

        c_old = bm.color[slots]  # (K, 3*B^3) packed
        c_obs = pack_color(color[vic, uic])
        sdf_new, w_new, c_new = fused_tsdf_update(
            sdf_old, w_old, c_old, psi, w_obs, c_obs,
            cfg.max_weight, jax.default_backend() != "tpu", color_gain)
        return bm._replace(
            sdf=bm.sdf.at[out_slots].set(sdf_new, mode="drop"),
            weight=bm.weight.at[out_slots].set(w_new, mode="drop"),
            color=bm.color.at[out_slots].set(c_new, mode="drop"),
        )

    w_new = w_old + w_obs
    denom = jnp.maximum(w_new, 1e-6)
    # Preserve the UNOBSERVED sentinel where nothing has ever been fused
    # (0/denom would silently write 0.0 and corrupt sentinel validity).
    sdf_new = jnp.where(
        w_new > 0.0, (sdf_old * w_old + psi * w_obs) / denom, sdf_old
    )
    w_new = jnp.minimum(w_new, cfg.max_weight)

    new_sdf = bm.sdf.at[out_slots].set(sdf_new, mode="drop")
    new_w = bm.weight.at[out_slots].set(w_new, mode="drop")

    new_color = bm.color
    if has_color:
        # color_gain: color-cadence compensation (EngineConfig.color_every)
        # — see ops/pallas/tsdf._update_kernel for the derivation.
        c_old = bm.color[slots]  # (K, 3*B^3) packed
        c_obs = pack_color(color[vic, uic])
        w3 = jnp.tile(w_old, (1, 3))
        wc3 = jnp.tile(color_gain * w_obs, (1, 3))
        c_new = (c_old * w3 + c_obs * wc3) / jnp.maximum(w3 + wc3, 1e-6)
        new_color = bm.color.at[out_slots].set(c_new, mode="drop")

    return bm._replace(sdf=new_sdf, weight=new_w, color=new_color)


def integrate_groups(
    bm: BlockMap,
    gids: jnp.ndarray,  # i32[KG] payload row groups (frustum_groups)
    row_valid: jnp.ndarray,  # bool[KG, 8]
    depth: jnp.ndarray,
    color: jnp.ndarray | None,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    cfg: TsdfConfig,
    color_gain: float = 1.0,
) -> BlockMap:
    """Group-addressed fuse: payload planes updated IN PLACE (TPU path).

    See ops/pallas/tsdf.fused_integrate_groups — eliminates the XLA row
    gather/scatter of the slot-list path.  The CPU/golden fallback
    flattens the groups to a slot list and reuses `integrate_slots`.
    """
    if cfg.use_pallas and jax.default_backend() == "tpu":
        from instancefusion_tpu.ops.pallas.tsdf import fused_integrate_groups

        frame_color = color if (color is not None and bm.color.size) else None
        sdf, w, col = fused_integrate_groups(
            gids, row_valid, bm.block_coords, bm.sdf, bm.weight, bm.color,
            depth, frame_color, T_wc, intr, cfg, color_gain=color_gain,
        )
        return bm._replace(sdf=sdf, weight=w, color=col)
    slots = (gids[:, None] * 8 + jnp.arange(8, dtype=jnp.int32)[None, :]).reshape(-1)
    return integrate_slots(
        bm, slots, row_valid.reshape(-1), depth, color, T_wc, intr, cfg,
        color_gain=color_gain,
    )


def integrate_groups_binned(
    bm: BlockMap,
    bins,  # sequence of (gids i32[K], row_valid bool[K,8], th int)
    depth: jnp.ndarray,
    color: jnp.ndarray | None,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    cfg: TsdfConfig,
    color_gain: float = 1.0,
) -> BlockMap:
    """`integrate_groups` over footprint bins (frustum_groups_binned).

    Bins are disjoint group sets, so the sequential in-place kernel calls
    compose exactly; each runs at its own window height (TPU path — the
    CPU/golden fallback inside integrate_groups flattens each bin).
    """
    for gids, row_valid, th in bins:
        if cfg.use_pallas and jax.default_backend() == "tpu":
            from instancefusion_tpu.ops.pallas.tsdf import fused_integrate_groups

            frame_color = color if (color is not None and bm.color.size) else None
            sdf, w, col = fused_integrate_groups(
                gids, row_valid, bm.block_coords, bm.sdf, bm.weight,
                bm.color, depth, frame_color, T_wc, intr, cfg,
                color_gain=color_gain, th=th,
            )
            bm = bm._replace(sdf=sdf, weight=w, color=col)
        else:
            bm = integrate_groups(
                bm, gids, row_valid, depth, color, T_wc, intr, cfg,
                color_gain=color_gain,
            )
    return bm


def raycast_splat_groups_binned(
    bm: BlockMap,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    tsdf_cfg: TsdfConfig,
    bins,  # sequence of (gids, row_valid, th)
    with_color: bool = True,
    depth_prior: jnp.ndarray | None = None,
    rmax: int = 8,
):
    """`raycast_splat_groups` over footprint bins (TPU only).

    The splat kernel's six output planes are scatter-add accumulators,
    so rendering disjoint bins separately and SUMMING the raw planes is
    exactly the single-call result; normalization runs once at the end.
    """
    from instancefusion_tpu.ops.pallas.raycast import (
        finish_splat_images, splat_depth_groups,
    )
    from instancefusion_tpu.ops.raycast import RaycastMaps

    acc = None
    for gids, row_valid, th in bins:
        outs = splat_depth_groups(
            gids, row_valid, bm.block_coords, bm.sdf, bm.weight, bm.color,
            T_wc, intr, tsdf_cfg,
            with_color=with_color and bool(bm.color.size),
            depth_prior=depth_prior, rmax=rmax, th=th, raw=True,
        )
        acc = outs if acc is None else [a + o for a, o in zip(acc, outs)]
    imgs = finish_splat_images(
        acc, intr, tsdf_cfg,
        with_color=with_color and bool(bm.color.size),
        depth_prior=depth_prior,
    )
    rays_c = ray_directions(intr)  # unit-z
    R = T_wc[:3, :3]
    origin_w = T_wc[:3, 3]
    dirs_z = (rays_c.reshape(-1, 3) @ R.T).reshape(rays_c.shape)
    p_hit = origin_w + imgs.depth[..., None] * dirs_z
    dirs_unit = dirs_z / jnp.maximum(
        jnp.linalg.norm(dirs_z, axis=-1, keepdims=True), 1e-12
    )
    normal_w, nvalid = _image_space_normals(p_hit, imgs.valid, dirs_unit)
    valid = imgs.valid & nvalid
    zero3 = jnp.zeros_like(p_hit)
    return RaycastMaps(
        vertex_w=jnp.where(valid[..., None], p_hit, zero3),
        normal_w=jnp.where(valid[..., None], normal_w, zero3),
        depth=jnp.where(valid, imgs.depth, 0.0),
        color=jnp.where(valid[..., None], imgs.color, 0.0),
        valid=valid,
    )


def sample_trilinear(
    bm: BlockMap, p_w: jnp.ndarray, cfg: TsdfConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Trilinear SDF sample at world points (..., 3) across block borders.

    Matches `tsdf.sample_trilinear` semantics on allocated space: valid
    requires all 8 stencil corners to live in allocated blocks with
    weight > 0.  One directory gather + one payload gather per corner.
    """
    nb = num_blocks_per_axis(cfg)
    b = cfg.block_size
    b3 = b * b * b
    n = cfg.grid_size
    g = (p_w - jnp.asarray(cfg.origin, p_w.dtype)) / cfg.voxel_size - 0.5
    g0 = jnp.floor(g)
    frac = g - g0
    g0i = g0.astype(jnp.int32)
    inb = jnp.all((g0i >= 0) & (g0i < n - 1), axis=-1)
    g0c = jnp.clip(g0i, 0, n - 2)

    dir_flat = bm.directory.reshape(-1)
    sdf_flat = bm.sdf.reshape(-1)

    # Weight is never gathered here: unallocated/unobserved corners read
    # as the UNOBSERVED sentinel and invalidate via smax (one f32 gather
    # per corner instead of sdf + weight).
    val = jnp.zeros(p_w.shape[:-1], p_w.dtype)
    smax = jnp.full(p_w.shape[:-1], -jnp.inf, p_w.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                vi = g0c + jnp.array([di, dj, dk], jnp.int32)
                blk = vi // b
                loc = vi - blk * b
                bflat = (blk[..., 0] * nb + blk[..., 1]) * nb + blk[..., 2]
                slot = dir_flat[bflat]
                have = slot >= 0
                slot_c = jnp.maximum(slot, 0)
                lflat = (loc[..., 0] * b + loc[..., 1]) * b + loc[..., 2]
                vidx = slot_c * b3 + lflat
                s = jnp.where(have, sdf_flat[vidx], UNOBSERVED)
                tw = (
                    (frac[..., 0] if di else 1.0 - frac[..., 0])
                    * (frac[..., 1] if dj else 1.0 - frac[..., 1])
                    * (frac[..., 2] if dk else 1.0 - frac[..., 2])
                )
                val = val + tw * s
                smax = jnp.maximum(smax, s)
    valid = inb & (smax < 1.5)
    return val, valid


def sample_color_trilinear(
    bm: BlockMap, p_w: jnp.ndarray, cfg: TsdfConfig
) -> jnp.ndarray:
    nb = num_blocks_per_axis(cfg)
    b = cfg.block_size
    b3 = b * b * b
    n = cfg.grid_size
    g = (p_w - jnp.asarray(cfg.origin, p_w.dtype)) / cfg.voxel_size - 0.5
    g0 = jnp.floor(g)
    frac = g - g0
    g0c = jnp.clip(g0.astype(jnp.int32), 0, n - 2)
    dir_flat = bm.directory.reshape(-1)
    col_flat = bm.color.reshape(-1)  # packed rows: slot*3*B^3 + ch*B^3 + v
    val = jnp.zeros(p_w.shape[:-1] + (3,), p_w.dtype)
    for di in (0, 1):
        for dj in (0, 1):
            for dk in (0, 1):
                vi = g0c + jnp.array([di, dj, dk], jnp.int32)
                blk = vi // b
                loc = vi - blk * b
                bflat = (blk[..., 0] * nb + blk[..., 1]) * nb + blk[..., 2]
                slot = dir_flat[bflat]
                have = slot >= 0
                slot_c = jnp.maximum(slot, 0)
                lflat = (loc[..., 0] * b + loc[..., 1]) * b + loc[..., 2]
                base = slot_c * (3 * b3) + lflat
                c = jnp.stack(
                    [col_flat[base + ch * b3] for ch in range(3)], axis=-1
                )
                tw = (
                    (frac[..., 0] if di else 1.0 - frac[..., 0])
                    * (frac[..., 1] if dj else 1.0 - frac[..., 1])
                    * (frac[..., 2] if dk else 1.0 - frac[..., 2])
                )
                val = val + (tw * have)[..., None] * c
    return val


def occupancy_at(bm: BlockMap, p_w: jnp.ndarray, cfg: TsdfConfig) -> jnp.ndarray:
    """Is the block containing each point allocated?  bool(...)."""
    nb = num_blocks_per_axis(cfg)
    bsz = cfg.block_size * cfg.voxel_size
    g = jnp.floor((p_w - jnp.asarray(cfg.origin, p_w.dtype)) / bsz).astype(jnp.int32)
    inb = jnp.all((g >= 0) & (g < nb), axis=-1)
    gc = jnp.clip(g, 0, nb - 1)
    flat = (gc[..., 0] * nb + gc[..., 1]) * nb + gc[..., 2]
    return inb & (bm.directory.reshape(-1)[flat] >= 0)


def sdf_gradient(
    bm: BlockMap, p_w: jnp.ndarray, cfg: TsdfConfig
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Central-difference SDF gradient over the block map (surface normals)."""
    h = cfg.voxel_size
    grads = []
    valid = None
    for axis in range(3):
        e = jnp.zeros(3, p_w.dtype).at[axis].set(h)
        sp, vp = sample_trilinear(bm, p_w + e, cfg)
        sm, vm = sample_trilinear(bm, p_w - e, cfg)
        grads.append(sp - sm)
        v = vp & vm
        valid = v if valid is None else (valid & v)
    g = jnp.stack(grads, axis=-1)
    norm = jnp.linalg.norm(g, axis=-1, keepdims=True)
    nrm = g / jnp.maximum(norm, 1e-12)
    return nrm, valid & (norm[..., 0] > 1e-12)


def _image_space_normals(p_hit, found, dirs_w):
    """World normals from image-space central differences of hit points.

    Zero gathers — the KinectFusion model-map trick: neighbor hit vertices
    of a smooth surface span its tangent plane.  Orientation: flipped to
    face the camera (against the ray).
    """
    dx = jnp.roll(p_hit, -1, 1) - jnp.roll(p_hit, 1, 1)
    dy = jnp.roll(p_hit, -1, 0) - jnp.roll(p_hit, 1, 0)
    vx = jnp.roll(found, -1, 1) & jnp.roll(found, 1, 1)
    vy = jnp.roll(found, -1, 0) & jnp.roll(found, 1, 0)
    n = jnp.cross(dx, dy)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    flip = jnp.sum(n * dirs_w, axis=-1, keepdims=True) > 0.0
    n = jnp.where(flip, -n, n)
    valid = found & vx & vy & (norm[..., 0] > 1e-12)
    # Wrapped borders are invalid.
    valid = valid.at[0, :].set(False).at[-1, :].set(False)
    valid = valid.at[:, 0].set(False).at[:, -1].set(False)
    return n, valid


def raycast(
    bm: BlockMap,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    tsdf_cfg: TsdfConfig,
    cfg,  # RaycastConfig
    with_color: bool = True,
    depth_prior: jnp.ndarray | None = None,
    screen_space_normals: bool = False,
):
    """Two-speed ray march with empty-space skipping over the directory.

    The dense raycaster marches at a fixed fine step; here each iteration
    first checks the block directory at the current point: unallocated ->
    jump to the next block boundary (DDA), allocated -> fine step +
    trilinear sample + zero-crossing test.  A fixed iteration budget keeps
    shapes static.

    Performance levers for the per-frame tracking prediction (random
    gathers dominate this kernel on TPU — each trilinear sample is 16
    gathers across 307 k rays):

    - ``depth_prior`` (f32[H,W], the depth just fused at this pose): the
      model surface along each valid-depth ray lies within the truncation
      band of the measurement, so the march starts at d - 1.5 trunc and a
      ~7-step budget replaces the ~60-step full-range sweep.  Rays without
      measured depth fall back to the full sweep only when no prior is
      passed; with a prior they simply miss (ICP ignores invalid target
      pixels anyway).  Offline rendering passes None for full coverage.
    - ``screen_space_normals``: derive normals from image-space central
      differences of the hit-vertex map (zero gathers) instead of six
      trilinear SDF-gradient samples (~100 gathers/ray).

    Returns the same RaycastMaps as the dense version (the engine is
    agnostic to the map kind).
    """
    from instancefusion_tpu.ops.raycast import RaycastMaps

    rays_c = ray_directions(intr)
    ray_norm = jnp.linalg.norm(rays_c, axis=-1)
    R = T_wc[:3, :3]
    origin_w = T_wc[:3, 3]
    dirs_w = (rays_c.reshape(-1, 3) @ R.T).reshape(rays_c.shape)
    dirs_w = dirs_w / jnp.maximum(ray_norm[..., None], 1e-12)

    fine = cfg.step_scale * tsdf_cfg.trunc
    bsz = tsdf_cfg.block_size * tsdf_cfg.voxel_size
    map_origin = jnp.asarray(tsdf_cfg.origin, jnp.float32)
    # Budget: enough fine steps to cross the in-band distance plus skips
    # across the whole range. Worst case all-fine is bounded by max_steps.
    max_steps = int((cfg.far - cfg.near) / fine) + 1

    h, w = intr.height, intr.width
    shape = (h, w)

    band = 1.5 * tsdf_cfg.trunc
    if depth_prior is not None:
        has_prior = depth_prior > 0.0
        t_start = jnp.where(
            has_prior,
            jnp.maximum((depth_prior - band) * ray_norm, cfg.near),
            jnp.full(shape, cfg.far),  # no-prior rays: skip (miss)
        )
        t_end = jnp.where(
            has_prior, (depth_prior + band) * ray_norm, jnp.full(shape, cfg.far)
        )
        max_steps = int(2.0 * band / fine) + 3
    else:
        t_start = jnp.full(shape, cfg.near)
        t_end = jnp.full(shape, cfg.far)

    def point_at(t):
        return origin_w + t[..., None] * dirs_w

    def boundary_step(p):
        """Distance along the ray to the next block boundary (DDA skip).

        Skipping a fixed fraction of a block can overshoot past a surface
        whose approach side is unallocated (e.g. the far side of a slab
        seam in the sharded map): the march must always land at an
        occupied block's entry face, never inside it.
        """
        g = (p - map_origin) / bsz
        step_dir = jnp.where(dirs_w >= 0.0, 1.0, 0.0)
        nxt = (jnp.floor(g) + step_dir) * bsz + map_origin
        safe_dir = jnp.where(jnp.abs(dirs_w) > 1e-9, dirs_w, 1e-9)
        dt_axis = (nxt - p) / safe_dir
        dt_axis = jnp.where(jnp.abs(dirs_w) > 1e-9, dt_axis, jnp.inf)
        t_bound = jnp.min(jnp.maximum(dt_axis, 0.0), axis=-1)
        # Epsilon past the boundary; floor guarantees progress on-edge.
        return jnp.maximum(t_bound + 0.05 * tsdf_cfg.voxel_size,
                           0.1 * tsdf_cfg.voxel_size)

    def body(_, carry):
        t, prev_sdf, prev_valid, t_lo, t_hi, s_lo, s_hi, found = carry
        p = point_at(t)
        occ = occupancy_at(bm, p, tsdf_cfg)
        do_fine = occ & jnp.logical_not(found)
        s, v = sample_trilinear(bm, p, tsdf_cfg)
        crossing = prev_valid & v & (prev_sdf > 0.0) & (s <= 0.0) & do_fine
        t_lo = jnp.where(crossing, t - fine, t_lo)
        t_hi = jnp.where(crossing, t, t_hi)
        s_lo = jnp.where(crossing, prev_sdf, s_lo)
        s_hi = jnp.where(crossing, s, s_hi)
        found = found | crossing
        dt = jnp.where(found, 0.0, jnp.where(occ, fine, boundary_step(p)))
        t_next = jnp.minimum(t + dt, t_end)
        return t_next, s, v & occ, t_lo, t_hi, s_lo, s_hi, found

    init = (
        t_start,
        jnp.zeros(shape),
        jnp.zeros(shape, bool),
        jnp.zeros(shape),
        jnp.zeros(shape),
        jnp.zeros(shape),
        jnp.zeros(shape),
        jnp.zeros(shape, bool),
    )
    _, _, _, t_lo, t_hi, s_lo, s_hi, found = jax.lax.fori_loop(
        0, max_steps, body, init
    )

    denom = jnp.maximum(s_lo - s_hi, 1e-12)
    t_star = t_lo + (t_hi - t_lo) * s_lo / denom

    def refine(_, t_cur):
        s, v = sample_trilinear(bm, point_at(t_cur), tsdf_cfg)
        t_next = t_cur + jnp.where(v, s * tsdf_cfg.trunc, 0.0)
        return jnp.clip(t_next, t_lo, t_hi)

    t_star = jax.lax.fori_loop(0, cfg.refine_steps, refine, t_star)

    p_hit = point_at(t_star)
    if screen_space_normals:
        normal_w, nvalid = _image_space_normals(p_hit, found, dirs_w)
    else:
        normal_w, nvalid = sdf_gradient(bm, p_hit, tsdf_cfg)
    valid = found & nvalid
    depth = jnp.where(valid, t_star / ray_norm, 0.0)
    if with_color and bm.color.size:
        color = sample_color_trilinear(bm, p_hit, tsdf_cfg)
    else:
        color = jnp.zeros((h, w, 3), jnp.float32)
    zero3 = jnp.zeros_like(p_hit)
    return RaycastMaps(
        vertex_w=jnp.where(valid[..., None], p_hit, zero3),
        normal_w=jnp.where(valid[..., None], normal_w, zero3),
        depth=depth,
        color=jnp.where(valid[..., None], color, 0.0),
        valid=valid,
    )


def raycast_splat(
    bm: BlockMap,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    tsdf_cfg: TsdfConfig,
    slots: jnp.ndarray,
    slot_valid: jnp.ndarray,
    with_color: bool = True,
    interpret: bool = False,
    depth_prior: jnp.ndarray | None = None,
    rmax: int = 8,
):
    """Predicted maps by MXU splatting of the listed blocks (zero gathers).

    TPU fast path for the per-frame tracking prediction: rasterizes the
    touched blocks into composited depth/color images via the Pallas
    kernel in `ops/pallas/raycast.py` (the TPU analog of the reference's
    surfel splat pipeline), then finishes vertex/normal maps with dense
    image math.  Same RaycastMaps contract as `raycast`; `raycast`
    remains the golden reference and the offline/full-coverage renderer.

    `interpret=True` (CPU) runs the jnp golden instead of Pallas
    interpret mode, which is far too slow for per-frame use.
    """
    from instancefusion_tpu.ops.pallas.raycast import splat_depth, splat_depth_ref
    from instancefusion_tpu.ops.raycast import RaycastMaps

    impl = splat_depth_ref if interpret else splat_depth
    imgs = impl(
        slots,
        slot_valid,
        bm.block_coords,
        bm.sdf,
        bm.weight,
        bm.color,
        T_wc,
        intr,
        tsdf_cfg,
        with_color=with_color and bool(bm.color.size),
        depth_prior=depth_prior,
        rmax=rmax,
    )
    rays_c = ray_directions(intr)  # unit-z
    R = T_wc[:3, :3]
    origin_w = T_wc[:3, 3]
    dirs_z = (rays_c.reshape(-1, 3) @ R.T).reshape(rays_c.shape)
    p_hit = origin_w + imgs.depth[..., None] * dirs_z  # z-depth x unit-z dir
    dirs_unit = dirs_z / jnp.maximum(
        jnp.linalg.norm(dirs_z, axis=-1, keepdims=True), 1e-12
    )
    normal_w, nvalid = _image_space_normals(p_hit, imgs.valid, dirs_unit)
    valid = imgs.valid & nvalid
    zero3 = jnp.zeros_like(p_hit)
    return RaycastMaps(
        vertex_w=jnp.where(valid[..., None], p_hit, zero3),
        normal_w=jnp.where(valid[..., None], normal_w, zero3),
        depth=jnp.where(valid, imgs.depth, 0.0),
        color=jnp.where(valid[..., None], imgs.color, 0.0),
        valid=valid,
    )


def partition_window(
    bm: BlockMap,
    cfg: TsdfConfig,
    center_w: jnp.ndarray,  # (3,) world-space active-window center (camera)
    radius: float,
    evict_cap: int,
    votes=None,
    stamp: jnp.ndarray | None = None,  # i32[C] per-slot last-fused stamps
):
    """Split live blocks into an active window (kept) and cold rows (evicted).

    The streaming half of the "map is the long axis" design (SURVEY.md §6
    long-context): blocks whose center is farther than `radius` from the
    camera are compacted into a bounded eviction buffer the host pulls to
    DRAM (engine/streaming.py); the surviving rows are stable-partition
    compacted exactly like `clean`, so capacity is reclaimed.  At most
    `evict_cap` blocks move per call — the rest stay live and are picked
    up by the next streaming tick (bounded device->host transfer per
    call, never a full-table pull).

    Returns (bm_new, votes_new, evicted) with evicted a dict of
    coords i32[E,3], sdf/weight/color payload rows, valid bool[E], and
    (when votes is given) label/count rows.
    """
    c = bm.sdf.shape[0]
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)[:, 0]
    allocated = (slot_ids < bm.n_active) & (bm.block_coords[:, 0] >= 0)
    bsz = cfg.block_size * cfg.voxel_size
    origin = jnp.asarray(cfg.origin, jnp.float32)
    centers = origin + (bm.block_coords.astype(jnp.float32) + 0.5) * bsz
    dist = jnp.linalg.norm(centers - center_w[None, :], axis=-1)
    cold = allocated & (dist > radius)

    eidx, evalid = compact_mask_indices(cold, evict_cap)
    eidx_c = jnp.where(evalid, eidx, 0)
    evicted = {
        "coords": jnp.where(evalid[:, None], bm.block_coords[eidx_c], -1),
        "sdf": bm.sdf[eidx_c],
        "weight": jnp.where(evalid[:, None], bm.weight[eidx_c], 0.0),
        "valid": evalid,
    }
    if bm.color.size:
        evicted["color"] = bm.color[eidx_c]
    if votes is not None:
        evicted["label"] = votes.label[eidx_c]
        evicted["count"] = votes.count[eidx_c]

    evict_sel = jnp.zeros((c,), bool).at[jnp.where(evalid, eidx, c)].set(
        True, mode="drop"
    )
    live = allocated & jnp.logical_not(evict_sel)
    n_live = jnp.sum(live.astype(jnp.int32))
    perm = jnp.argsort(jnp.logical_not(live), stable=True)
    order = jnp.cumsum(live.astype(jnp.int32)) - 1

    def take(arr, fill):
        out = arr[perm]
        keep = jax.lax.broadcasted_iota(jnp.int32, (out.shape[0], 1), 0)[:, 0] < n_live
        shape = (out.shape[0],) + (1,) * (out.ndim - 1)
        return jnp.where(keep.reshape(shape), out, fill)

    dir_flat = bm.directory.reshape(-1)
    has = dir_flat >= 0
    src = jnp.clip(dir_flat, 0, c - 1)
    dir_new = jnp.where(has & live[src], order[src], -1).astype(jnp.int32)

    bm_new = BlockMap(
        directory=dir_new.reshape(bm.directory.shape),
        block_coords=take(bm.block_coords, -1),
        n_active=n_live,
        overflow=bm.overflow,
        sdf=take(bm.sdf, UNOBSERVED),
        weight=take(bm.weight, 0.0),
        color=take(bm.color, 0.0) if bm.color.size else bm.color,
    )
    votes_new = None
    if votes is not None:
        votes_new = type(votes)(
            label=take(votes.label, -1),
            count=take(votes.count, 0.0),
        )
    if stamp is not None:
        evicted["stamp"] = jnp.where(evalid[:, None], stamp[eidx_c], 0)
        return bm_new, votes_new, evicted, take(stamp, 0)
    return bm_new, votes_new, evicted


def admit_rows(
    bm: BlockMap,
    cfg: TsdfConfig,
    coords: jnp.ndarray,  # i32[E,3] block coords to re-insert
    sdf: jnp.ndarray,  # f32[E,B^3]
    weight: jnp.ndarray,
    color: jnp.ndarray | None,
    valid: jnp.ndarray,  # bool[E]
    votes=None,
    label: jnp.ndarray | None = None,
    count: jnp.ndarray | None = None,
    stamp: jnp.ndarray | None = None,  # i32[C] per-slot last-fused stamps
    row_stamp: jnp.ndarray | None = None,  # i32[E] stamps of admitted rows
):
    """Re-insert streamed-out payload rows (prefix-sum slot assignment).

    The admission half of block streaming: rows come back from host DRAM
    exactly as evicted.  Blocks already allocated on device are skipped
    (the live copy wins — it has integrated frames the stored copy
    predates... which cannot happen under the streamer's invariant that a
    stored block is removed from the device, but guard anyway); blocks
    beyond capacity are dropped and counted in overflow.

    Returns (bm_new, votes_new, admitted_mask bool[E]).
    """
    nb = num_blocks_per_axis(cfg)
    c = bm.sdf.shape[0]
    inb = valid & jnp.all((coords >= 0) & (coords < nb), axis=-1)
    flat = (coords[:, 0] * nb + coords[:, 1]) * nb + coords[:, 2]
    flat_c = jnp.where(inb, flat, 0)
    already = bm.directory.reshape(-1)[flat_c] >= 0
    need = inb & jnp.logical_not(already)
    order = jnp.cumsum(need.astype(jnp.int32)) - 1
    new_slot = bm.n_active + order
    fits = need & (new_slot < c - RESERVED_SLOTS)
    n_new = jnp.sum(fits.astype(jnp.int32))
    n_drop = jnp.sum(need.astype(jnp.int32)) - n_new

    dir_ids = jnp.where(fits, flat, nb * nb * nb)
    dir_new = bm.directory.reshape(-1).at[dir_ids].set(new_slot, mode="drop")
    out = jnp.where(fits, new_slot, c)
    bm_new = bm._replace(
        directory=dir_new.reshape(bm.directory.shape),
        block_coords=bm.block_coords.at[out].set(coords, mode="drop"),
        n_active=bm.n_active + n_new,
        overflow=bm.overflow + n_drop,
        sdf=bm.sdf.at[out].set(sdf, mode="drop"),
        weight=bm.weight.at[out].set(weight, mode="drop"),
    )
    if color is not None and bm.color.size:
        bm_new = bm_new._replace(color=bm.color.at[out].set(color, mode="drop"))
    votes_new = votes
    if votes is not None and label is not None:
        votes_new = type(votes)(
            label=votes.label.at[out].set(label, mode="drop"),
            count=votes.count.at[out].set(count, mode="drop"),
        )
    if stamp is not None:
        rs = row_stamp if row_stamp is not None else jnp.zeros(
            (coords.shape[0],), jnp.int32
        )
        return bm_new, votes_new, fits, stamp.at[out].set(rs, mode="drop")
    return bm_new, votes_new, fits


def raycast_splat_groups(
    bm: BlockMap,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    tsdf_cfg: TsdfConfig,
    gids: jnp.ndarray,
    row_valid: jnp.ndarray,
    with_color: bool = True,
    interpret: bool = False,
    depth_prior: jnp.ndarray | None = None,
    rmax: int = 8,
):
    """`raycast_splat` addressed by payload row groups (zero row gathers).

    TPU fast path paired with `integrate_groups`; the CPU/golden fallback
    flattens to a slot list and reuses the scatter-add golden.
    """
    from instancefusion_tpu.ops.raycast import RaycastMaps

    if interpret:
        slots = (
            gids[:, None] * 8 + jnp.arange(8, dtype=jnp.int32)[None, :]
        ).reshape(-1)
        return raycast_splat(
            bm, T_wc, intr, tsdf_cfg, slots, row_valid.reshape(-1),
            with_color=with_color, interpret=True,
            depth_prior=depth_prior, rmax=rmax,
        )
    from instancefusion_tpu.ops.pallas.raycast import splat_depth_groups

    imgs = splat_depth_groups(
        gids, row_valid, bm.block_coords, bm.sdf, bm.weight, bm.color,
        T_wc, intr, tsdf_cfg,
        with_color=with_color and bool(bm.color.size),
        depth_prior=depth_prior, rmax=rmax,
    )
    rays_c = ray_directions(intr)  # unit-z
    R = T_wc[:3, :3]
    origin_w = T_wc[:3, 3]
    dirs_z = (rays_c.reshape(-1, 3) @ R.T).reshape(rays_c.shape)
    p_hit = origin_w + imgs.depth[..., None] * dirs_z
    dirs_unit = dirs_z / jnp.maximum(
        jnp.linalg.norm(dirs_z, axis=-1, keepdims=True), 1e-12
    )
    normal_w, nvalid = _image_space_normals(p_hit, imgs.valid, dirs_unit)
    valid = imgs.valid & nvalid
    zero3 = jnp.zeros_like(p_hit)
    return RaycastMaps(
        vertex_w=jnp.where(valid[..., None], p_hit, zero3),
        normal_w=jnp.where(valid[..., None], normal_w, zero3),
        depth=jnp.where(valid, imgs.depth, 0.0),
        color=jnp.where(valid[..., None], imgs.color, 0.0),
        valid=valid,
    )


def clean(
    bm: BlockMap,
    cfg: TsdfConfig,
    min_weight: float = 1.0,
    votes=None,
    stamp: jnp.ndarray | None = None,  # i32[C] per-slot last-fused stamps
):
    """Cull low-confidence blocks and compact the slot space.

    The reference's `GlobalModel::clean` drops surfels below a confidence
    threshold (SURVEY.md §4.2); the block-map analog removes blocks whose
    best voxel weight never reached `min_weight` (one-off noise / depth
    speckle) and compacts surviving payload rows to the front so capacity
    is reclaimed — allocation stays a monotonic prefix-sum counter.

    Returns (bm, votes) with `votes` compacted consistently when given
    (instance label planes ride the same slot space).

    Also reclaims *empty* blocks: space carving (frustum free-space
    updates) drives fully-carved blocks to sdf ~ +1 at high weight — no
    surface will ever be found there, but weight-based culling alone
    would keep them forever and the frustum carve list would keep
    growing.  A block with no voxel below `empty_sdf` holds no surface
    (nor a truncation approach band) and is dropped.
    """
    c = bm.sdf.shape[0]
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, (c, 1), 0)[:, 0]
    allocated = slot_ids < bm.n_active
    best_w = jnp.max(bm.weight, axis=1)
    observed = jnp.where(bm.weight > 0.0, bm.sdf, UNOBSERVED)
    min_sdf = jnp.min(observed, axis=1)
    empty = min_sdf > 0.98
    live = allocated & (best_w >= min_weight) & jnp.logical_not(empty)
    n_live = jnp.sum(live.astype(jnp.int32))

    # Stable partition: live rows first, original order preserved.
    perm = jnp.argsort(jnp.logical_not(live), stable=True)
    order = jnp.cumsum(live.astype(jnp.int32)) - 1  # old slot -> new slot

    def take(arr, fill):
        out = arr[perm]
        keep = jax.lax.broadcasted_iota(jnp.int32, (out.shape[0], 1), 0)[:, 0] < n_live
        shape = (out.shape[0],) + (1,) * (out.ndim - 1)
        return jnp.where(keep.reshape(shape), out, fill)

    dir_flat = bm.directory.reshape(-1)
    has = dir_flat >= 0
    src = jnp.clip(dir_flat, 0, c - 1)
    dir_new = jnp.where(has & live[src], order[src], -1).astype(jnp.int32)

    bm_new = BlockMap(
        directory=dir_new.reshape(bm.directory.shape),
        block_coords=take(bm.block_coords, -1),
        n_active=n_live,
        overflow=bm.overflow,
        sdf=take(bm.sdf, UNOBSERVED),
        weight=take(bm.weight, 0.0),
        color=take(bm.color, 0.0) if bm.color.size else bm.color,
    )
    votes_new = None
    if votes is not None:
        votes_new = type(votes)(
            label=take(votes.label, -1),
            count=take(votes.count, 0.0),
        )
    if stamp is not None:
        return bm_new, votes_new, take(stamp, 0)
    return bm_new, votes_new
