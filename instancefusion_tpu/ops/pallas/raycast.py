"""Pallas splat-raycast: predicted maps as MXU rasterization, zero gathers.

Replaces the per-pixel ray march for the per-frame tracking prediction.
The marched raycast (`ops/blocks.raycast`) needs ~100-200 random per-lane
gathers per ray; XLA gathers on TPU run at ~10^8/s, which made prediction
the dominant per-frame cost (~900 ms at 512^3).  This kernel inverts the
loop — it *splats* the touched blocks' voxels into the image, the way the
reference renders its model by splatting surfels through the GL pipeline
(`IndexMap::combinedPredict`, SURVEY.md §4.4) — but maps the scatter onto
the MXU instead of a rasterizer:

- For the projective TSDF, ``depth(pixel) ~= z_voxel + sdf * trunc`` for
  every near-surface voxel projecting to that pixel, so each voxel casts
  a *vote* for the surface depth, weighted by ``relu(1-|sdf|)^2`` (the
  out-of-band/unobserved sentinel sdf=2 self-masks to weight 0).
- A voxel's vote lands on the image through a separable tent footprint:
  ``out[p,q] = sum_i tent(p - v_i) * val_i * tent(q - u_i)`` — two
  factored one-hot-like matmuls ``[6*TH, 512] @ [512, TW]`` per block.
  Scatter *is* matmul; the MXU does the rasterization.
- Occlusion (two surfaces voting on one ray) resolves by softmin
  compositing: votes carry ``exp(-lam * depth)`` so nearer surfaces
  dominate; num/den ratios cancel the scale exactly.
- Depth is encoded relative to the block center for the bf16 matmul
  (|d_rel| <= ~0.25 m keeps the vote quantization under ~1 mm); the
  absolute part is re-added in f32 via the vote-mass channel.
- The grid walks blocks sequentially (TPU Pallas grids are sequential on
  a core), accumulating into full-image VMEM buffers through dynamically
  sliced windows — v0 aligned to sublanes (8), u0 to lanes (128).

Per 512^3 frame (~500-2000 touched blocks) this is ~0.1-0.4 TFLOP of
bf16 matmul and zero random gathers, vs ~60M serialized gathers for the
march.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from instancefusion_tpu.config import RaycastConfig, TsdfConfig
from instancefusion_tpu.geometry.camera import Intrinsics
from instancefusion_tpu.geometry.se3 import se3_inverse

# Softmin sharpness (1/m) and reference depth (m) for the compositing
# exponent; exp(lam * (zref - d)) stays inside f32/bf16 exponent range
# for d in [0.1, 6] m.
_LAM = 20.0
_ZREF = 2.0
# Vote-mass threshold for a pixel to be a valid surface hit.
_DEN_TAU = 0.05
# Payload rows processed per grid step (Mosaic block sublane minimum).
GROUP_ROWS = 8


def _splat_kernel(
    # scalar prefetch
    meta_i_ref,  # i32[K, 8]: u0, v0, bcx, bcy, bcz (u0 = -1 -> skip)
    meta_f_ref,  # f32[K, 4]: z_c (block-center cam z), tent radius (px)
    cam_ref,  # f32[1, 24]: T_cw rows (12), fx fy cx cy, voxel, trunc, ox oy oz
    # tensor inputs: GROUP (=8) gathered payload rows per grid step
    sdf_ref,  # f32[G, 512]
    wgt_ref,  # f32[G, 512] fusion weights (vote confidence)
    col_ref,  # f32[G, 1536] packed color rows [r | g | b] (512 lanes each)
    # outputs (full image, resident in VMEM across the grid)
    num_ref,  # f32[H, W] sum s*w*t*d
    dens_ref,  # f32[H, W] sum s*w*t (softmin-scaled vote mass)
    denr_ref,  # f32[H, W] sum w*t (raw vote mass -> validity)
    outr_ref,
    outg_ref,
    outb_ref,  # f32[H, W] sum s*w*t*c
    *,
    th: int,
    tw: int,
    with_color: bool,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        num_ref[:] = jnp.zeros_like(num_ref)
        dens_ref[:] = jnp.zeros_like(dens_ref)
        denr_ref[:] = jnp.zeros_like(denr_ref)
        if with_color:
            outr_ref[:] = jnp.zeros_like(outr_ref)
            outg_ref[:] = jnp.zeros_like(outg_ref)
            outb_ref[:] = jnp.zeros_like(outb_ref)

    r00, r01, r02, t0 = cam_ref[0], cam_ref[1], cam_ref[2], cam_ref[3]
    r10, r11, r12, t1 = cam_ref[4], cam_ref[5], cam_ref[6], cam_ref[7]
    r20, r21, r22, t2 = cam_ref[8], cam_ref[9], cam_ref[10], cam_ref[11]
    fx, fy, cx, cy = cam_ref[12], cam_ref[13], cam_ref[14], cam_ref[15]
    voxel, trunc = cam_ref[16], cam_ref[17]
    ox, oy, oz = cam_ref[18], cam_ref[19], cam_ref[20]

    # (Mosaic requires >= 8 sublanes per block, so each grid step carries
    # a group of GROUP_ROWS gathered payload rows — unrolled below.)
    for g in range(GROUP_ROWS):
        k = i * GROUP_ROWS + g
        u0 = meta_i_ref[k * 8 + 0]

        @pl.when(u0 >= 0)
        def _splat(g=g, k=k, u0=u0):
            v0 = meta_i_ref[k * 8 + 1]
            bcx = meta_i_ref[k * 8 + 2].astype(jnp.float32)
            bcy = meta_i_ref[k * 8 + 3].astype(jnp.float32)
            bcz = meta_i_ref[k * 8 + 4].astype(jnp.float32)
            z_c = meta_f_ref[k * 4 + 0]
            inv_r = 1.0 / meta_f_ref[k * 4 + 1]

            # Voxel world positions: block row-major (x-major), (1, 512).
            idx = jax.lax.broadcasted_iota(jnp.int32, (1, 512), 1)
            lx = (idx // 64).astype(jnp.float32)
            ly = ((idx // 8) % 8).astype(jnp.float32)
            lz = (idx % 8).astype(jnp.float32)
            px = ox + (bcx * 8.0 + lx + 0.5) * voxel
            py = oy + (bcy * 8.0 + ly + 0.5) * voxel
            pz = oz + (bcz * 8.0 + lz + 0.5) * voxel

            xc = r00 * px + r01 * py + r02 * pz + t0
            yc = r10 * px + r11 * py + r12 * pz + t1
            zc = r20 * px + r21 * py + r22 * pz + t2
            vis = zc > 0.05
            zs = jnp.where(vis, zc, 1.0)
            u = fx * xc / zs + cx
            v = fy * yc / zs + cy

            s = sdf_ref[g : g + 1, :]  # (1, 512)
            w = jnp.maximum(1.0 - jnp.abs(s), 0.0)
            # Confidence scaling, as the reference splats confidence-
            # weighted surfels: barely-observed voxels (projective-TSDF
            # fins behind depth edges, single grazing views) vote weakly.
            conf = jnp.minimum(wgt_ref[g : g + 1, :] * 0.25, 1.0)
            w = w * w * conf * jnp.where(vis, 1.0, 0.0)
            # Clamp before exp: behind-camera voxels (w = 0) must still
            # produce finite sm or 0 * inf = NaN poisons the matmul.
            d_abs = jnp.clip(zc + s * trunc, 0.05, 8.0)
            sm = jnp.exp(_LAM * (_ZREF - d_abs))
            wsm = w * sm
            d_rel = d_abs - z_c

            # Separable tent footprints.
            rowpos = (
                jax.lax.broadcasted_iota(jnp.int32, (th, 512), 0)
                .astype(jnp.float32) + v0.astype(jnp.float32)
            )
            tv = jnp.maximum(1.0 - jnp.abs(v - rowpos) * inv_r, 0.0)  # (TH,512)
            colpos = (
                jax.lax.broadcasted_iota(jnp.int32, (tw, 512), 0)
                .astype(jnp.float32) + u0.astype(jnp.float32)
            )
            tu = jnp.maximum(1.0 - jnp.abs(u - colpos) * inv_r, 0.0)  # (TW,512)

            # The d_rel vote channel sets ICP target depth accuracy
            # (single-pass bf16 vote rounding would cost up to ~1 cm in
            # the tails), so it rides as an exact hi/lo bf16 split in the
            # SAME single-pass matmul as the bf16-sufficient channels
            # (vote masses; colors are 8-bit data) — one MXU pass total
            # instead of a 3-pass HIGHEST plus a second matmul.  hi/lo
            # partials are each exact products x tent weights in f32
            # accumulation; reassembly error is ~2^-17 relative (um).
            dvote = tv * (wsm * d_rel)  # (TH, 512)
            dv_hi = dvote.astype(jnp.bfloat16)
            vals = [wsm, w]
            if with_color:
                vals += [
                    wsm * col_ref[g : g + 1, c * 512 : (c + 1) * 512]
                    for c in range(3)
                ]
            lhs = jnp.concatenate(
                [
                    dv_hi.astype(jnp.float32),
                    dvote - dv_hi.astype(jnp.float32),
                ]
                + [tv * val for val in vals],
                axis=0,
            )
            out = jax.lax.dot_general(
                lhs.astype(jnp.bfloat16),
                tu.astype(jnp.bfloat16),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # ((C+2)*TH, TW)
            out_d = out[0:th] + out[th : 2 * th]

            rw = pl.ds(pl.multiple_of(v0, 8), th)
            cw = pl.ds(pl.multiple_of(u0, 128), tw)
            # d = d_rel-votes + z_c * vote-mass, exact in f32.
            num_ref[rw, cw] += out_d + z_c * out[2 * th : 3 * th]
            dens_ref[rw, cw] += out[2 * th : 3 * th]
            denr_ref[rw, cw] += out[3 * th : 4 * th]
            if with_color:
                outr_ref[rw, cw] += out[4 * th : 5 * th]
                outg_ref[rw, cw] += out[5 * th : 6 * th]
                outb_ref[rw, cw] += out[6 * th : 7 * th]


class SplatImages(NamedTuple):
    depth: jnp.ndarray  # f32[H, W] composited z-depth (0 where invalid)
    valid: jnp.ndarray  # bool[H, W]
    color: jnp.ndarray  # f32[H, W, 3]


def block_windows(
    slots: jnp.ndarray,
    slot_valid: jnp.ndarray,
    block_coords: jnp.ndarray,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    tsdf_cfg: TsdfConfig,
    *,
    th: int,
    tw: int,
    hp: int,
    wp: int,
    rmax: int,
):
    """Per-block image windows + scalar-prefetch metadata.

    Shared by the splat raycaster and the fused integrate kernel: for each
    listed block, project its 8 corners, derive a tile-aligned window
    origin (v0 multiple of 8 sublanes, u0 multiple of 128 lanes) that is
    guaranteed to contain every on-screen voxel projection (in-image
    bboxes <= 129 px always fit; border-straddlers lose only their
    off-screen part), and pack (slots, meta_i, meta_f, cam) for
    PrefetchScalarGridSpec.  meta_i[:, 0] (u0) is -1 for blocks to skip.
    """
    k = slots.shape[0]
    b = tsdf_cfg.block_size
    T_cw = se3_inverse(T_wc)
    R = T_cw[:3, :3]
    t = T_cw[:3, 3]

    coords = block_coords[jnp.where(slot_valid, slots, 0)]  # (K, 3)
    bsz = b * tsdf_cfg.voxel_size
    origin = jnp.asarray(tsdf_cfg.origin, jnp.float32)

    corner = jnp.stack(
        [jnp.array([i // 4, (i // 2) % 2, i % 2], jnp.float32) for i in range(8)]
    )  # (8, 3)
    p_w = origin + (coords[:, None, :].astype(jnp.float32) + corner[None]) * bsz
    p_c = p_w @ R.T + t  # (K, 8, 3)
    z = p_c[..., 2]
    z_min = jnp.min(z, axis=1)
    zs = jnp.maximum(z, 1e-3)
    u = intr.fx * p_c[..., 0] / zs + intr.cx
    v = intr.fy * p_c[..., 1] / zs + intr.cy

    z_cen = jnp.mean(z, axis=1)
    r_tent = jnp.clip(
        0.7 * intr.fx * tsdf_cfg.voxel_size / jnp.maximum(z_cen, 0.3),
        1.0,
        float(rmax),
    )
    umin = jnp.min(u, axis=1) - r_tent
    umax = jnp.max(u, axis=1) + r_tent
    vmin = jnp.min(v, axis=1) - r_tent
    vmax = jnp.max(v, axis=1) + r_tent

    u0 = jnp.clip(
        (jnp.floor(umin).astype(jnp.int32) // 128) * 128, 0, max(wp - tw, 0)
    )
    v0 = jnp.clip(
        (jnp.floor(vmin).astype(jnp.int32) // 8) * 8, 0, max(hp - th, 0)
    )
    on_screen = (
        (umax > 0) & (umin < intr.width) & (vmax > 0) & (vmin < intr.height)
    )
    # Skip only blocks straddling the camera plane (their projected bbox
    # is meaningless); blocks merely close to it still get valid windows —
    # per-voxel visibility masks inside the kernels do the rest, matching
    # the jnp golden's per-voxel semantics.
    keep = slot_valid & (z_min > 1e-3) & on_screen
    u0 = jnp.where(keep, u0, -1)

    meta_i = jnp.zeros((k, 8), jnp.int32)
    meta_i = meta_i.at[:, 0].set(u0)
    meta_i = meta_i.at[:, 1].set(v0)
    meta_i = meta_i.at[:, 2:5].set(coords)
    meta_f = jnp.zeros((k, 4), jnp.float32)
    meta_f = meta_f.at[:, 0].set(z_cen)
    meta_f = meta_f.at[:, 1].set(r_tent)

    cam = jnp.zeros((1, 24), jnp.float32)
    cam = cam.at[0, 0:3].set(R[0]).at[0, 3].set(t[0])
    cam = cam.at[0, 4:7].set(R[1]).at[0, 7].set(t[1])
    cam = cam.at[0, 8:11].set(R[2]).at[0, 11].set(t[2])
    cam = cam.at[0, 12:16].set(
        jnp.array([intr.fx, intr.fy, intr.cx, intr.cy], jnp.float32)
    )
    cam = cam.at[0, 16].set(tsdf_cfg.voxel_size)
    cam = cam.at[0, 17].set(tsdf_cfg.trunc)
    cam = cam.at[0, 18:21].set(origin)
    cam = cam.at[0, 21].set(float(intr.width))
    cam = cam.at[0, 22].set(float(intr.height))
    cam = cam.at[0, 23].set(tsdf_cfg.max_weight)

    safe_slots = jnp.where(slot_valid, slots, 0).astype(jnp.int32)
    return safe_slots, meta_i, meta_f, cam


def _splat_groups_kernel(gids_ref, *rest, **kw):
    # Same body as the slot-list splat kernel; gids_ref only drives the
    # payload BlockSpec index maps.
    del gids_ref
    _splat_kernel(*rest, **kw)


@functools.partial(
    jax.jit,
    static_argnames=(
        "intr", "tsdf_cfg", "with_color", "interpret", "rmax", "th", "raw",
    ),
)
def splat_depth_groups(
    gids: jnp.ndarray,  # i32[KG] payload row groups to render
    row_valid: jnp.ndarray,  # bool[KG, 8]
    block_coords: jnp.ndarray,
    sdf: jnp.ndarray,
    weight: jnp.ndarray,
    color: jnp.ndarray,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    tsdf_cfg: TsdfConfig,
    with_color: bool = True,
    interpret: bool = False,
    depth_prior: jnp.ndarray | None = None,
    rmax: int = 8,
    th: int | None = None,
    raw: bool = False,
):
    """`splat_depth` addressed by payload row groups — zero row gathers.

    The slot-list variant gathers K payload rows (5 planes) before the
    kernel; those XLA gathers cost ~1 ms per plane per frame on this
    hardware.  Here the kernel streams each (8, 512) group straight from
    the payload planes via data-dependent BlockSpec index maps (group id
    from scalar prefetch).  Pad entries target the reserved last group
    (blocks.RESERVED_SLOTS): its rows are never allocated, and sdf
    sentinel/weight-0 votes self-mask to zero.
    """
    h, w = intr.height, intr.width
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    # th override: the footprint-binned fast path runs a th=64 variant
    # over groups whose projected windows fit 64 rows (the common case at
    # 512^3/VGA — median footprint ~42 px), halving the gather/splat
    # matmul area for them; the th=128 variant covers the rest.
    th = min(128, hp) if th is None else min(th, hp)
    tw = min(256, wp)
    b = tsdf_cfg.block_size
    assert b == 8, "splat kernel assumes 8^3 blocks"
    kg = gids.shape[0]

    slots = (gids[:, None] * 8 + jnp.arange(8, dtype=jnp.int32)[None, :]).reshape(-1)
    _, meta_i, meta_f, cam = block_windows(
        slots, row_valid.reshape(-1), block_coords, T_wc, intr, tsdf_cfg,
        th=th, tw=tw, hp=hp, wp=wp, rmax=rmax,
    )

    if color.size == 0 or not with_color:
        col_in = jnp.zeros((8, 3 * 512), jnp.float32)
        col_spec = pl.BlockSpec((8, 3 * 512), lambda i, g, mi, mf, c: (0, 0))
        with_color = False
    else:
        col_in = color  # (C, 1536) packed
        col_spec = pl.BlockSpec((8, 3 * 512), lambda i, g, mi, mf, c: (g[i], 0))

    grp_spec = pl.BlockSpec((8, 512), lambda i, g, mi, mf, c: (g[i], 0))
    img_spec = pl.BlockSpec((hp, wp), lambda i, g, mi, mf, c: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(kg,),
        in_specs=[grp_spec, grp_spec, col_spec],
        out_specs=[img_spec] * 6,
    )
    outs = pl.pallas_call(
        functools.partial(_splat_groups_kernel, th=th, tw=tw, with_color=with_color),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * 6,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(gids, meta_i.reshape(-1), meta_f.reshape(-1), cam.reshape(-1),
       sdf, weight, col_in)
    if raw:
        # Raw scatter-add accumulators: splitting the group set across
        # calls and SUMMING these planes is exact (finish_splat_images).
        return outs
    return finish_splat_images(
        outs, intr, tsdf_cfg, with_color=with_color, depth_prior=depth_prior
    )


def finish_splat_images(
    outs,  # 6 accumulator planes [HP, WP] (num, dens, denr, r, g, b)
    intr: Intrinsics,
    tsdf_cfg: TsdfConfig,
    with_color: bool = True,
    depth_prior: jnp.ndarray | None = None,
) -> SplatImages:
    """Normalize summed splat accumulators into composited images."""
    h, w = intr.height, intr.width
    num, dens, denr, outr, outg, outb = (o[:h, :w] for o in outs)

    valid = (denr > _DEN_TAU) & (dens > 1e-30)
    dsafe = jnp.maximum(dens, 1e-30)
    depth = jnp.where(valid, num / dsafe, 0.0)
    valid = valid & (depth > 0.05)
    if depth_prior is not None:
        band = 1.5 * tsdf_cfg.trunc
        valid = valid & (depth_prior > 0.0) & (
            jnp.abs(depth - depth_prior) <= band
        )
    depth = jnp.where(valid, depth, 0.0)
    if with_color:
        col = jnp.stack([outr / dsafe, outg / dsafe, outb / dsafe], axis=-1)
        col = jnp.where(valid[..., None], col, 0.0)
    else:
        col = jnp.zeros((h, w, 3), jnp.float32)
    return SplatImages(depth=depth, valid=valid, color=col)


def _vote_terms(
    coords, sdf, weight, color, slot_valid, T_cw, intr, tsdf_cfg, with_color
):
    """Per-voxel vote quantities shared by kernel golden + reference.

    Returns (u, v, w, sm, d_abs, colors) each f32[K, 512] (colors list).
    """
    b = tsdf_cfg.block_size
    k = coords.shape[0]
    idx = jnp.arange(b * b * b, dtype=jnp.int32)
    local = jnp.stack([idx // (b * b), (idx // b) % b, idx % b], -1)  # (512,3)
    origin = jnp.asarray(tsdf_cfg.origin, jnp.float32)
    p_w = (
        origin
        + (coords[:, None, :].astype(jnp.float32) * b
           + local[None].astype(jnp.float32) + 0.5)
        * tsdf_cfg.voxel_size
    )  # (K,512,3)
    R, t = T_cw[:3, :3], T_cw[:3, 3]
    p_c = p_w @ R.T + t
    z = p_c[..., 2]
    vis = z > 0.05
    zs = jnp.where(vis, z, 1.0)
    u = intr.fx * p_c[..., 0] / zs + intr.cx
    v = intr.fy * p_c[..., 1] / zs + intr.cy
    s = sdf
    w = jnp.maximum(1.0 - jnp.abs(s), 0.0)
    conf = jnp.minimum(weight * 0.25, 1.0)
    w = w * w * conf * vis * slot_valid[:, None]
    d_abs = jnp.clip(z + s * tsdf_cfg.trunc, 0.05, 8.0)
    sm = jnp.exp(_LAM * (_ZREF - d_abs))
    # Packed color rows: [r | g | b] channel segments of b^3 lanes each.
    b3 = b * b * b
    cols = (
        [color[:, c * b3 : (c + 1) * b3] for c in range(3)]
        if with_color
        else [jnp.zeros_like(s)] * 3
    )
    return u, v, w, sm, d_abs, cols


def splat_depth_ref(
    slots: jnp.ndarray,
    slot_valid: jnp.ndarray,
    block_coords: jnp.ndarray,
    sdf: jnp.ndarray,
    weight: jnp.ndarray,
    color: jnp.ndarray,
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    tsdf_cfg: TsdfConfig,
    with_color: bool = True,
    depth_prior: jnp.ndarray | None = None,
    rmax: int = 8,
    raw: bool = False,
) -> SplatImages:
    """jnp golden for the splat kernel (scatter-add tent rasterization).

    Bit-identical math to `_splat_kernel` up to the kernel's bf16 matmul
    rounding; also the engine's CPU-path predictor (Pallas interpret mode
    is far too slow to run per frame in tests).  `rmax` must match the
    value given to `splat_depth` — the scatter pass count is (2*rmax+1)^2,
    so CPU configs keep it small.  `raw=True` returns the six accumulator
    planes (num, dens, denr, r, g, b) instead of finished images — the
    sharded engine psums the disjoint shards' planes and normalizes once
    (`finish_splat_images`), exactly like the binned TPU path.
    """
    h, w_img = intr.height, intr.width
    if color.size == 0 or not with_color:
        with_color = False
        color = jnp.zeros((sdf.shape[0], 3 * sdf.shape[1]), jnp.float32)
    rows = jnp.where(slot_valid, slots, 0)
    coords = block_coords[rows]
    T_cw = se3_inverse(T_wc)
    # Same straddle-skip as the kernel (block_windows): blocks crossing
    # the camera plane are dropped whole, so golden == kernel.
    b_ = tsdf_cfg.block_size
    bsz_ = b_ * tsdf_cfg.voxel_size
    org_ = jnp.asarray(tsdf_cfg.origin, jnp.float32)
    corner_ = jnp.stack(
        [jnp.array([i // 4, (i // 2) % 2, i % 2], jnp.float32) for i in range(8)]
    )
    pw_ = org_ + (coords[:, None, :].astype(jnp.float32) + corner_[None]) * bsz_
    zmin_ = jnp.min(pw_ @ T_cw[2, :3] + T_cw[2, 3], axis=1)
    slot_valid = slot_valid & (zmin_ > 1e-3)
    u, v, w, sm, d_abs, cols = _vote_terms(
        coords, sdf[rows], weight[rows], color[rows], slot_valid,
        T_cw, intr, tsdf_cfg, with_color,
    )
    # Per-block tent radius from the block-center depth, as in the kernel.
    b = tsdf_cfg.block_size
    bsz = b * tsdf_cfg.voxel_size
    origin = jnp.asarray(tsdf_cfg.origin, jnp.float32)
    centers = origin + (coords.astype(jnp.float32) + 0.5) * bsz
    pc = centers @ T_cw[:3, :3].T + T_cw[:3, 3]
    r_t = jnp.clip(
        0.7 * intr.fx * tsdf_cfg.voxel_size / jnp.maximum(pc[:, 2], 0.3),
        1.0,
        float(rmax),
    )[:, None]
    inv_r = 1.0 / r_t

    wsm = w * sm
    chans = [wsm * d_abs, wsm, w] + ([wsm * c for c in cols] if with_color else [])
    acc = [jnp.zeros((h, w_img), jnp.float32) for _ in chans]
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)
    for dy in range(-rmax, rmax + 1):
        tv = jnp.maximum(1.0 - jnp.abs(v - (vi + dy).astype(jnp.float32)) * inv_r, 0.0)
        for dx in range(-rmax, rmax + 1):
            tu = jnp.maximum(
                1.0 - jnp.abs(u - (ui + dx).astype(jnp.float32)) * inv_r, 0.0
            )
            t2 = tv * tu
            py = vi + dy
            px = ui + dx
            ok = (py >= 0) & (py < h) & (px >= 0) & (px < w_img) & (t2 > 0.0)
            pys = jnp.where(ok, py, h)  # OOB -> dropped
            pxs = jnp.where(ok, px, 0)
            for ci, ch in enumerate(chans):
                acc[ci] = acc[ci].at[pys, pxs].add(
                    jnp.where(ok, ch * t2, 0.0), mode="drop"
                )
    if raw:
        zeros = jnp.zeros((h, w_img), jnp.float32)
        return tuple(acc[:3]) + (
            tuple(acc[3:6]) if with_color else (zeros, zeros, zeros)
        )
    num, dens, denr = acc[0], acc[1], acc[2]
    valid = (denr > _DEN_TAU) & (dens > 1e-30)
    dsafe = jnp.maximum(dens, 1e-30)
    depth = jnp.where(valid, num / dsafe, 0.0)
    valid = valid & (depth > 0.05)
    if depth_prior is not None:
        band = 1.5 * tsdf_cfg.trunc
        valid = valid & (depth_prior > 0.0) & (
            jnp.abs(depth - depth_prior) <= band
        )
    depth = jnp.where(valid, depth, 0.0)
    if with_color:
        col = jnp.stack([acc[3] / dsafe, acc[4] / dsafe, acc[5] / dsafe], -1)
        col = jnp.where(valid[..., None], col, 0.0)
    else:
        col = jnp.zeros((h, w_img, 3), jnp.float32)
    return SplatImages(depth=depth, valid=valid, color=col)


@functools.partial(
    jax.jit,
    static_argnames=("intr", "tsdf_cfg", "with_color", "interpret", "rmax", "raw"),
)
def splat_depth(
    slots: jnp.ndarray,  # i32[K] payload rows to render
    slot_valid: jnp.ndarray,  # bool[K]
    block_coords: jnp.ndarray,  # i32[C, 3] slot -> block coord
    sdf: jnp.ndarray,  # f32[C, 512]
    weight: jnp.ndarray,  # f32[C, 512] fusion weights
    color: jnp.ndarray,  # f32[C, 512, 3] (ignored if not with_color)
    T_wc: jnp.ndarray,
    intr: Intrinsics,
    tsdf_cfg: TsdfConfig,
    with_color: bool = True,
    interpret: bool = False,
    depth_prior: jnp.ndarray | None = None,
    rmax: int = 8,
    raw: bool = False,
) -> SplatImages:
    """Rasterize the listed blocks into composited depth/color images.

    `depth_prior` (f32[H,W], the just-fused depth / previous prediction)
    band-limits validity exactly like the marched fast path: splat votes
    that land more than ~1.5 trunc from the prior are silhouette bleed
    (a foreground block's tent footprint dilating over background
    pixels) and are invalidated rather than fed to ICP.
    """
    h, w = intr.height, intr.width
    # Accumulators are padded to native tiles (sublane 8 / lane 128); the
    # window origins index the padded images, results are sliced back.
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    th = min(128, hp)
    tw = min(256, wp)
    k = slots.shape[0]
    b = tsdf_cfg.block_size
    assert b == 8, "splat kernel assumes 8^3 blocks"

    safe_slots, meta_i, meta_f, cam = block_windows(
        slots, slot_valid, block_coords, T_wc, intr, tsdf_cfg,
        th=th, tw=tw, hp=hp, wp=wp, rmax=rmax,
    )
    # Pad the block list to the row-group size; pad entries are skipped
    # via meta u0 = -1.
    g = GROUP_ROWS
    pad = (-k) % g
    if pad:
        safe_slots = jnp.pad(safe_slots, (0, pad))
        meta_i = jnp.pad(meta_i, ((0, pad), (0, 0)), constant_values=-1)
        meta_f = jnp.pad(meta_f, ((0, pad), (0, 0)), constant_values=1.0)
    kp = k + pad
    # Contiguous-row gathers (HBM-bandwidth bound, unlike per-lane
    # gathers): Mosaic block mappings need >= 8 sublanes, so rows are
    # gathered host-side and streamed in groups of 8.
    sdf_rows = sdf[safe_slots]
    wgt_rows = weight[safe_slots]
    if color.size == 0 or not with_color:
        col_rows = jnp.zeros((kp, 3 * 512), jnp.float32)
        with_color = False
    else:
        col_rows = color[safe_slots]  # (KP, 1536) packed

    row_spec = pl.BlockSpec((g, 512), lambda i, mi, mf, c: (i, 0))
    col_spec = pl.BlockSpec((g, 3 * 512), lambda i, mi, mf, c: (i, 0))
    img_spec = pl.BlockSpec((hp, wp), lambda i, mi, mf, c: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(kp // g,),
        in_specs=[row_spec, row_spec, col_spec],
        out_specs=[img_spec] * 6,
    )
    outs = pl.pallas_call(
        functools.partial(_splat_kernel, th=th, tw=tw, with_color=with_color),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * 6,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(meta_i.reshape(-1), meta_f.reshape(-1), cam.reshape(-1),
       sdf_rows, wgt_rows, col_rows)
    if raw:
        # Raw scatter-add accumulators (see splat_depth_groups): summing
        # planes from disjoint block sets is exact.
        return outs
    num, dens, denr, outr, outg, outb = (o[:h, :w] for o in outs)

    valid = (denr > _DEN_TAU) & (dens > 1e-30)
    dsafe = jnp.maximum(dens, 1e-30)
    depth = jnp.where(valid, num / dsafe, 0.0)
    valid = valid & (depth > 0.05)
    if depth_prior is not None:
        band = 1.5 * tsdf_cfg.trunc
        valid = valid & (depth_prior > 0.0) & (
            jnp.abs(depth - depth_prior) <= band
        )
    depth = jnp.where(valid, depth, 0.0)
    if with_color:
        col = jnp.stack([outr / dsafe, outg / dsafe, outb / dsafe], axis=-1)
        col = jnp.where(valid[..., None], col, 0.0)
    else:
        col = jnp.zeros((h, w, 3), jnp.float32)
    return SplatImages(depth=depth, valid=valid, color=col)
