"""Pallas TSDF block-update and label-vote kernels.

Replaces the fusion math of the reference's surfel data-fusion pipeline
and instance label-update CUDA kernels (SURVEY.md §3.1 items 5, 7) for
the block-sparse map.  The projective association (voxel -> pixel ->
depth/label sample) stays in XLA (per-lane gathers are XLA's domain on
TPU); these kernels own the HBM-dominant read-modify-write of the block
payloads — sdf, weight, color (and label, count) updated in ONE pass with
`input_output_aliases`, so per touched voxel the traffic is exactly one
payload read + one payload write.

Layout: payload tiles are (TILE_BLOCKS, 512) f32 — the 512-voxel block
rows are already lane-aligned (4 x 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 64  # block rows per grid step (64 x 512 voxels)


def _update_kernel(
    sdf_ref, w_ref, col_ref,
    psi_ref, wobs_ref, obs_ref,
    sdf_out, w_out, col_out,
    *, max_weight: float, color_gain: float = 1.0,
):
    w_old = w_ref[:]
    w_obs = wobs_ref[:]
    w_new = w_old + w_obs
    denom = jnp.maximum(w_new, 1e-6)
    inv = 1.0 / denom
    # Preserve never-fused voxels (sentinel sdf) instead of writing 0.
    sdf_out[:] = jnp.where(
        w_new > 0.0, (sdf_ref[:] * w_old + psi_ref[:] * w_obs) * inv, sdf_ref[:]
    )
    w_out[:] = jnp.minimum(w_new, max_weight)
    # Channel-segmented packed color rows: [r | g | b], B^3 lanes each.
    # color_gain compensates a color cadence (EngineConfig.color_every):
    # off-frames inflate the shared fusion weight without a color sample,
    # so the on-frame blend scales the observation by the cadence — the
    # color EMA keeps the every-frame time constant.  Residual bias: the
    # FIRST color sample of a voxel that saw g_off depth-only frames lands
    # at gain/(w_old+gain) of its value, decaying at the normal EMA rate.
    inv_c = 1.0 / jnp.maximum(w_old + color_gain * w_obs, 1e-6)
    b3 = sdf_ref.shape[1]
    for c in range(3):
        seg = slice(c * b3, (c + 1) * b3)
        col_out[:, seg] = (
            col_ref[:, seg] * w_old + obs_ref[:, seg] * (color_gain * w_obs)
        ) * inv_c


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def fused_tsdf_update(
    sdf, weight, color,  # (K, B^3) / (K, 3*B^3) payload rows (gathered)
    psi, w_obs, obs,  # (K, B^3) / (K, 3*B^3) observations
    max_weight: float,
    interpret: bool = False,
    color_gain: float = 1.0,
):
    """Weighted running-average update, all planes in one fused pass."""
    k = sdf.shape[0]
    pad = (-k) % _TILE
    args = [sdf, weight, color, psi, w_obs, obs]
    if pad:
        args = [jnp.pad(a, ((0, pad), (0, 0))) for a in args]
    kp = k + pad
    b3 = sdf.shape[1]

    def spec(n):
        return pl.BlockSpec(
            (_TILE, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        )

    outs = pl.pallas_call(
        functools.partial(
            _update_kernel, max_weight=max_weight, color_gain=color_gain
        ),
        grid=(kp // _TILE,),
        in_specs=[spec(b3), spec(b3), spec(3 * b3)] * 2,
        out_specs=(spec(b3), spec(b3), spec(3 * b3)),
        out_shape=(
            jax.ShapeDtypeStruct((kp, b3), jnp.float32),
            jax.ShapeDtypeStruct((kp, b3), jnp.float32),
            jax.ShapeDtypeStruct((kp, 3 * b3), jnp.float32),
        ),
        input_output_aliases={0: 0, 1: 1, 2: 2},
        interpret=interpret,
    )(*args)
    return tuple(o[:k] for o in outs)


def _integrate_kernel(
    # scalar prefetch (layout shared with the splat kernel: block_windows)
    meta_i_ref,  # i32[K, 8]: u0, v0, bcx, bcy, bcz (u0 = -1 -> passthrough)
    meta_f_ref,  # f32[K, 4] (unused here)
    cam_ref,  # f32[1, 24]: T_cw, fx fy cx cy, voxel, trunc, origin, W H maxw
    # tensor inputs
    depth_ref,  # f32[HP, WP] measured depth, VMEM-resident across the grid
    cri_ref,
    cgi_ref,
    cbi_ref,  # f32[HP, WP] frame color planes
    sdf_ref,  # f32[G, 512] gathered payload row group
    w_ref,
    col_ref,  # f32[G, 1536] packed color rows [r | g | b] (512 lanes each)
    # outputs: updated row groups, scattered back by the host
    sdf_out,
    w_out,
    col_out,
    *,
    th: int,
    tw: int,
    with_color: bool,
    color_gain: float = 1.0,
):
    """Projective TSDF update with the association gather done as matmuls.

    The per-voxel depth/color image lookup (the reference's `tex2D` in its
    CUDA integrate kernels) is a per-lane random gather — XLA's weak spot
    on TPU.  Here each block's 512 voxels read the (<=129 px wide) image
    window they project into via factored one-hot contractions on the MXU:
      gathered[i] = sum_p onehot_v[p,i] * (D @ onehot_u)[p,i]
    i.e. one [TH,TW]x[TW,512] matmul per channel plus a sublane reduction
    — zero random-access HBM traffic, exact nearest-pixel semantics.
    Each grid step carries a group of GROUP_ROWS gathered rows (Mosaic's
    block sublane minimum), unrolled below.
    """
    from instancefusion_tpu.ops.pallas.raycast import GROUP_ROWS

    i = pl.program_id(0)

    # Outputs must always be written (the host scatters every row back).
    sdf_out[:] = sdf_ref[:]
    w_out[:] = w_ref[:]
    if with_color:
        col_out[:] = col_ref[:]

    r00, r01, r02, t0 = cam_ref[0], cam_ref[1], cam_ref[2], cam_ref[3]
    r10, r11, r12, t1 = cam_ref[4], cam_ref[5], cam_ref[6], cam_ref[7]
    r20, r21, r22, t2 = cam_ref[8], cam_ref[9], cam_ref[10], cam_ref[11]
    fx, fy, cx, cy = cam_ref[12], cam_ref[13], cam_ref[14], cam_ref[15]
    voxel, trunc = cam_ref[16], cam_ref[17]
    ox, oy, oz = cam_ref[18], cam_ref[19], cam_ref[20]
    img_w, img_h = cam_ref[21], cam_ref[22]
    max_weight = cam_ref[23]

    for g in range(GROUP_ROWS):
        k = i * GROUP_ROWS + g
        u0 = meta_i_ref[k * 8 + 0]

        @pl.when(u0 >= 0)
        def _update(g=g, k=k, u0=u0):
            v0 = meta_i_ref[k * 8 + 1]
            bcx = meta_i_ref[k * 8 + 2].astype(jnp.float32)
            bcy = meta_i_ref[k * 8 + 3].astype(jnp.float32)
            bcz = meta_i_ref[k * 8 + 4].astype(jnp.float32)

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
            vis = zc > 1e-3
            zs = jnp.where(vis, zc, 1.0)
            u = fx * xc / zs + cx
            v = fy * yc / zs + cy
            ur = jnp.round(u)
            vr = jnp.round(v)
            in_img = (
                vis & (ur >= 0.0) & (ur <= img_w - 1.0)
                & (vr >= 0.0) & (vr <= img_h - 1.0)
            )

            # Nearest-pixel gather as factored one-hot contractions.
            colpos = (
                jax.lax.broadcasted_iota(jnp.int32, (tw, 512), 0)
                .astype(jnp.float32) + u0.astype(jnp.float32)
            )
            du = colpos - u
            oh_u = ((du > -0.5) & (du <= 0.5)).astype(jnp.float32)  # (TW,512)
            rowpos = (
                jax.lax.broadcasted_iota(jnp.int32, (th, 512), 0)
                .astype(jnp.float32) + v0.astype(jnp.float32)
            )
            dv = rowpos - v
            oh_v = ((dv > -0.5) & (dv <= 0.5)).astype(jnp.float32)  # (TH,512)

            rw = pl.ds(pl.multiple_of(v0, 8), th)
            cw = pl.ds(pl.multiple_of(u0, 128), tw)
            dwin = depth_ref[rw, cw]  # (TH, TW)
            # Depth gather must stay effectively exact (single-pass bf16
            # would quantize depth by ~0.4%): split into exact hi/lo bf16
            # halves — a one-hot contraction touches one pixel per output,
            # so each partial product is exact and hi+lo reassembles f32
            # to ~2^-17 relative (micrometers).  One single-pass matmul
            # carries both halves plus the color planes.
            d_hi = dwin.astype(jnp.bfloat16)
            rows = [d_hi.astype(jnp.float32), dwin - d_hi.astype(jnp.float32)]
            if with_color:
                rows += [cri_ref[rw, cw], cgi_ref[rw, cw], cbi_ref[rw, cw]]
            win = jnp.concatenate(rows, axis=0).astype(jnp.bfloat16)
            m1 = jax.lax.dot_general(
                win, oh_u.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # ((2 or 5)*TH, 512)
            d_vox = jnp.sum(
                oh_v * (m1[0:th] + m1[th : 2 * th]), axis=0, keepdims=True
            )  # (1, 512)

            sdf_obs = d_vox - zc
            ok = in_img & (d_vox > 0.0) & (sdf_obs > -trunc)
            psi = jnp.clip(sdf_obs / trunc, -1.0, 1.0)
            w_obs = jnp.where(ok, 1.0, 0.0)

            w_old = w_ref[g : g + 1, :]
            w_new = w_old + w_obs
            denom = jnp.maximum(w_new, 1e-6)
            inv = 1.0 / denom
            sdf_out[g : g + 1, :] = jnp.where(
                w_new > 0.0,
                (sdf_ref[g : g + 1, :] * w_old + psi * w_obs) * inv,
                sdf_ref[g : g + 1, :],
            )
            w_out[g : g + 1, :] = jnp.minimum(w_new, max_weight)
            if with_color:
                # color_gain: cadence compensation — see _update_kernel.
                inv_c = 1.0 / jnp.maximum(w_old + color_gain * w_obs, 1e-6)
                for c in range(3):
                    c_vox = jnp.sum(
                        oh_v * m1[(2 + c) * th : (3 + c) * th],
                        axis=0, keepdims=True,
                    )
                    seg = slice(c * 512, (c + 1) * 512)
                    col_out[g : g + 1, seg] = (
                        col_ref[g : g + 1, seg] * w_old
                        + c_vox * (color_gain * w_obs)
                    ) * inv_c


def fused_integrate(
    slots,  # i32[K] payload rows to update (unique where valid)
    slot_valid,  # bool[K]
    block_coords,  # i32[C, 3]
    sdf,
    weight,
    color,  # packed payload color rows f32[C, 3*512] ([r|g|b] segments)
    depth,  # f32[H, W]
    frame_color,  # f32[H, W, 3] or None
    T_wc,
    intr,
    tsdf_cfg,
    interpret: bool = False,
    color_gain: float = 1.0,
):
    """TSDF integrate over a block list, association gather on the MXU.

    Returns (sdf_rows, w_rows, color_rows, out_slots): updated payload rows
    (K, 512) / packed (K, 3*512) for the caller to scatter back (valid rows
    only; invalid entries carry out_slots == capacity so
    `.at[].set(mode='drop')` skips them).
    """
    from instancefusion_tpu.ops.pallas.raycast import GROUP_ROWS, block_windows

    h, w_img = intr.height, intr.width
    hp = -(-h // 8) * 8
    wp = -(-w_img // 128) * 128
    th = min(128, hp)
    tw = min(256, wp)
    k = slots.shape[0]
    with_color = frame_color is not None and color.size > 0

    safe_slots, meta_i, meta_f, cam = block_windows(
        slots, slot_valid, block_coords, T_wc, intr, tsdf_cfg,
        th=th, tw=tw, hp=hp, wp=wp, rmax=1,
    )
    g = GROUP_ROWS
    pad = (-k) % g
    if pad:
        safe_slots = jnp.pad(safe_slots, (0, pad))
        meta_i = jnp.pad(meta_i, ((0, pad), (0, 0)), constant_values=-1)
        meta_f = jnp.pad(meta_f, ((0, pad), (0, 0)), constant_values=1.0)
    kp = k + pad

    dpad = jnp.zeros((hp, wp), jnp.float32).at[:h, :w_img].set(depth)
    sdf_in = sdf[safe_slots]
    w_in = weight[safe_slots]
    if with_color:
        cpads = [
            jnp.zeros((hp, wp), jnp.float32).at[:h, :w_img].set(frame_color[..., c])
            for c in range(3)
        ]
        crow = color[safe_slots]  # (KP, 1536) packed
    else:
        cpads = [jnp.zeros((8, 128), jnp.float32)] * 3
        crow = jnp.zeros((kp, 3 * 512), jnp.float32)

    dspec = pl.BlockSpec((hp, wp), lambda i, mi, mf, c: (0, 0))
    cspec = (
        dspec
        if with_color
        else pl.BlockSpec((8, 128), lambda i, mi, mf, c: (0, 0))
    )
    row_spec = pl.BlockSpec((g, 512), lambda i, mi, mf, c: (i, 0))
    col_spec = pl.BlockSpec((g, 3 * 512), lambda i, mi, mf, c: (i, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(kp // g,),
        in_specs=[dspec, cspec, cspec, cspec, row_spec, row_spec, col_spec],
        out_specs=[row_spec, row_spec, col_spec],
    )
    outs = pl.pallas_call(
        functools.partial(
            _integrate_kernel, th=th, tw=tw, with_color=with_color,
            color_gain=color_gain,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((kp, 512), jnp.float32),
            jax.ShapeDtypeStruct((kp, 512), jnp.float32),
            jax.ShapeDtypeStruct((kp, 3 * 512), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        meta_i.reshape(-1), meta_f.reshape(-1), cam.reshape(-1),
        dpad, *cpads, sdf_in, w_in, crow,
    )
    sdf_rows, w_rows = outs[0][:k], outs[1][:k]
    color_rows = outs[2][:k] if with_color else None
    out_slots = jnp.where(slot_valid, slots, sdf.shape[0])  # OOB -> dropped
    return sdf_rows, w_rows, color_rows, out_slots


def _integrate_groups_kernel(gids_ref, *rest, **kw):
    # Same body as the slot-list kernel; gids_ref only drives the payload
    # BlockSpec index maps.
    del gids_ref
    _integrate_kernel(*rest, **kw)


def fused_integrate_groups(
    gids,  # i32[KG] payload ROW GROUPS (8 consecutive slots each)
    row_valid,  # bool[KG, 8]
    block_coords,  # i32[C, 3]
    sdf,
    weight,
    color,  # full packed payload color rows f32[C, 3*512]
    depth,
    frame_color,
    T_wc,
    intr,
    tsdf_cfg,
    interpret: bool = False,
    color_gain: float = 1.0,
    th: int | None = None,
):
    """TSDF integrate addressed by payload row GROUPS, updated IN PLACE.

    The slot-list path (`fused_integrate`) gathers K payload rows to a
    scratch buffer, updates them, and scatters back — and those XLA row
    gathers/scatters (~1 ms per plane per frame at K = 2048) dominate the
    integrate cost on this hardware, not the kernel.  Here the kernel
    reads and writes the payload planes directly through data-dependent
    BlockSpec index maps (one (8, 512) group per grid step, group id from
    scalar prefetch) with `input_output_aliases` — zero XLA gathers,
    zero scatters, payload traffic exactly one read + one write of the
    touched groups.  Pad grid entries target the RESERVED last group
    (blocks.RESERVED_SLOTS — never allocated), so no group is ever
    visited twice and the in-place pipeline has no read-after-write
    hazard.

    Returns (sdf, weight, color) — the updated full planes.
    """
    from instancefusion_tpu.ops.pallas.raycast import GROUP_ROWS, block_windows

    assert GROUP_ROWS == 8
    h, w_img = intr.height, intr.width
    hp = -(-h // 8) * 8
    wp = -(-w_img // 128) * 128
    # th override: see splat_depth_groups — the binned fast path runs a
    # smaller-window variant over groups whose footprints fit it.
    th = min(128, hp) if th is None else min(th, hp)
    tw = min(256, wp)
    kg = gids.shape[0]
    with_color = frame_color is not None and color.size > 0

    slots = (gids[:, None] * 8 + jnp.arange(8, dtype=jnp.int32)[None, :]).reshape(-1)
    _, meta_i, meta_f, cam = block_windows(
        slots, row_valid.reshape(-1), block_coords, T_wc, intr, tsdf_cfg,
        th=th, tw=tw, hp=hp, wp=wp, rmax=1,
    )

    dpad = jnp.zeros((hp, wp), jnp.float32).at[:h, :w_img].set(depth)
    c_rows = sdf.shape[0]
    if with_color:
        cpads = [
            jnp.zeros((hp, wp), jnp.float32).at[:h, :w_img].set(frame_color[..., c])
            for c in range(3)
        ]
        col_in = color  # (C, 1536) packed, aliased in place
        col_spec = pl.BlockSpec((8, 3 * 512), lambda i, g, mi, mf, c: (g[i], 0))
    else:
        cpads = [jnp.zeros((8, 128), jnp.float32)] * 3
        col_in = jnp.zeros((8, 3 * 512), jnp.float32)
        col_spec = pl.BlockSpec((8, 3 * 512), lambda i, g, mi, mf, c: (0, 0))

    dspec = pl.BlockSpec((hp, wp), lambda i, g, mi, mf, c: (0, 0))
    cspec = (
        dspec
        if with_color
        else pl.BlockSpec((8, 128), lambda i, g, mi, mf, c: (0, 0))
    )
    grp_spec = pl.BlockSpec((8, 512), lambda i, g, mi, mf, c: (g[i], 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(kg,),
        in_specs=[dspec, cspec, cspec, cspec, grp_spec, grp_spec, col_spec],
        out_specs=[grp_spec, grp_spec, col_spec],
    )
    outs = pl.pallas_call(
        functools.partial(
            _integrate_groups_kernel, th=th, tw=tw, with_color=with_color,
            color_gain=color_gain,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((c_rows, 512), jnp.float32),
            jax.ShapeDtypeStruct((c_rows, 512), jnp.float32),
            jax.ShapeDtypeStruct(col_in.shape, jnp.float32),
        ],
        # Alias the payload planes in place (indices count ALL operands
        # including the 4 scalar-prefetch args, then depth + 3 images).
        input_output_aliases={8: 0, 9: 1, 10: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        gids, meta_i.reshape(-1), meta_f.reshape(-1), cam.reshape(-1),
        dpad, *cpads, sdf, weight, col_in,
    )
    sdf_new, w_new = outs[0], outs[1]
    color_new = outs[2] if with_color else color
    return sdf_new, w_new, color_new


def _vote_kernel(lab_ref, cnt_ref, gid_ref, obs_ref, lab_out, cnt_out):
    lab = lab_ref[:]
    cnt = cnt_ref[:]
    gid = gid_ref[:]
    obs = obs_ref[:] > 0.0
    adopt = obs & (cnt <= 0.0)
    same = obs & (lab == gid) & ~adopt
    other = obs & ~adopt & ~same
    lab_out[:] = jnp.where(adopt, gid, lab)
    cnt_out[:] = jnp.where(
        adopt, 1.0, jnp.where(same, cnt + 1.0, jnp.where(other, cnt - 1.0, cnt))
    )


@functools.partial(jax.jit, static_argnums=(4,))
def fused_label_vote(
    label, count,  # (K, 512) i32 / f32 vote planes (gathered rows)
    gid, obs,  # (K, 512) observed ids (i32) and observation mask (f32)
    interpret: bool = False,
):
    """Boyer-Moore streaming-majority vote update in one fused pass."""
    k = label.shape[0]
    pad = (-k) % _TILE
    args = [label, count, gid, obs]
    if pad:
        args = [jnp.pad(a, ((0, pad), (0, 0))) for a in args]
    kp = k + pad
    spec = pl.BlockSpec((_TILE, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lab, cnt = pl.pallas_call(
        _vote_kernel,
        grid=(kp // _TILE,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((kp, 512), jnp.int32),
            jax.ShapeDtypeStruct((kp, 512), jnp.float32),
        ),
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(*args)
    return lab[:k], cnt[:k]
