"""Pallas ICP normal-equation reduction kernel.

The reference's hottest kernels (`icpStep` + block tree reduction,
expected `Core/src/Cuda/icp.cu` — SURVEY.md §4.3) compute per-pixel
point-to-plane residuals/jacobians and reduce 27 floats per pixel block.
The jnp path (`ops/icp.build_normal_equations`) materializes the masked
jacobian J (HW, 6) to HBM and runs a (6,HW)x(HW,6) matmul — an extra
~7 MB of HBM write+read per ICP iteration at VGA.

This kernel fuses residual + jacobian + weighting + the full 29-term
reduction (21 upper-tri JᵀJ, 6 Jᵀr, inlier count, |r| sum) in one pass:
each grid step reads one pixel tile and accumulates partials in a VMEM
scratch accumulator; the last step writes 32 floats.  HBM traffic is
exactly one read of the association arrays — speed-of-light for this op.

Association — the projective gather of target vertex/normal per source
pixel, the dominant ICP cost as ~7 per-lane gathers x 300k pixels per
iteration — is `gather_target_maps`: source pixels are processed in
(8, 128) tiles, each tile's projections land in a tile-aligned window of
the target maps (computed in-kernel from the tile's min projection), and
the nearest-pixel lookup runs as factored one-hot contractions on the
MXU (exactly the `fused_integrate` trick, inverted to image->image).
Vertex planes contract at Precision.HIGHEST (exact f32 pass-through);
normals/validity in single-pass bf16.  Pixels whose projection falls
outside their tile's window (large inter-frame motion at the fine
levels; the coarse level is always a single window) gather validity 0
and drop out of that iteration — conservative, never wrong.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_TILE_ROWS = 64  # 64 x 128 = 8192 pixels per grid step


def _kernel(px, py, pz, nx, ny, nz, qx, qy, qz, m, out_ref, acc_ref,
            *, huber_delta: float = 0.0):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    gate = m[:]
    pxv, pyv, pzv = px[:], py[:], pz[:]
    nxv, nyv, nzv = nx[:], ny[:], nz[:]
    dx = pxv - qx[:]
    dy = pyv - qy[:]
    dz = pzv - qz[:]
    r = nxv * dx + nyv * dy + nzv * dz
    # IRLS Huber weight (static delta; 0 compiles the branch away).
    if huber_delta > 0.0:
        w = gate * jnp.minimum(
            1.0, huber_delta / jnp.maximum(jnp.abs(r), 1e-9)
        )
    else:
        w = gate
    # J = [n, p x n]
    j3 = pyv * nzv - pzv * nyv
    j4 = pzv * nxv - pxv * nzv
    j5 = pxv * nyv - pyv * nxv
    j = (nxv, nyv, nzv, j3, j4, j5)

    vals = []
    for a in range(6):
        for b in range(a, 6):
            vals.append(jnp.sum(j[a] * j[b] * w))
    for a in range(6):
        vals.append(jnp.sum(j[a] * (-r) * w))
    vals.append(jnp.sum(gate))
    vals.append(jnp.sum(jnp.abs(r) * w))
    vals += [jnp.zeros(())] * (32 - len(vals))
    acc_ref[0, :] = acc_ref[0, :] + jnp.stack(vals)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _gather_kernel(
    # (8, 128) source tiles (u, v, sel), SMEM cam row, [HP, WP] target
    # planes (depth, normals; +intensity/gx/gy with use_rgb), then the
    # (8, 128) gathered outputs (vertex, normal, valid; +i/gx/gy).
    *refs,
    hp: int,
    wp: int,
    thw: int,
    tww: int,
    use_rgb: bool = False,
):
    if use_rgb:
        (u_ref, v_ref, sel_ref, cam_ref, td, tnx, tny, tnz, ti, tgx, tgy,
         ovx, ovy, ovz, onx, ony, onz, ova, oi, ogx, ogy) = refs
    else:
        (u_ref, v_ref, sel_ref, cam_ref, td, tnx, tny, tnz,
         ovx, ovy, ovz, onx, ony, onz, ova) = refs
    u_t = u_ref[:]
    v_t = v_ref[:]
    sel = sel_ref[:] > 0.5
    big = jnp.float32(1e9)
    umin = jnp.min(jnp.where(sel, u_t, big))
    vmin = jnp.min(jnp.where(sel, v_t, big))
    u0 = jnp.clip(
        (jnp.floor(umin).astype(jnp.int32) // 128) * 128, 0, max(wp - tww, 0)
    )
    v0 = jnp.clip(
        (jnp.floor(vmin).astype(jnp.int32) // 8) * 8, 0, max(hp - thw, 0)
    )
    rw = pl.ds(pl.multiple_of(v0, 8), thw)
    cw = pl.ds(pl.multiple_of(u0, 128), tww)
    # ONE single-pass bf16 matmul per source row gathers 5 planes: target
    # DEPTH as an exact hi/lo bf16 split (a one-hot contraction touches
    # exactly one window pixel per output, so each partial product is
    # exact and hi+lo reassembles f32 to ~2^-17 relative), normals as
    # plain bf16.  The target VERTEX is not gathered at all: a predicted
    # map's vertex is exactly o_pred + d * R_pred K^-1 [ur, vr, 1] (see
    # blocks.raycast_splat / ops.raycast — vertex = origin + depth * unit-z
    # ray), and (ur, vr) are the very coordinates this kernel rounds to,
    # so q_w is reconstructed from the gathered depth in-register —
    # halving the previous 10-plane matmul.  Validity needs no plane
    # either: predicted normals are zeroed where invalid and unit-norm
    # where valid, so |n| > 0.5 after the gather is the valid bit.
    d_w = td[rw, cw]
    d_hi = d_w.astype(jnp.bfloat16)
    rows = [
        d_hi.astype(jnp.float32),
        d_w - d_hi.astype(jnp.float32),
        tnx[rw, cw], tny[rw, cw], tnz[rw, cw],
    ]
    if use_rgb:
        # Intensity as an exact hi/lo split (the photometric residual
        # I_t - I_src is small — bf16's ~3 decimal digits would alias
        # it); gradients single-pass bf16 (they only scale the
        # Jacobian).  Folding the rgb planes into the SAME one-hot
        # contraction costs ~2x this kernel instead of 4 XLA flat
        # gathers per association round (~19 ms/track -> sub-ms; the
        # r4 photometric bench fell 213 -> 42 fps on exactly this).
        i_w = ti[rw, cw]
        i_hi = i_w.astype(jnp.bfloat16)
        rows += [
            i_hi.astype(jnp.float32),
            i_w - i_hi.astype(jnp.float32),
            tgx[rw, cw], tgy[rw, cw],
        ]
    win = jnp.concatenate(rows, axis=0).astype(jnp.bfloat16)  # (np*THW, TW)

    r00, r01, r02 = cam_ref[0], cam_ref[1], cam_ref[2]
    r10, r11, r12 = cam_ref[3], cam_ref[4], cam_ref[5]
    r20, r21, r22 = cam_ref[6], cam_ref[7], cam_ref[8]
    t0, t1, t2 = cam_ref[9], cam_ref[10], cam_ref[11]
    fx, fy, cx, cy = cam_ref[12], cam_ref[13], cam_ref[14], cam_ref[15]

    colpos = (
        jax.lax.broadcasted_iota(jnp.int32, (tww, _LANES), 0).astype(jnp.float32)
        + u0.astype(jnp.float32)
    )
    rowpos = (
        jax.lax.broadcasted_iota(jnp.int32, (thw, _LANES), 0).astype(jnp.float32)
        + v0.astype(jnp.float32)
    )
    outs = (ovx, ovy, ovz, onx, ony, onz, ova)
    for r in range(8):
        u_row = u_t[r : r + 1, :]  # (1, 128)
        v_row = v_t[r : r + 1, :]
        du = colpos - u_row  # (TW, 128)
        oh_u = ((du > -0.5) & (du <= 0.5)).astype(jnp.bfloat16)
        dvr = rowpos - v_row  # (THW, 128)
        oh_v = ((dvr > -0.5) & (dvr <= 0.5)).astype(jnp.float32)
        m1 = jax.lax.dot_general(
            win, oh_u, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (5*THW, 128)
        d = (
            jnp.sum(oh_v * m1[0:thw], axis=0)
            + jnp.sum(oh_v * m1[thw : 2 * thw], axis=0)
        )  # (128,)
        nx = jnp.sum(oh_v * m1[2 * thw : 3 * thw], axis=0)
        ny = jnp.sum(oh_v * m1[3 * thw : 4 * thw], axis=0)
        nz = jnp.sum(oh_v * m1[4 * thw : 5 * thw], axis=0)
        if use_rgb:
            iv = (
                jnp.sum(oh_v * m1[5 * thw : 6 * thw], axis=0)
                + jnp.sum(oh_v * m1[6 * thw : 7 * thw], axis=0)
            )
            gxv = jnp.sum(oh_v * m1[7 * thw : 8 * thw], axis=0)
            gyv = jnp.sum(oh_v * m1[8 * thw : 9 * thw], axis=0)
            oi[r, :] = iv
            ogx[r, :] = gxv
            ogy[r, :] = gyv
        # Reconstruct q_w from the gathered depth at the SAME pixel the
        # one-hot window selected: du in (-0.5, 0.5] means col =
        # ceil(u - 0.5) (round-half-up) — jnp.round would round half-to-
        # even and pick pixel k while the gather read k+1 at exact .5
        # boundaries (r3 advisor finding).
        ur = jnp.ceil(u_row[0, :] - 0.5)
        vr = jnp.ceil(v_row[0, :] - 0.5)
        xc = (ur - cx) / fx * d
        yc = (vr - cy) / fy * d
        ok = (d > 0.0) & (nx * nx + ny * ny + nz * nz > 0.25)
        okf = jnp.where(ok, 1.0, 0.0)
        outs[0][r, :] = (r00 * xc + r01 * yc + r02 * d + t0) * okf
        outs[1][r, :] = (r10 * xc + r11 * yc + r12 * d + t1) * okf
        outs[2][r, :] = (r20 * xc + r21 * yc + r22 * d + t2) * okf
        outs[3][r, :] = nx
        outs[4][r, :] = ny
        outs[5][r, :] = nz
        outs[6][r, :] = okf


@functools.partial(jax.jit, static_argnums=(7,))
def gather_target_maps(
    u: jnp.ndarray,  # (H, W) projected column of each source pixel
    v: jnp.ndarray,  # (H, W) projected row
    sel: jnp.ndarray,  # (H, W) bool — source pixels worth gathering for
    tgt_depth: jnp.ndarray,  # (H, W) predicted z-depth (0 where invalid)
    tgt_normal: jnp.ndarray,  # (H, W, 3) zeroed where invalid
    T_tgt_wc: jnp.ndarray,  # (4, 4) camera-to-world of the prediction view
    intr_kref,  # (fx, fy, cx, cy) floats of the TARGET view resolution
    interpret: bool = False,
    tgt_rgb=None,  # optional (intensity, gx, gy) target planes, each (H, W)
):
    """Nearest-pixel gather of target maps at (v, u), MXU-factored.

    Returns (q_w (H,W,3), n_t (H,W,3), assoc_valid (H,W) bool); pixels
    with sel=False, off-image projections, projections outside their
    tile's search window, or invalid target pixels come back invalid.
    With `tgt_rgb` the photometric target planes ride the same one-hot
    contraction (the reference's rgbStep `tex2D` gathers, SURVEY §4.3)
    and an extra (i_t, gx_t, gy_t) triple of (H,W) maps is appended.
    """
    h, w = u.shape
    hp = -(-h // 8) * 8
    wp = -(-w // _LANES) * _LANES
    thw = min(32, hp)
    tww = min(256, wp)

    def pad(x, fill=0.0):
        return jnp.pad(
            x, ((0, hp - h), (0, wp - w)), constant_values=fill
        ).astype(jnp.float32)

    up = pad(u, -1e9)
    vp = pad(v, -1e9)
    selp = pad(sel.astype(jnp.float32))
    planes = [pad(tgt_depth)]
    planes += [pad(tgt_normal[..., c]) for c in range(3)]
    fx, fy, cx, cy = intr_kref
    cam = jnp.concatenate(
        [
            T_tgt_wc[:3, :3].reshape(-1),
            T_tgt_wc[:3, 3],
            jnp.array([fx, fy, cx, cy], jnp.float32),
        ]
    ).astype(jnp.float32)

    tile = pl.BlockSpec((8, _LANES), lambda i, j: (i, j))
    crow = pl.BlockSpec(memory_space=pltpu.SMEM)
    full = pl.BlockSpec((hp, wp), lambda i, j: (0, 0))
    use_rgb = tgt_rgb is not None
    if use_rgb:
        planes += [pad(p) for p in tgt_rgb]
    nout = 10 if use_rgb else 7
    outs = pl.pallas_call(
        functools.partial(
            _gather_kernel, hp=hp, wp=wp, thw=thw, tww=tww, use_rgb=use_rgb
        ),
        grid=(hp // 8, wp // _LANES),
        in_specs=[tile, tile, tile, crow] + [full] * len(planes),
        out_specs=[tile] * nout,
        out_shape=[jax.ShapeDtypeStruct((hp, wp), jnp.float32)] * nout,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(up, vp, selp, cam, *planes)
    q_w = jnp.stack([o[:h, :w] for o in outs[0:3]], axis=-1)
    n_t = jnp.stack([o[:h, :w] for o in outs[3:6]], axis=-1)
    valid = (outs[6][:h, :w] > 0.5) & sel
    if use_rgb:
        return q_w, n_t, valid, tuple(o[:h, :w] for o in outs[7:10])
    return q_w, n_t, valid


def _gn_kernel(
    # tensor inputs, (R, 128) pixel planes; with use_rgb, 5 more planes
    # follow m_ref: source intensity, gathered target intensity, target
    # image gradients gx/gy, and the photometric gate.
    *refs,
    inner_n: int,
    dist_thresh: float,
    angle_thresh: float,
    huber_delta: float,
    damping: float,
    min_valid: int,
    use_rgb: bool = False,
    rgb_weight: float = 0.0,
):
    """`inner_n` Gauss-Newton steps on fixed correspondences, one launch.

    The reference's RGBDOdometry round-trips the reduced 6x6 system to
    the CPU every iteration; the jnp path already kept the loop on-device
    but still paid ~20 small XLA ops + a reduction kernel per step.  Here
    the WHOLE inner loop lives in one kernel: grid = (iterations, pixel
    tiles); the pose lives in SMEM scalars, each tile accumulates the
    29-term normal-equation sums into SMEM, and the last tile of each
    iteration solves the damped 6x6 system by an unrolled scalar Cholesky
    and applies the exp(xi) update (Rodrigues, scalars) — zero
    host<->device and zero XLA-op traffic between iterations.

    With `use_rgb` the photometric term (the reference's `rgbStep`) joins
    the SAME accumulator: residual I_t - I_src against targets gathered
    at association time (fixed correspondences, like the geometric half),
    with the Jacobian chain dI/d(u,v) x d(u,v)/dp_c x dp_c/dxi recomputed
    from the live SMEM pose each iteration.
    """
    if use_rgb:
        (vx, vy, vz, nx, ny, nz, qx, qy, qz, tx, ty, tz, m_ref,
         ris, rit, rgx, rgy, rgate, T_ref, out_ref, smem) = refs
    else:
        (vx, vy, vz, nx, ny, nz, qx, qy, qz, tx, ty, tz, m_ref,
         T_ref, out_ref, smem) = refs
    it = pl.program_id(0)
    tile = pl.program_id(1)
    ntiles = pl.num_programs(1)

    iota = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    @pl.when((it == 0) & (tile == 0))
    def _init_pose():
        row = T_ref[0:1, :]
        for k in range(16):
            smem[k] = jnp.sum(jnp.where(iota == k, row, 0.0))
        if use_rgb:
            # T_pred_cw (12) + fx, fy at lanes 32..45 -> smem[50..63].
            for k in range(14):
                smem[50 + k] = jnp.sum(jnp.where(iota == 32 + k, row, 0.0))

    @pl.when(tile == 0)
    def _reset_acc():
        for k in range(32):
            smem[16 + k] = 0.0
        if use_rgb:
            for k in range(27):
                smem[64 + k] = 0.0

    # --- one linearization pass over this tile
    r00, r01, r02, t0 = smem[0], smem[1], smem[2], smem[3]
    r10, r11, r12, t1 = smem[4], smem[5], smem[6], smem[7]
    r20, r21, r22, t2 = smem[8], smem[9], smem[10], smem[11]

    sx, sy, sz = vx[:], vy[:], vz[:]
    px = r00 * sx + r01 * sy + r02 * sz + t0
    py = r10 * sx + r11 * sy + r12 * sz + t1
    pz = r20 * sx + r21 * sy + r22 * sz + t2
    ax, ay, az = nx[:], ny[:], nz[:]
    nwx = r00 * ax + r01 * ay + r02 * az
    nwy = r10 * ax + r11 * ay + r12 * az
    nwz = r20 * ax + r21 * ay + r22 * az

    dx = px - qx[:]
    dy = py - qy[:]
    dz = pz - qz[:]
    txv, tyv, tzv = tx[:], ty[:], tz[:]
    dist2 = dx * dx + dy * dy + dz * dz
    ndot = nwx * txv + nwy * tyv + nwz * tzv
    gate = (
        m_ref[:]
        * jnp.where(dist2 < dist_thresh * dist_thresh, 1.0, 0.0)
        * jnp.where(ndot > angle_thresh, 1.0, 0.0)
    )
    r = txv * dx + tyv * dy + tzv * dz
    if huber_delta > 0.0:
        w = gate * jnp.minimum(1.0, huber_delta / jnp.maximum(jnp.abs(r), 1e-9))
    else:
        w = gate
    j3 = py * tzv - pz * tyv
    j4 = pz * txv - px * tzv
    j5 = px * tyv - py * txv
    j = (txv, tyv, tzv, j3, j4, j5)
    if use_rgb:
        # Photometric contributions into the same accumulator.  World
        # point -> prediction camera via the SMEM-stashed T_pred_cw.
        c00, c01, c02 = smem[50], smem[51], smem[52]
        c10, c11, c12 = smem[53], smem[54], smem[55]
        c20, c21, c22 = smem[56], smem[57], smem[58]
        d0, d1, d2 = smem[59], smem[60], smem[61]
        fx, fy = smem[62], smem[63]
        pcx = c00 * px + c01 * py + c02 * pz + d0
        pcy = c10 * px + c11 * py + c12 * pz + d1
        pcz = c20 * px + c21 * py + c22 * pz + d2
        zs = jnp.maximum(pcz, 1e-6)
        gpx = rgx[:] * fx / zs
        gpy = rgy[:] * fy / zs
        gpz = -(gpx * pcx + gpy * pcy) / zs
        # dI/dp_w = R_cw^T grad_pc
        gwx = c00 * gpx + c10 * gpy + c20 * gpz
        gwy = c01 * gpx + c11 * gpy + c21 * gpz
        gwz = c02 * gpx + c12 * gpy + c22 * gpz
        rc = rit[:] - ris[:]
        mrg = rgate[:] * jnp.where(pcz > 0.0, 1.0, 0.0)
        jr = (
            gwx, gwy, gwz,
            py * gwz - pz * gwy,
            pz * gwx - px * gwz,
            px * gwy - py * gwx,
        )

    k = 0
    for a in range(6):
        for b in range(a, 6):
            smem[16 + k] = smem[16 + k] + jnp.sum(j[a] * j[b] * w)
            if use_rgb:
                # Photometric sums accumulate SEPARATELY (slots 64..90):
                # the solve combines them trust-fraction normalized
                # (wr_eff = rgb_weight * tr(Hgeo)/tr(Hrgb)) so the rgb
                # system carries a resolution-independent FRACTION of the
                # joint information — raw photometric JtJ scales with
                # fx^2 and would bury the geometric term ~10^3:1 at VGA.
                smem[64 + k] = smem[64 + k] + jnp.sum(jr[a] * jr[b] * mrg)
            k += 1
    for a in range(6):
        smem[16 + 21 + a] = smem[16 + 21 + a] + jnp.sum(j[a] * (-r) * w)
        if use_rgb:
            smem[64 + 21 + a] = smem[64 + 21 + a] + jnp.sum(
                jr[a] * (-rc) * mrg
            )
    smem[16 + 27] = smem[16 + 27] + jnp.sum(gate)
    smem[16 + 28] = smem[16 + 28] + jnp.sum(jnp.abs(r) * w)

    @pl.when(tile == ntiles - 1)
    def _solve_and_update():
        # H (upper-tri order) and b from the accumulator.
        H = [[None] * 6 for _ in range(6)]
        kk = 0
        for a in range(6):
            for b in range(a, 6):
                H[a][b] = smem[16 + kk]
                H[b][a] = smem[16 + kk]
                kk += 1
        bvec = [smem[16 + 21 + a] for a in range(6)]
        if use_rgb:
            # Trust-fraction combine: wr_eff = w * tr(Hgeo)/tr(Hrgb).
            diag_idx = [0, 6, 11, 15, 18, 20]
            trg = 0.0
            trr = 0.0
            for di in diag_idx:
                trg = trg + smem[16 + di]
                trr = trr + smem[64 + di]
            wr_eff = rgb_weight * trg / jnp.maximum(trr, 1e-20)
            kk = 0
            for a in range(6):
                for b in range(a, 6):
                    H[a][b] = H[a][b] + wr_eff * smem[64 + kk]
                    H[b][a] = H[a][b]
                    kk += 1
            bvec = [
                bvec[a] + wr_eff * smem[64 + 21 + a] for a in range(6)
            ]
        nin = smem[16 + 27]
        # Levenberg-style damping, as ops/icp.solve_increment.
        for a in range(6):
            H[a][a] = H[a][a] + damping * jnp.maximum(H[a][a], 1.0)

        # Unrolled scalar Cholesky H = L Lt (guarded against 0 pivots).
        L = [[None] * 6 for _ in range(6)]
        for i_ in range(6):
            for j_ in range(i_ + 1):
                s = H[i_][j_]
                for k_ in range(j_):
                    s = s - L[i_][k_] * L[j_][k_]
                if i_ == j_:
                    L[i_][i_] = jnp.sqrt(jnp.maximum(s, 1e-20))
                else:
                    L[i_][j_] = s / L[j_][j_]
        # Forward then back substitution.
        y = [None] * 6
        for i_ in range(6):
            s = bvec[i_]
            for k_ in range(i_):
                s = s - L[i_][k_] * y[k_]
            y[i_] = s / L[i_][i_]
        xi = [None] * 6
        for i_ in range(5, -1, -1):
            s = y[i_]
            for k_ in range(i_ + 1, 6):
                s = s - L[k_][i_] * xi[k_]
            xi[i_] = s / L[i_][i_]

        # Gate: enough inliers and finite solution, else zero update.
        ok = nin >= float(min_valid)
        for i_ in range(6):
            fin = jnp.isfinite(xi[i_])
            ok = jnp.logical_and(ok, fin)
        okf = jnp.where(ok, 1.0, 0.0)
        v0_, v1_, v2_ = xi[0] * okf, xi[1] * okf, xi[2] * okf
        w0, w1, w2 = xi[3] * okf, xi[4] * okf, xi[5] * okf

        # exp(xi) via Rodrigues (scalars), then pose <- exp(xi) @ pose.
        th2 = w0 * w0 + w1 * w1 + w2 * w2
        th = jnp.sqrt(th2)
        small = th < 1e-8
        ths = jnp.where(small, 1.0, th)
        A = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(ths) / ths)
        B = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(ths)) / (ths * ths))
        C = jnp.where(
            small, 1.0 / 6.0 - th2 / 120.0, (1.0 - A) / (ths * ths)
        )
        # R = I + A [w]x + B [w]x^2 ; V = I + B [w]x + C [w]x^2
        wx = [[0.0, -w2, w1], [w2, 0.0, -w0], [-w1, w0, 0.0]]
        wx2 = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for b in range(3):
                s = 0.0
                for c in range(3):
                    s = s + wx[a][c] * wx[c][b]
                wx2[a][b] = s
        Rn = [[None] * 3 for _ in range(3)]
        V = [[None] * 3 for _ in range(3)]
        for a in range(3):
            for b in range(3):
                eye = 1.0 if a == b else 0.0
                Rn[a][b] = eye + A * wx[a][b] + B * wx2[a][b]
                V[a][b] = eye + B * wx[a][b] + C * wx2[a][b]
        vvec = [v0_, v1_, v2_]
        tn = [None] * 3
        for a in range(3):
            s = 0.0
            for b in range(3):
                s = s + V[a][b] * vvec[b]
            tn[a] = s
        # pose_new = [Rn tn; 0 1] @ pose_old
        old = [[smem[4 * a + b] for b in range(4)] for a in range(3)]
        for a in range(3):
            for b in range(4):
                s = tn[a] if b == 3 else 0.0
                for c in range(3):
                    s = s + Rn[a][c] * old[c][b]
                smem[4 * a + b] = s
        smem[48] = nin
        smem[49] = smem[16 + 28]

    # Output written every step (cheap); meaningful after the last one.
    vals = [smem[k] for k in range(16)] + [smem[48], smem[49]]
    row = jnp.zeros((1, _LANES), jnp.float32)
    for k, v in enumerate(vals):
        row = row + jnp.where(iota == k, v, 0.0)
    out_ref[:] = row


@functools.partial(
    jax.jit,
    static_argnames=(
        "inner_n", "dist_thresh", "angle_thresh", "huber_delta", "damping",
        "min_valid", "interpret", "rgb_intr", "rgb_weight",
    ),
)
def gn_iterations(
    vmap_src_c: jnp.ndarray,  # (N, 3) source vertices, camera frame
    nmap_src_c: jnp.ndarray,  # (N, 3)
    q_w: jnp.ndarray,  # (N, 3) associated target vertices (world)
    n_t: jnp.ndarray,  # (N, 3) associated target normals (world)
    gate: jnp.ndarray,  # (N,) f32 pose-independent gate
    T_init: jnp.ndarray,  # (4, 4)
    *,
    inner_n: int,
    dist_thresh: float,
    angle_thresh: float,
    huber_delta: float,
    damping: float,
    min_valid: int,
    rgb=None,  # (i_src, i_tgt, gx_tgt, gy_tgt, rgb_gate), each (N,) f32
    T_pred_cw: jnp.ndarray | None = None,  # (4,4), required with rgb
    rgb_intr: tuple | None = None,  # (fx, fy) of the prediction view level
    rgb_weight: float = 0.0,
    interpret: bool = False,
):
    """Run `inner_n` fixed-correspondence GN steps fully in one kernel.

    Returns (T_out (4,4), inliers, res_sum) of the LAST iteration.  With
    `rgb`, the photometric term (targets gathered at association time)
    joins the geometric normal equations inside the same launch at weight
    `rgb_weight` — rgb_weight > 0 no longer leaves the fused path.
    """
    n = vmap_src_c.shape[0]
    rows = -(-n // _LANES)
    rows = -(-rows // _TILE_ROWS) * _TILE_ROWS
    use_rgb = rgb is not None
    planes = [
        _pad_plane(vmap_src_c[:, 0], rows), _pad_plane(vmap_src_c[:, 1], rows),
        _pad_plane(vmap_src_c[:, 2], rows),
        _pad_plane(nmap_src_c[:, 0], rows), _pad_plane(nmap_src_c[:, 1], rows),
        _pad_plane(nmap_src_c[:, 2], rows),
        _pad_plane(q_w[:, 0], rows), _pad_plane(q_w[:, 1], rows),
        _pad_plane(q_w[:, 2], rows),
        _pad_plane(n_t[:, 0], rows), _pad_plane(n_t[:, 1], rows),
        _pad_plane(n_t[:, 2], rows),
        _pad_plane(gate.astype(jnp.float32), rows),
    ]
    if use_rgb:
        planes += [_pad_plane(x.astype(jnp.float32), rows) for x in rgb]
    T_row = jnp.zeros((1, _LANES), jnp.float32).at[0, :16].set(
        T_init.reshape(-1)
    )
    if use_rgb:
        fx, fy = rgb_intr
        T_row = T_row.at[0, 32:44].set(
            jnp.concatenate(
                [T_pred_cw[:3, :3].reshape(-1), T_pred_cw[:3, 3]]
            )
        ).at[0, 44].set(fx).at[0, 45].set(fy)
    grid = (inner_n, rows // _TILE_ROWS)
    spec = pl.BlockSpec(
        (_TILE_ROWS, _LANES), lambda i, j: (j, 0), memory_space=pltpu.VMEM
    )
    tspec = pl.BlockSpec((1, _LANES), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _gn_kernel, inner_n=inner_n, dist_thresh=dist_thresh,
            angle_thresh=angle_thresh, huber_delta=huber_delta,
            damping=damping, min_valid=min_valid,
            use_rgb=use_rgb, rgb_weight=rgb_weight,
        ),
        grid=grid,
        in_specs=[spec] * len(planes) + [tspec],
        out_specs=tspec,
        out_shape=jax.ShapeDtypeStruct((1, _LANES), jnp.float32),
        scratch_shapes=[pltpu.SMEM((96,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(*planes, T_row)
    T_out = out[0, :16].reshape(4, 4)
    return T_out, out[0, 16], out[0, 17]


def _pad_plane(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    n = x.shape[0]
    pad = rows * _LANES - n
    return jnp.pad(x, (0, pad)).reshape(rows, _LANES)


@functools.partial(jax.jit, static_argnums=(4, 5))
def reduce_normal_equations(
    p_w: jnp.ndarray,  # (N,3) transformed source points (world)
    n_t: jnp.ndarray,  # (N,3) associated target normals
    q_w: jnp.ndarray,  # (N,3) associated target vertices
    mask: jnp.ndarray,  # (N,) f32 gate (0 = rejected)
    huber_delta: float = 0.0,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused (H6, b6, inliers, res_sum) from associated correspondences."""
    n = p_w.shape[0]
    rows = -(-n // _LANES)
    rows = -(-rows // _TILE_ROWS) * _TILE_ROWS  # multiple of the tile
    planes = [
        _pad_plane(p_w[:, 0], rows), _pad_plane(p_w[:, 1], rows),
        _pad_plane(p_w[:, 2], rows),
        _pad_plane(n_t[:, 0], rows), _pad_plane(n_t[:, 1], rows),
        _pad_plane(n_t[:, 2], rows),
        _pad_plane(q_w[:, 0], rows), _pad_plane(q_w[:, 1], rows),
        _pad_plane(q_w[:, 2], rows),
        _pad_plane(mask.astype(jnp.float32), rows),
    ]
    grid = rows // _TILE_ROWS
    spec = pl.BlockSpec(
        (_TILE_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(_kernel, huber_delta=huber_delta),
        grid=(grid,),
        in_specs=[spec] * 10,
        out_specs=pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 32), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 32), jnp.float32)],
        interpret=interpret,
    )(*planes)[0]

    H6 = jnp.zeros((6, 6), jnp.float32)
    k = 0
    for a in range(6):
        for b in range(a, 6):
            H6 = H6.at[a, b].set(out[k])
            H6 = H6.at[b, a].set(out[k])
            k += 1
    b6 = out[21:27]
    return H6, b6, out[27], out[28]
