"""Pallas kernels vs jnp goldens, interpret mode (SURVEY §5: kernel unit
tests run on the CPU backend with interpret=True so CI needs no TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from instancefusion_tpu.config import PreprocessConfig
from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.ops import icp as icp_jnp, preprocess as pp_jnp
from instancefusion_tpu.ops.pallas import icp as icp_pl, preprocess as pp_pl, tsdf as tsdf_pl
from instancefusion_tpu.geometry.se3 import se3_exp
from tests.helpers import SMALL_INTR

CFG = PreprocessConfig()


def _frame():
    return synthetic.render_frame(synthetic.orbit_trajectory(3)[1], SMALL_INTR)


def test_fused_preprocess_matches_jnp():
    f = _frame()
    df, vmap, nmap, valid = pp_pl.fused_preprocess(
        f.depth, SMALL_INTR, CFG, interpret=True
    )
    ref = pp_jnp.build_frame_pyramid(f.depth, SMALL_INTR, CFG, 1)[0]
    np.testing.assert_allclose(np.asarray(df), np.asarray(ref["depth"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vmap), np.asarray(ref["vmap"]),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(valid), np.asarray(ref["valid"]))
    v = np.asarray(valid)
    np.testing.assert_allclose(np.asarray(nmap)[v], np.asarray(ref["nmap"])[v],
                               atol=1e-3)


def test_icp_reduction_matches_jnp():
    rng = np.random.default_rng(0)
    n = 10_000
    p = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))
    nt = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))
    nt = nt / jnp.linalg.norm(nt, axis=-1, keepdims=True)
    q = p + jnp.asarray(rng.normal(0, 0.01, (n, 3)).astype(np.float32))
    m = jnp.asarray((rng.random(n) > 0.3).astype(np.float32))

    H, b, inl, rs = icp_pl.reduce_normal_equations(p, nt, q, m, interpret=True)

    r = jnp.sum(nt * (p - q), axis=-1)
    J = jnp.concatenate([nt, jnp.cross(p, nt)], axis=-1)
    Jm = J * m[:, None]
    H_ref = Jm.T @ Jm
    b_ref = -(Jm.T @ (r * m))
    np.testing.assert_allclose(np.asarray(H), np.asarray(H_ref), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref), rtol=2e-3, atol=2e-3)
    assert abs(float(inl) - float(m.sum())) < 1.0
    np.testing.assert_allclose(float(rs), float(jnp.sum(jnp.abs(r) * m)), rtol=1e-3)


def test_icp_reduction_feeds_solver():
    """End-to-end sanity: a known small transform is recovered from the
    Pallas-reduced normal equations."""
    rng = np.random.default_rng(1)
    n = 5_000
    q = jnp.asarray(rng.uniform(-1, 1, (n, 3)).astype(np.float32))
    nt = jnp.asarray(rng.normal(0, 1, (n, 3)).astype(np.float32))
    nt = nt / jnp.linalg.norm(nt, axis=-1, keepdims=True)
    xi_true = jnp.asarray([0.004, -0.002, 0.003, 0.002, -0.001, 0.0015])
    T = se3_exp(xi_true)
    p = q @ T[:3, :3].T + T[:3, 3]
    m = jnp.ones((n,))
    H, b, _, _ = icp_pl.reduce_normal_equations(p, nt, q, m, interpret=True)
    xi = jnp.linalg.solve(H + 1e-6 * jnp.eye(6), b)
    # Solving drives p back onto q: xi ~= -xi_true (left-composed).
    np.testing.assert_allclose(np.asarray(xi), -np.asarray(xi_true), atol=5e-4)


def test_fused_tsdf_update_matches_reference():
    rng = np.random.default_rng(2)
    k = 100
    sdf = jnp.asarray(rng.uniform(-1, 1, (k, 512)).astype(np.float32))
    w = jnp.asarray(rng.uniform(0, 30, (k, 512)).astype(np.float32))
    c = [jnp.asarray(rng.uniform(0, 1, (k, 512)).astype(np.float32)) for _ in range(3)]
    psi = jnp.asarray(rng.uniform(-1, 1, (k, 512)).astype(np.float32))
    wo = jnp.asarray((rng.random((k, 512)) > 0.5).astype(np.float32))
    o = [jnp.asarray(rng.uniform(0, 1, (k, 512)).astype(np.float32)) for _ in range(3)]

    # Packed [r | g | b] channel-segmented color rows (blocks.BlockMap).
    s2, w2, c2 = tsdf_pl.fused_tsdf_update(
        sdf, w, jnp.concatenate(c, axis=1), psi, wo,
        jnp.concatenate(o, axis=1), 64.0, True
    )
    denom = jnp.maximum(w + wo, 1e-6)
    sdf_ref = jnp.where(w + wo > 0, (sdf * w + psi * wo) / denom, sdf)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(sdf_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w2), np.asarray(jnp.minimum(w + wo, 64.0)),
                               rtol=1e-6)
    for ch in range(3):
        np.testing.assert_allclose(
            np.asarray(c2[:, ch * 512 : (ch + 1) * 512]),
            np.asarray((c[ch] * w + o[ch] * wo) / denom),
            rtol=1e-5, atol=1e-6)


def test_fused_label_vote_matches_boyer_moore():
    rng = np.random.default_rng(3)
    k = 40
    lab = jnp.asarray(rng.integers(-1, 5, (k, 512)).astype(np.int32))
    cnt = jnp.asarray(rng.integers(0, 4, (k, 512)).astype(np.float32))
    gid = jnp.asarray(rng.integers(0, 5, (k, 512)).astype(np.int32))
    obs = jnp.asarray((rng.random((k, 512)) > 0.4).astype(np.float32))

    l2, c2 = tsdf_pl.fused_label_vote(lab, cnt, gid, obs, True)

    ob = np.asarray(obs) > 0
    adopt = ob & (np.asarray(cnt) <= 0)
    same = ob & (np.asarray(lab) == np.asarray(gid)) & ~adopt
    other = ob & ~adopt & ~same
    l_ref = np.where(adopt, np.asarray(gid), np.asarray(lab))
    c_ref = np.where(adopt, 1.0, np.where(same, np.asarray(cnt) + 1,
                     np.where(other, np.asarray(cnt) - 1, np.asarray(cnt))))
    np.testing.assert_array_equal(np.asarray(l2), l_ref)
    np.testing.assert_allclose(np.asarray(c2), c_ref)


def test_engine_step_with_pallas_matches_jnp():
    """Two engine steps with every use_pallas flag on (interpret mode on
    CPU) vs the jnp engine: poses must agree to float tolerance."""
    import dataclasses

    from instancefusion_tpu.engine import slam
    from tests.helpers import SMALL_CFG, SMALL_TSDF

    base = dataclasses.replace(
        SMALL_CFG,
        map_kind="blocks",
        tsdf=dataclasses.replace(SMALL_TSDF, block_size=8, table_capacity=1728),
        icp=dataclasses.replace(SMALL_CFG.icp, iters=(4, 3, 3)),
    )
    pall = dataclasses.replace(
        base,
        icp=dataclasses.replace(base.icp, use_pallas=True),
        tsdf=dataclasses.replace(base.tsdf, use_pallas=True),
        preprocess=dataclasses.replace(base.preprocess, use_pallas=True),
    )
    poses = synthetic.orbit_trajectory(3)
    frames = [synthetic.render_frame(poses[i], SMALL_INTR) for i in range(2)]

    s_a = slam.init_state(base, poses[0])
    s_b = slam.init_state(pall, poses[0])
    for f in frames:
        s_a, info_a = slam.step(base, s_a, f.depth, f.color)
        s_b, info_b = slam.step(pall, s_b, f.depth, f.color)
    np.testing.assert_allclose(np.asarray(s_b.T_wc), np.asarray(s_a.T_wc),
                               atol=1e-4)
    assert abs(float(info_b.inliers) - float(info_a.inliers)) < 50


def test_fused_integrate_matches_jnp():
    """The Pallas fused integrate (association gather as MXU one-hot
    contractions) reproduces the jnp block update exactly: the one-hot
    matmul sums a single f32 product per voxel, so no tolerance beyond
    float round-off is needed."""
    import dataclasses

    from instancefusion_tpu.ops import blocks as blk
    from tests.helpers import SMALL_TSDF

    cfg = dataclasses.replace(
        SMALL_TSDF, block_size=8, table_capacity=1728, touched_capacity=64
    )
    poses = synthetic.orbit_trajectory(3)
    f0 = synthetic.render_frame(poses[0], SMALL_INTR)
    f1 = synthetic.render_frame(poses[1], SMALL_INTR)
    bm = blk.allocate(cfg)
    bm = blk.integrate(bm, f0.depth, f0.color, poses[0], SMALL_INTR, cfg)

    touched = blk.touched_blocks_mask(f1.depth, poses[1], SMALL_INTR, cfg)
    bm = blk.allocate_touched(bm, touched, cfg)
    slots, valid = blk.compact_touched_slots(bm, touched, cfg, 64)

    ref = blk.integrate_slots(
        bm, slots, valid, f1.depth, f1.color, poses[1], SMALL_INTR, cfg
    )
    sdf_rows, w_rows, color_rows, out_slots = tsdf_pl.fused_integrate(
        slots, valid, bm.block_coords, bm.sdf, bm.weight, bm.color,
        f1.depth, f1.color, poses[1], SMALL_INTR, cfg, interpret=True,
    )
    got_sdf = bm.sdf.at[out_slots].set(sdf_rows, mode="drop")
    got_w = bm.weight.at[out_slots].set(w_rows, mode="drop")
    got_c = bm.color.at[out_slots].set(color_rows, mode="drop")

    # The kernel skips blocks straddling the camera plane (no meaningful
    # projected window — documented divergence from the per-voxel jnp
    # golden); compare only rows the kernel commits to.
    from instancefusion_tpu.geometry.se3 import se3_inverse

    T_cw = np.asarray(se3_inverse(poses[1]))
    coords = np.asarray(bm.block_coords)[np.asarray(slots)]
    bsz = cfg.block_size * cfg.voxel_size
    corner = np.stack(
        [np.array([i // 4, (i // 2) % 2, i % 2], np.float32) for i in range(8)]
    )
    pw = np.array(cfg.origin) + (coords[:, None, :] + corner[None]) * bsz
    zmin = (pw @ T_cw[2, :3] + T_cw[2, 3]).min(1)
    committed = np.zeros(bm.sdf.shape[0], bool)
    committed[np.asarray(slots)[np.asarray(valid) & (zmin > 1e-3)]] = True
    keep_rows = ~np.zeros(bm.sdf.shape[0], bool)
    skipped = np.asarray(slots)[np.asarray(valid) & (zmin <= 1e-3)]
    keep_rows[skipped] = False
    assert committed.sum() > 16  # the scene must exercise real updates

    # Depth rides the one-hot contraction as an exact hi/lo bf16 split:
    # gathered depth reassembles to ~2^-17 relative, i.e. tens of um —
    # ~1e-4 in trunc-normalized SDF units at 5 m range.
    np.testing.assert_allclose(np.asarray(got_sdf)[keep_rows],
                               np.asarray(ref.sdf)[keep_rows], atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_w)[keep_rows],
                               np.asarray(ref.weight)[keep_rows], atol=1e-5)
    # Color association runs its one-hot contraction in bf16 (8-bit data).
    np.testing.assert_allclose(np.asarray(got_c)[keep_rows],
                               np.asarray(ref.color)[keep_rows], atol=5e-3)
    # The kernel must actually have fused something this frame.
    assert float(jnp.sum(np.asarray(got_w) != np.asarray(bm.weight))) > 0


def test_gather_target_maps_matches_flat_gather():
    """The MXU-factored association gather == flat per-lane gather + vertex
    reconstruction: the kernel gathers target DEPTH (exact hi/lo bf16
    split) and normals, reconstructs q_w = o + d * R K^-1 [ur, vr, 1], and
    derives validity from the gathered normal magnitude."""
    from instancefusion_tpu.geometry.se3 import se3_exp

    rng = np.random.RandomState(0)
    h, w = 48, 160
    fx = fy = 100.0
    cx, cy = (w - 1) / 2, (h - 1) / 2
    T_wc = se3_exp(jnp.asarray([0.1, -0.2, 0.05, 0.04, -0.03, 0.02]))
    tgt_ok = rng.rand(h, w) > 0.3
    tgt_d = (rng.uniform(0.5, 3.0, (h, w)) * tgt_ok).astype(np.float32)
    tgt_n = rng.randn(h, w, 3).astype(np.float32)
    tgt_n /= np.linalg.norm(tgt_n, axis=-1, keepdims=True)
    tgt_n *= tgt_ok[..., None]
    # The predicted-map invariant the kernel relies on:
    # vertex(i, j) = o + d(i, j) * R @ K^-1 [j, i, 1].
    vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    dirs = np.stack([(uu - cx) / fx, (vv - cy) / fy, np.ones_like(uu)], -1)
    R = np.asarray(T_wc)[:3, :3]
    o = np.asarray(T_wc)[:3, 3]
    tgt_v = o + tgt_d[..., None] * (dirs @ R.T)

    # Projections: smooth small offsets off the identity grid (same-image
    # association), plus some off-image and some invalid pixels.
    u = jnp.asarray(uu + rng.uniform(-3, 3, (h, w)).astype(np.float32))
    v = jnp.asarray(vv + rng.uniform(-3, 3, (h, w)).astype(np.float32))
    sel = jnp.asarray(rng.rand(h, w) > 0.1)
    in_img = (jnp.round(u) >= 0) & (jnp.round(u) < w) & \
             (jnp.round(v) >= 0) & (jnp.round(v) < h)
    sel = sel & in_img

    q, n, ok = icp_pl.gather_target_maps(
        u, v, sel, jnp.asarray(tgt_d), jnp.asarray(tgt_n), T_wc,
        (fx, fy, cx, cy), interpret=True,
    )

    ui = np.clip(np.round(np.asarray(u)).astype(int), 0, w - 1)
    vi = np.clip(np.round(np.asarray(v)).astype(int), 0, h - 1)
    q_ref = np.asarray(tgt_v)[vi, ui]
    n_ref = np.asarray(tgt_n)[vi, ui]
    ok_ref = tgt_ok[vi, ui] & np.asarray(sel)

    okn = np.asarray(ok)
    # Kernel validity is conservative (window-dropped pixels invalid) but
    # with +/-3 px offsets everything fits: sets must match.
    np.testing.assert_array_equal(okn, ok_ref)
    # Depth travels as an exact hi/lo bf16 split through the one-hot
    # contraction (~2^-17 relative); the reconstruction is plain f32 math.
    np.testing.assert_allclose(
        np.asarray(q)[okn], q_ref[okn], rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(n)[okn], n_ref[okn], atol=2e-2)


def test_gn_iterations_matches_jnp_inner_loop():
    """The whole-inner-loop GN kernel (linearize + 29-term reduce + damped
    Cholesky + exp update in SMEM) == the jnp fixed-correspondence loop."""
    from instancefusion_tpu.config import IcpConfig
    from instancefusion_tpu.geometry.se3 import se3_exp
    from instancefusion_tpu.ops import icp
    from instancefusion_tpu.ops.pallas.icp import gn_iterations

    key = jax.random.PRNGKey(3)
    n_pts = 8192
    q = jax.random.uniform(key, (n_pts, 3), minval=-1, maxval=1)
    nrm = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    T_true = se3_exp(jnp.array([0.02, -0.01, 0.03, 0.01, -0.02, 0.015]))
    R, t = T_true[:3, :3], T_true[:3, 3]
    v = (q - t) @ R  # source vertices in camera frame: R v + t == q
    nm = nrm @ R
    gate = jnp.ones((n_pts,), jnp.float32)
    cfg = IcpConfig(use_pallas=False, huber_delta=0.02)

    h_img = n_pts // 128
    v_img = v.reshape(h_img, 128, 3)
    n_img = nm.reshape(h_img, 128, 3)
    val = jnp.ones((h_img, 128), bool)
    Tc = jnp.eye(4, dtype=jnp.float32)
    for _ in range(3):
        H6, b6, nin, rsum = icp.reduce_equations(
            v_img, n_img, val, q, nrm, jnp.ones((n_pts,), bool), Tc, cfg
        )
        xi = icp.solve_increment(H6, b6, cfg)
        xi = jnp.where(nin >= cfg.min_valid, xi, jnp.zeros_like(xi))
        Tc = jnp.matmul(se3_exp(xi), Tc, precision=jax.lax.Precision.HIGHEST)

    T_got, nin_g, rsum_g = gn_iterations(
        v, nm, q, nrm, gate, jnp.eye(4, dtype=jnp.float32), inner_n=3,
        dist_thresh=cfg.dist_thresh, angle_thresh=cfg.angle_thresh,
        huber_delta=cfg.huber_delta, damping=cfg.damping,
        min_valid=cfg.min_valid, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(T_got), np.asarray(Tc), atol=5e-5)
    assert abs(float(nin_g) - n_pts) < 1
    # Converged onto the ground-truth perturbation.
    np.testing.assert_allclose(np.asarray(T_got), np.asarray(T_true), atol=5e-3)


def test_gather_target_maps_rgb_planes_match_flat_gather():
    """With tgt_rgb the association kernel also gathers the photometric
    targets (intensity as exact hi/lo bf16, gradients bf16) at the SAME
    rounded pixel as the geometric planes — vs a flat np gather."""
    from instancefusion_tpu.geometry.se3 import se3_exp

    rng = np.random.RandomState(3)
    h, w = 48, 160
    fx = fy = 100.0
    cx, cy = (w - 1) / 2, (h - 1) / 2
    T_wc = se3_exp(jnp.asarray([0.1, -0.2, 0.05, 0.04, -0.03, 0.02]))
    tgt_ok = rng.rand(h, w) > 0.3
    tgt_d = (rng.uniform(0.5, 3.0, (h, w)) * tgt_ok).astype(np.float32)
    tgt_n = rng.randn(h, w, 3).astype(np.float32)
    tgt_n /= np.linalg.norm(tgt_n, axis=-1, keepdims=True)
    tgt_n *= tgt_ok[..., None]
    ti = rng.rand(h, w).astype(np.float32)
    tgx = rng.uniform(-0.5, 0.5, (h, w)).astype(np.float32)
    tgy = rng.uniform(-0.5, 0.5, (h, w)).astype(np.float32)

    vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    u = jnp.asarray(uu + rng.uniform(-3, 3, (h, w)).astype(np.float32))
    v = jnp.asarray(vv + rng.uniform(-3, 3, (h, w)).astype(np.float32))
    sel = jnp.asarray(rng.rand(h, w) > 0.1)
    in_img = (jnp.round(u) >= 0) & (jnp.round(u) < w) & \
             (jnp.round(v) >= 0) & (jnp.round(v) < h)
    sel = sel & in_img

    _, _, ok, (i_g, gx_g, gy_g) = icp_pl.gather_target_maps(
        u, v, sel, jnp.asarray(tgt_d), jnp.asarray(tgt_n), T_wc,
        (fx, fy, cx, cy), interpret=True,
        tgt_rgb=(jnp.asarray(ti), jnp.asarray(tgx), jnp.asarray(tgy)),
    )

    ui = np.clip(np.round(np.asarray(u)).astype(int), 0, w - 1)
    vi = np.clip(np.round(np.asarray(v)).astype(int), 0, h - 1)
    okn = np.asarray(ok)
    # Intensity is an exact hi/lo split: tight tolerance.
    np.testing.assert_allclose(
        np.asarray(i_g)[okn], ti[vi, ui][okn], atol=2e-4
    )
    # Gradients travel single-pass bf16 (they only scale the Jacobian).
    np.testing.assert_allclose(
        np.asarray(gx_g)[okn], tgx[vi, ui][okn], atol=4e-3
    )
    np.testing.assert_allclose(
        np.asarray(gy_g)[okn], tgy[vi, ui][okn], atol=4e-3
    )


def test_gn_iterations_rgb_matches_jnp_inner_loop():
    """The fused GN kernel WITH the photometric term == the jnp
    fixed-correspondence loop (geometric + rgb joined in one system)."""
    from instancefusion_tpu.config import IcpConfig
    from instancefusion_tpu.geometry.camera import Intrinsics
    from instancefusion_tpu.geometry.se3 import se3_exp
    from instancefusion_tpu.ops import icp
    from instancefusion_tpu.ops.pallas.icp import gn_iterations

    key = jax.random.PRNGKey(4)
    n_pts = 4096
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    q = jax.random.uniform(k1, (n_pts, 3), minval=-1, maxval=1)
    q = q.at[:, 2].add(3.0)
    nrm = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    T_true = se3_exp(jnp.array([0.02, -0.01, 0.03, 0.01, -0.02, 0.015]))
    R, t = T_true[:3, :3], T_true[:3, 3]
    v = (q - t) @ R
    nm = nrm @ R
    gate = jnp.ones((n_pts,), jnp.float32)
    cfg = IcpConfig(use_pallas=False, huber_delta=0.02, rgb_weight=0.3)
    T_pred_cw = se3_exp(jnp.array([0.05, 0.02, -0.04, 0.03, 0.01, -0.02]))
    intr = Intrinsics(fx=200.0, fy=210.0, cx=63.5, cy=31.5, width=128, height=32)

    i_src = jax.random.uniform(k2, (n_pts,))
    i_t = i_src + 0.05 * jax.random.normal(k3, (n_pts,))
    gx_t = 0.1 * jax.random.normal(k4, (n_pts,))
    gy_t = 0.1 * jax.random.normal(k5, (n_pts,))
    rgb_ok = jnp.ones((n_pts,), bool)

    h_img = n_pts // 128
    v_img = v.reshape(h_img, 128, 3)
    n_img = nm.reshape(h_img, 128, 3)
    val = jnp.ones((h_img, 128), bool)
    i_img = i_src.reshape(h_img, 128)
    Tc = jnp.eye(4, dtype=jnp.float32)
    for _ in range(3):
        H6, b6, nin, rsum = icp.reduce_equations(
            v_img, n_img, val, q, nrm, jnp.ones((n_pts,), bool), Tc, cfg
        )
        Hr, br, _, _ = icp.reduce_rgb_equations(
            v_img, i_img, i_t, gx_t, gy_t, rgb_ok, Tc, T_pred_cw, intr
        )
        # Trust-fraction combine (matches icp.track and the kernel).
        wr = cfg.rgb_weight * jnp.trace(H6) / jnp.maximum(jnp.trace(Hr), 1e-20)
        H6 = H6 + wr * Hr
        b6 = b6 + wr * br
        xi = icp.solve_increment(H6, b6, cfg)
        xi = jnp.where(nin >= cfg.min_valid, xi, jnp.zeros_like(xi))
        Tc = jnp.matmul(se3_exp(xi), Tc, precision=jax.lax.Precision.HIGHEST)

    T_got, nin_g, _ = gn_iterations(
        v, nm, q, nrm, gate, jnp.eye(4, dtype=jnp.float32), inner_n=3,
        dist_thresh=cfg.dist_thresh, angle_thresh=cfg.angle_thresh,
        huber_delta=cfg.huber_delta, damping=cfg.damping,
        min_valid=cfg.min_valid,
        rgb=(i_src, i_t, gx_t, gy_t, rgb_ok.astype(jnp.float32)),
        T_pred_cw=T_pred_cw, rgb_intr=(intr.fx, intr.fy),
        rgb_weight=cfg.rgb_weight, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(T_got), np.asarray(Tc), atol=5e-5)
    assert abs(float(nin_g) - n_pts) < 1


def _binned_scene():
    import dataclasses

    from instancefusion_tpu.datasets import synthetic
    from instancefusion_tpu.ops import blocks as blk
    from tests.helpers import SMALL_INTR, SMALL_TSDF

    cfg = dataclasses.replace(
        SMALL_TSDF, block_size=8, table_capacity=1728, group_capacity=128
    )
    poses = synthetic.orbit_trajectory(3)
    bm = blk.allocate(cfg)
    f = None
    for i in range(2):
        f = synthetic.render_frame(poses[i], SMALL_INTR)
        bm = blk.integrate(bm, f.depth, f.color, f.T_wc, SMALL_INTR, cfg)
    return cfg, bm, f, SMALL_INTR


def test_frustum_groups_binned_partitions_exactly():
    """The binned lists are disjoint and their union is frustum_groups'."""
    from instancefusion_tpu.ops import blocks as blk

    cfg, bm, f, intr = _binned_scene()
    kg = 128
    gids, gv = blk.frustum_groups(bm, f.T_wc, intr, cfg, 0.2, 4.0, kg)
    gs, rvs, gl, rvl = blk.frustum_groups_binned(
        bm, f.T_wc, intr, cfg, 0.2, 4.0, kg, kg, th_small=64, rmax=3
    )
    fill = cfg.table_capacity // 8 - 1
    all_g = set(np.asarray(gids)[np.asarray(gv).any(1)].tolist())
    s_g = set(np.asarray(gs)[np.asarray(rvs).any(1)].tolist())
    l_g = set(np.asarray(gl)[np.asarray(rvl).any(1)].tolist())
    assert s_g | l_g == all_g
    assert not (s_g & l_g)
    assert len(s_g) > 0  # the common case actually hits the small bin
    # Row-validity agrees per group.
    rv_all = {int(g): v for g, v in zip(np.asarray(gids), np.asarray(gv))}
    for g, v in list(zip(np.asarray(gs), np.asarray(rvs))) + list(
        zip(np.asarray(gl), np.asarray(rvl))
    ):
        if int(g) != fill and v.any():
            np.testing.assert_array_equal(v, rv_all[int(g)])


def test_binned_splat_accumulators_sum_exactly():
    """Rendering disjoint footprint bins separately and summing the raw
    scatter-add planes == the single-call kernel (interpret mode)."""
    from instancefusion_tpu.ops import blocks as blk
    from instancefusion_tpu.ops.pallas.raycast import splat_depth_groups

    cfg, bm, f, intr = _binned_scene()
    kg = 128
    gids, gv = blk.frustum_groups(bm, f.T_wc, intr, cfg, 0.2, 4.0, kg)
    gs, rvs, gl, rvl = blk.frustum_groups_binned(
        bm, f.T_wc, intr, cfg, 0.2, 4.0, kg, kg, th_small=64, rmax=3
    )
    kw = dict(with_color=True, depth_prior=None, rmax=3, raw=True,
              interpret=True)
    full = splat_depth_groups(
        gids, gv, bm.block_coords, bm.sdf, bm.weight, bm.color,
        f.T_wc, intr, cfg, **kw,
    )
    small = splat_depth_groups(
        gs, rvs, bm.block_coords, bm.sdf, bm.weight, bm.color,
        f.T_wc, intr, cfg, th=64, **kw,
    )
    large = splat_depth_groups(
        gl, rvl, bm.block_coords, bm.sdf, bm.weight, bm.color,
        f.T_wc, intr, cfg, **kw,
    )
    for a, b, c in zip(full, small, large):
        np.testing.assert_allclose(
            np.asarray(b) + np.asarray(c), np.asarray(a), rtol=1e-5, atol=1e-6
        )


def test_binned_integrate_matches_single_call():
    """Sequential in-place integrate over disjoint bins == one call over
    the union (interpret mode, th variants)."""
    from instancefusion_tpu.ops import blocks as blk
    from instancefusion_tpu.ops.pallas.tsdf import fused_integrate_groups

    cfg, bm, f, intr = _binned_scene()
    kg = 128
    gids, gv = blk.frustum_groups(bm, f.T_wc, intr, cfg, 0.2, 4.0, kg)
    gs, rvs, gl, rvl = blk.frustum_groups_binned(
        bm, f.T_wc, intr, cfg, 0.2, 4.0, kg, kg, th_small=64, rmax=3
    )
    one = fused_integrate_groups(
        gids, gv, bm.block_coords, bm.sdf, bm.weight, bm.color,
        f.depth, f.color, f.T_wc, intr, cfg, interpret=True,
    )
    sdf, w, col = bm.sdf, bm.weight, bm.color
    for g, rv, th in ((gs, rvs, 64), (gl, rvl, None)):
        sdf, w, col = fused_integrate_groups(
            g, rv, bm.block_coords, sdf, w, col,
            f.depth, f.color, f.T_wc, intr, cfg, interpret=True, th=th,
        )
    np.testing.assert_allclose(np.asarray(sdf), np.asarray(one[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), np.asarray(one[1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(col), np.asarray(one[2]), atol=1e-6)
