import jax
import jax.numpy as jnp
import numpy as np

from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.engine import slam
from instancefusion_tpu.utils.ate import ate_rmse, rpe_rmse
from tests.helpers import SMALL_CFG, SMALL_INTR, SMALL_TSDF  # noqa: F401


def test_engine_end_to_end_synthetic():
    """Golden end-to-end (SURVEY §5): run the full engine on a synthetic
    sweep and assert the tracked trajectory's ATE against ground truth."""
    n = 20
    poses_gt = synthetic.orbit_trajectory(n)
    frames = [synthetic.render_frame(poses_gt[i], SMALL_INTR) for i in range(n)]

    cfg = SMALL_CFG
    state = slam.init_state(cfg, frames[0].T_wc)
    est = []
    infos = []
    for f in frames:
        state, info = slam.step(cfg, state, f.depth, f.color)
        est.append(np.asarray(state.T_wc))
        infos.append(info)

    # Tracking engaged from frame 1 onward.
    assert all(bool(i.track_ok) for i in infos)
    assert float(infos[-1].inliers) > 1000

    ate = ate_rmse(np.stack(est), np.asarray(poses_gt))
    rpe = rpe_rmse(np.stack(est), np.asarray(poses_gt))
    # Sub-voxel global accuracy on this short sweep (voxel = 4 cm).
    assert ate < SMALL_TSDF.voxel_size, ate
    assert rpe < 0.5 * SMALL_TSDF.voxel_size, rpe


def test_engine_first_frame_bootstraps():
    cfg = SMALL_CFG
    f = synthetic.render_frame(synthetic.orbit_trajectory(3)[1], SMALL_INTR)
    state = slam.init_state(cfg, f.T_wc)
    state, info = slam.step(cfg, state, f.depth, f.color)
    # Frame 0: no prediction yet -> tracking gate passes via bootstrap.
    assert bool(info.track_ok)
    assert float(info.fused_voxels) > 0
    # Prediction now exists for frame 1.
    assert bool(jnp.any(state.pred.valid))
    assert int(state.frame_idx) == 1


def test_engine_lost_tracking_counter():
    cfg = SMALL_CFG
    f = synthetic.render_frame(synthetic.orbit_trajectory(3)[1], SMALL_INTR)
    state = slam.init_state(cfg, f.T_wc)
    state, _ = slam.step(cfg, state, f.depth, f.color)
    # Feed garbage (all-invalid depth): tracking must fail, pose must hold.
    T_before = np.asarray(state.T_wc)
    state, info = slam.step(cfg, state, jnp.zeros_like(f.depth), f.color)
    assert not bool(info.track_ok)
    assert int(state.lost_frames) == 1
    np.testing.assert_allclose(np.asarray(state.T_wc), T_before)


def test_engine_blocks_end_to_end():
    """Same golden end-to-end as the dense engine, on the sparse block map
    (config-2 structure at test scale)."""
    import dataclasses

    from tests.helpers import SMALL_CFG, SMALL_TSDF

    cfg = dataclasses.replace(
        SMALL_CFG,
        map_kind="blocks",
        tsdf=dataclasses.replace(SMALL_TSDF, block_size=8, table_capacity=1728),
    )
    n = 12
    poses_gt = synthetic.orbit_trajectory(n)
    frames = [synthetic.render_frame(poses_gt[i], SMALL_INTR) for i in range(n)]
    state = slam.init_state(cfg, frames[0].T_wc)
    est = []
    for f in frames:
        state, info = slam.step(cfg, state, f.depth, f.color)
        est.append(np.asarray(state.T_wc))
    assert bool(info.track_ok)
    ate = ate_rmse(np.stack(est), np.asarray(poses_gt)[:n])
    assert ate < cfg.tsdf.voxel_size, ate
    assert int(state.volume.overflow) == 0
    assert int(state.volume.n_active) > 100


def test_engine_blocks_fast_raycast_paths():
    """depth-prior bounded march + screen-space normals (the TPU fast
    paths) must track as accurately as the full-sweep raycast."""
    import dataclasses

    from instancefusion_tpu.config import RaycastConfig

    base = dataclasses.replace(
        SMALL_CFG,
        map_kind="blocks",
        tsdf=dataclasses.replace(SMALL_TSDF, block_size=8, table_capacity=1728),
    )
    fast = dataclasses.replace(
        base,
        raycast=RaycastConfig(near=0.2, far=4.0, use_depth_prior=True,
                              screen_space_normals=True),
    )
    n = 10
    poses_gt = synthetic.orbit_trajectory(n)
    frames = [synthetic.render_frame(poses_gt[i], SMALL_INTR) for i in range(n)]
    est = {"base": [], "fast": []}
    for key, cfg in (("base", base), ("fast", fast)):
        state = slam.init_state(cfg, frames[0].T_wc)
        for f in frames:
            state, info = slam.step(cfg, state, f.depth, f.color)
            est[key].append(np.asarray(state.T_wc))
        assert bool(info.track_ok), key
    ate_base = ate_rmse(np.stack(est["base"]), np.asarray(poses_gt))
    ate_fast = ate_rmse(np.stack(est["fast"]), np.asarray(poses_gt))
    assert ate_fast < max(2.0 * ate_base, 0.5 * SMALL_TSDF.voxel_size), (
        ate_base, ate_fast
    )


def test_run_chunk_matches_sequential_steps():
    """lax.scan chunk replay == K sequential steps (same poses/map)."""
    import dataclasses

    cfg = dataclasses.replace(SMALL_CFG, map_kind="blocks")
    poses = synthetic.orbit_trajectory(6)
    frames = [synthetic.render_frame(p, cfg.intrinsics) for p in poses]

    s_seq = slam.init_state(cfg, poses[0])
    for f in frames:
        s_seq, _ = slam.step(cfg, s_seq, f.depth, f.color)

    s_chunk = slam.init_state(cfg, poses[0])
    depths = jnp.stack([f.depth for f in frames])
    colors = jnp.stack([f.color for f in frames])
    s_chunk, infos = slam.run_chunk(cfg, s_chunk, depths, colors)

    # The two drivers are separately compiled XLA programs: fusion-order
    # float differences flip a handful of association-boundary pixels
    # (nearest-pixel rounding), nudging each GN solve at the last ulp;
    # over 6 frames the poses agree to ~1e-4 (rotation entries), not 1e-5.
    np.testing.assert_allclose(
        np.asarray(s_chunk.T_wc), np.asarray(s_seq.T_wc), atol=2e-4
    )
    assert int(s_chunk.volume.n_active) == int(s_seq.volume.n_active)
    # The two drivers are separate XLA programs; rounding-level ICP pose
    # differences shift the measurement band by a hair, so a few band-edge
    # blocks allocate in one run and not the other.  Demand agreement on
    # all but a sliver of the voxel space.
    a = np.asarray(s_chunk.volume.sdf)
    b = np.asarray(s_seq.volume.sdf)
    frac = np.mean(~np.isclose(a, b, atol=1e-3))
    assert frac < 0.005, frac
    assert infos.track_ok.shape == (6,)


def test_sensor_noise_model():
    """The Kinect-class corruption: z^2-growing sigma, 1/5000 m
    quantization, edge + salt dropout — and GT poses untouched."""
    f = synthetic.render_frame(synthetic.orbit_trajectory(3)[1], SMALL_INTR)
    nf = synthetic.add_sensor_noise(f, jax.random.PRNGKey(7))
    d0 = np.asarray(f.depth)
    d1 = np.asarray(nf.depth)
    valid0, valid1 = d0 > 0, d1 > 0
    # Dropout only removes pixels, never invents them.
    assert not (valid1 & ~valid0).any()
    dropped = (valid0 & ~valid1).mean()
    assert 0.001 < dropped < 0.2, dropped
    # Quantized to the TUM 16-bit scale.
    q = d1[valid1] * 5000.0
    np.testing.assert_allclose(q, np.round(q), atol=1e-2)
    # Noise grows with depth: far-pixel std > near-pixel std.
    both = valid0 & valid1
    err = np.abs(d1 - d0)[both]
    z = d0[both]
    near = err[z < np.median(z)]
    far = err[z >= np.median(z)]
    assert far.std() > 1.5 * near.std(), (near.std(), far.std())


def test_engine_noisy_aggressive_ate():
    """Accuracy gate on data that stresses the tracker (r3 VERDICT Weak
    #1): fr1-class handheld motion (up to ~5 cm / ~4 deg per frame) with
    the Kinect noise model.  The engine must hold tracking on every frame
    and keep ATE under a voxel."""
    import dataclasses

    from instancefusion_tpu.config import RaycastConfig

    cfg = dataclasses.replace(
        SMALL_CFG,
        map_kind="blocks",
        tsdf=dataclasses.replace(SMALL_TSDF, block_size=8, table_capacity=1728),
        raycast=RaycastConfig(near=0.2, far=4.0, use_depth_prior=True,
                              screen_space_normals=True),
        icp=dataclasses.replace(SMALL_CFG.icp, vel_seed=0.8),
    )
    n = 24
    poses_gt = np.asarray(synthetic.handheld_trajectory(n))
    frames = list(synthetic.make_noisy_sequence(n, SMALL_INTR, seed=0))
    state = slam.init_state(cfg, frames[0].T_wc)
    est, ok = [], []
    for f in frames:
        state, info = slam.step(cfg, state, f.depth, f.color)
        est.append(np.asarray(state.T_wc))
        ok.append(bool(info.track_ok))
    assert all(ok), np.mean(ok)
    ate = ate_rmse(np.stack(est), poses_gt)
    assert ate < 0.8 * SMALL_TSDF.voxel_size, ate


def test_consistency_sentinel_quiet_then_fires_on_map_drag():
    """Map-consistency sentinel (SURVEY §6; the drift the health gate is
    blind to): on an honest run the frame-to-frame vs frame-to-model
    disagreement EWMA stays near zero; when the model prediction drags (a
    biased map pulling the solver — simulated by shifting the predicted
    maps a constant 4 mm between frames) the EWMA integrates the bias and
    the alarm fires, while inliers stay high (the gate itself never
    trips)."""
    import dataclasses

    import jax.numpy as jnp

    # The default threshold is calibrated for the VGA rig; this tiny
    # camera's f2f check is far noisier, so the test pins its own
    # operating point on the fr1-calibrated handheld rig (measured,
    # deterministic on CPU: quiet EWMA peaks 7.8 mm during map settling,
    # the dragged run spikes to 61 mm).  The test is about the
    # MECHANISM: quiet << drag while the per-frame gate stays blind.
    cfg = dataclasses.replace(
        SMALL_CFG, consistency_check=True, consistency_thresh=0.004,
        consistency_alpha=0.25,
    )
    n = 30
    poses = [
        np.asarray(p) for p in synthetic.handheld_trajectory(n)
    ]
    frames = [synthetic.render_frame(poses[i], SMALL_INTR) for i in range(n)]

    # Honest run: sentinel quiet on every frame.
    state = slam.init_state(cfg, poses[0])
    for f in frames:
        state, info = slam.step(cfg, state, f.depth, f.color)
        assert info.drift_alarm is not None
        assert not bool(info.drift_alarm), float(info.drift_ewma)
    quiet = float(info.drift_ewma)

    # Dragging map: shift the prediction 8 mm every frame before the
    # solve.  Frame-to-model follows the drag; frame-to-frame does not.
    state = slam.init_state(cfg, poses[0])
    drag = jnp.asarray([0.008, 0.0, 0.0], jnp.float32)
    fired = False
    for i, f in enumerate(frames):
        if i > 1:
            pred = state.pred._replace(
                vertex_w=state.pred.vertex_w + drag * state.pred.valid[..., None]
            )
            state = state._replace(pred=pred)
        state, info = slam.step(cfg, state, f.depth, f.color)
        fired = fired or bool(info.drift_alarm)
    assert fired, (float(info.drift_ewma), quiet)
