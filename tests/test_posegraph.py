"""Backend integration: keyframes + fern retrieval + ICP loop verification
+ pose-graph correction on the synthetic scene (config-4 structure).

Drift is injected into the keyframe odometry; the loop edge is *measured*
by ICP against the stored keyframe geometry (not taken from ground truth),
so this exercises the full detect -> verify -> optimize chain.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from instancefusion_tpu.config import PoseGraphConfig
from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.engine import posegraph as pg
from instancefusion_tpu.geometry.se3 import se3_exp, se3_inverse
from instancefusion_tpu.ops import preprocess
from tests.helpers import SMALL_CFG, SMALL_INTR

CFG = dataclasses.replace(
    SMALL_CFG,
    posegraph=PoseGraphConfig(max_keyframes=32, max_edges=64, fern_count=256,
                              ba_iters=10),
)


def _maps(frame):
    d = preprocess.clamp_depth(frame.depth, CFG.preprocess)
    pyr = preprocess.build_frame_pyramid(d, SMALL_INTR, CFG.preprocess, 1)
    return pyr[0]["vmap"], pyr[0]["nmap"]


def _out_and_back_poses(n):
    """A sweep that returns to (near) its start: loop closure material."""
    half = synthetic.orbit_trajectory(n // 2, sweep=1.2)
    fwd = np.asarray(half)
    back = fwd[::-1][1:]
    return np.concatenate([fwd, back], axis=0)


def test_backend_loop_closure_reduces_drift():
    rng = np.random.default_rng(0)
    gt = _out_and_back_poses(14)
    n = len(gt)
    bs = pg.allocate(CFG)

    # Drifted keyframe odometry: each relative pose gets a small bias.
    drift_xi = np.array([0.004, -0.003, 0.002, 0.002, -0.001, 0.003], np.float32)
    est = [gt[0]]
    for i in range(1, n):
        T_rel = np.asarray(se3_inverse(jnp.asarray(gt[i - 1]))) @ gt[i]
        T_noisy = T_rel @ np.asarray(se3_exp(jnp.asarray(drift_xi)))
        est.append(est[-1] @ T_noisy)
    est = np.stack(est)

    frames = [synthetic.render_frame(jnp.asarray(gt[i]), SMALL_INTR) for i in range(n)]
    for i in range(n):
        v, nm = _maps(frames[i])
        bs = pg.add_keyframe(bs, jnp.asarray(est[i]), frames[i].color,
                             frames[i].depth, v, nm)
    assert int(bs.kf.count) == n
    assert int(bs.n_edges) == n - 1

    # The last frame revisits the start: fern retrieval must find an early
    # keyframe, not a recent one.
    cand, diss = pg.detect_loop(bs, frames[-1].color, frames[-1].depth, min_gap=5)
    assert int(cand) <= 3, (int(cand), float(diss))
    assert float(diss) < 0.5

    # Verify by ICP against the stored keyframe maps; the measured relative
    # pose must match ground truth (both frames' geometry is exact).
    v, nm = _maps(frames[-1])
    T_rel, inliers, ok = pg.verify_loop(
        bs, cand, v, nm, SMALL_INTR, CFG, T_cur_wc=bs.kf.poses[int(cand)]
    )
    assert bool(ok), (float(inliers),)
    T_rel_gt = np.asarray(se3_inverse(jnp.asarray(gt[int(cand)]))) @ gt[-1]
    assert np.linalg.norm(np.asarray(T_rel)[:3, 3] - T_rel_gt[:3, 3]) < 0.02

    bs = pg.add_loop_edge(bs, cand, jnp.int32(n - 1), T_rel)
    assert int(bs.n_loops) == 1

    err0 = np.sqrt(np.mean(np.sum((est[:, :3, 3] - gt[:, :3, 3]) ** 2, -1)))
    bs, cost = pg.optimize(bs, CFG.posegraph)
    opt = np.asarray(bs.kf.poses[:n])
    err1 = np.sqrt(np.mean(np.sum((opt[:, :3, 3] - gt[:, :3, 3]) ** 2, -1)))
    assert err0 > 0.02  # drift was real
    assert err1 < 0.5 * err0, (err0, err1)


def test_landmark_ba_beats_pose_graph_on_noisy_loop_edge():
    """The VERDICT-mandated demonstration: with an imperfect verified loop
    edge (ICP noise injected), the joint pose-graph + landmark Schur BA
    recovers the trajectory measurably better than pose-graph GN alone —
    the landmark residuals re-measure the loop-pair geometry from raw
    correspondences instead of trusting one rigid edge."""
    rng = np.random.default_rng(3)
    gt = _out_and_back_poses(14)
    n = len(gt)
    bs = pg.allocate(CFG)

    drift_xi = np.array([0.004, -0.003, 0.002, 0.002, -0.001, 0.003], np.float32)
    est = [gt[0]]
    for i in range(1, n):
        T_rel = np.asarray(se3_inverse(jnp.asarray(gt[i - 1]))) @ gt[i]
        est.append(est[-1] @ T_rel @ np.asarray(se3_exp(jnp.asarray(drift_xi))))
    est = np.stack(est)

    frames = [synthetic.render_frame(jnp.asarray(gt[i]), SMALL_INTR) for i in range(n)]
    for i in range(n):
        v, nm = _maps(frames[i])
        bs = pg.add_keyframe(bs, jnp.asarray(est[i]), frames[i].color,
                             frames[i].depth, v, nm)

    # Ground-truth loop pair (last revisits first) with a NOISY measured
    # relative pose — simulating an imperfect ICP verification.
    cand = 0
    T_rel_gt = np.asarray(se3_inverse(jnp.asarray(gt[cand]))) @ gt[-1]
    noise = np.asarray(se3_exp(jnp.asarray(
        np.array([0.025, -0.02, 0.03, 0.012, -0.008, 0.01], np.float32)
    )))
    T_rel_noisy = jnp.asarray(T_rel_gt @ noise)
    bs = pg.add_loop_edge(bs, jnp.int32(cand), jnp.int32(n - 1), T_rel_noisy)

    # Pose-graph-only correction.
    bs_pg, _ = pg.optimize(bs, CFG.posegraph)
    err_pg = np.sqrt(np.mean(np.sum(
        (np.asarray(bs_pg.kf.poses[:n])[:, :3, 3] - gt[:, :3, 3]) ** 2, -1)))

    # Landmark BA through the SAME noisy relative pose (association only;
    # the measurements are the raw stored vertex maps).
    pts, obs = pg.build_loop_landmarks(
        bs, jnp.int32(cand), jnp.int32(n - 1), T_rel_noisy, SMALL_INTR, CFG
    )
    assert int(obs.valid.sum()) > 40, int(obs.valid.sum())
    bs_lm = pg.add_loop_landmarks(bs, pts, obs)
    assert int(bs_lm.n_points) == int(obs.valid.sum())
    bs_lm, _ = pg.optimize_landmark(bs_lm, CFG.posegraph)
    err_lm = np.sqrt(np.mean(np.sum(
        (np.asarray(bs_lm.kf.poses[:n])[:, :3, 3] - gt[:, :3, 3]) ** 2, -1)))

    err0 = np.sqrt(np.mean(np.sum((est[:, :3, 3] - gt[:, :3, 3]) ** 2, -1)))
    assert err_pg < err0  # pose graph does help...
    assert err_lm < 0.8 * err_pg, (err0, err_pg, err_lm)  # ...BA helps more


def test_decimated_min_valid():
    """Pin the loop-verification gate rescale: 2x the proportional
    pixel count at the decimated resolution (a falsely accepted loop at
    10x edge weight is far worse than a rejected one)."""
    # decim 4: 100 full-res pixels -> proportional 6.25 -> gate 12 (2x).
    assert pg.decimated_min_valid(100, 4) == 12
    assert pg.decimated_min_valid(100, 2) == 50
    assert pg.decimated_min_valid(100, 1) == 100  # no decimation: unchanged
    assert pg.decimated_min_valid(3, 8) >= 1  # never gates at zero
    # The invariant that matters: gate ~= 2x the proportional count.
    for mv, d in [(400, 4), (1000, 8), (64, 2)]:
        got = pg.decimated_min_valid(mv, d)
        proportional = mv / (d * d)
        assert 1.5 * proportional <= got <= 2.5 * proportional + 1, (mv, d, got)
