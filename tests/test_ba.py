"""Pose-graph + Schur BA tests (SURVEY §5 geometry/property tests).

Synthetic worlds with known ground truth: noisy odometry chains must snap
back once loop edges are added; Schur BA must recover both poses and
landmarks; the sharded reduction must agree with the single-device one.
"""

import jax
import jax.numpy as jnp
import numpy as np

from instancefusion_tpu.geometry.se3 import se3_exp, se3_inverse
from instancefusion_tpu.ops import ba, ferns


def _circle_poses(m, radius=1.0):
    """Ground-truth keyframes on a circle, heading tangent."""
    ang = np.linspace(0, 2 * np.pi, m, endpoint=False)
    poses = []
    for a in ang:
        xi = np.zeros(6, np.float32)
        xi[:3] = [radius * np.cos(a), radius * np.sin(a), 0.0]
        xi[5] = a
        poses.append(np.asarray(se3_exp(jnp.asarray(xi))))
    return np.stack(poses)


def _chain_with_loop(m=24, noise=0.02, seed=0):
    rng = np.random.default_rng(seed)
    gt = _circle_poses(m)
    # Odometry: T_i^-1 T_j corrupted by noise -> integrated estimates drift.
    g = ba.empty_graph(2 * m)
    n_edges = jnp.zeros((), jnp.int32)
    est = [gt[0]]
    for i in range(m - 1):
        T_rel = np.asarray(se3_inverse(jnp.asarray(gt[i]))) @ gt[i + 1]
        xi_n = rng.normal(0, noise, 6).astype(np.float32)
        T_noisy = T_rel @ np.asarray(se3_exp(jnp.asarray(xi_n)))
        est.append(est[-1] @ T_noisy)
        g, n_edges = ba.add_edge(g, n_edges, i, i + 1, jnp.asarray(T_noisy))
    # Loop closures: exact relative poses, strongly weighted (verified ICP
    # edges carry far less noise than frame-to-frame odometry).
    for i, j in [(m - 1, 0), (m // 2, 0), (m // 4, 3 * m // 4)]:
        T_rel = np.asarray(se3_inverse(jnp.asarray(gt[i]))) @ gt[j]
        g, n_edges = ba.add_edge(g, n_edges, i, j, jnp.asarray(T_rel), 10.0)
    return gt, np.stack(est), g


def _trans_rmse(a, b):
    return float(np.sqrt(np.mean(np.sum((a[:, :3, 3] - b[:, :3, 3]) ** 2, -1))))


def test_pose_graph_closes_loop():
    gt, est, g = _chain_with_loop()
    err0 = _trans_rmse(est, gt)
    cost0 = float(jnp.sum(ba.pose_graph_residuals(jnp.asarray(est), g) ** 2))
    opt, cost = ba.optimize_pose_graph(jnp.asarray(est), g, iters=10)
    err1 = _trans_rmse(np.asarray(opt), gt)
    assert err0 > 0.05  # drift actually accumulated
    # Loop closure redistributes accumulated drift: large cost drop, ATE
    # improves toward the graph optimum (bounded by odometry noise).
    assert err1 < 0.6 * err0, (err0, err1)
    assert float(cost) < 0.05 * cost0


def test_pose_graph_noiseless_chain_stays_put():
    gt = _circle_poses(8)
    g = ba.empty_graph(16)
    n = jnp.zeros((), jnp.int32)
    for i in range(7):
        T_rel = np.asarray(se3_inverse(jnp.asarray(gt[i]))) @ gt[i + 1]
        g, n = ba.add_edge(g, n, i, i + 1, jnp.asarray(T_rel))
    opt, _ = ba.optimize_pose_graph(jnp.asarray(gt), g, iters=3)
    np.testing.assert_allclose(np.asarray(opt), gt, atol=5e-4)


def _ba_problem(m=6, L=40, noise_pose=0.05, noise_pt=0.05, seed=1):
    rng = np.random.default_rng(seed)
    gt_poses = _circle_poses(m, radius=0.5)
    gt_pts = rng.uniform(-1, 1, (L, 3)).astype(np.float32)
    gt_pts[:, 2] += 3.0  # in front of the rig
    ks, ls, zs = [], [], []
    for k in range(m):
        Ti = np.asarray(se3_inverse(jnp.asarray(gt_poses[k])))
        for l in range(L):
            z = Ti[:3, :3] @ gt_pts[l] + Ti[:3, 3]
            ks.append(k)
            ls.append(l)
            zs.append(z)
    obs = ba.BAObservations(
        k=jnp.asarray(ks, jnp.int32),
        l=jnp.asarray(ls, jnp.int32),
        z=jnp.asarray(np.stack(zs)),
        weight=jnp.ones((len(ks),)),
        valid=jnp.ones((len(ks),), bool),
    )
    noisy_poses = []
    for k in range(m):
        xi = np.zeros(6, np.float32) if k == 0 else rng.normal(
            0, noise_pose, 6
        ).astype(np.float32)
        noisy_poses.append(gt_poses[k] @ np.asarray(se3_exp(jnp.asarray(xi))))
    noisy_pts = gt_pts + rng.normal(0, noise_pt, gt_pts.shape).astype(np.float32)
    return gt_poses, gt_pts, np.stack(noisy_poses), noisy_pts, obs


def test_schur_ba_recovers_poses_and_points():
    gt_poses, gt_pts, noisy_poses, noisy_pts, obs = _ba_problem()
    e0 = _trans_rmse(noisy_poses, gt_poses)
    poses, pts, cost = ba.optimize_ba(
        jnp.asarray(noisy_poses), jnp.asarray(noisy_pts), obs, iters=8
    )
    e1 = _trans_rmse(np.asarray(poses), gt_poses)
    pt_err = float(np.sqrt(np.mean(np.sum((np.asarray(pts) - gt_pts) ** 2, -1))))
    assert e1 < 0.05 * e0, (e0, e1)
    assert pt_err < 0.01, pt_err


def test_ba_partials_sum_over_observation_shards():
    """The distributed contract: partials over a split observation set sum
    to the full partials (this is exactly what psum does on device)."""
    gt_poses, gt_pts, noisy_poses, noisy_pts, obs = _ba_problem(m=4, L=10)
    full = ba.ba_partials(jnp.asarray(noisy_poses), jnp.asarray(noisy_pts), obs)
    n = obs.k.shape[0]
    half = n // 2
    a = ba.BAObservations(*[x[:half] for x in obs])
    b = ba.BAObservations(*[x[half:] for x in obs])
    pa = ba.ba_partials(jnp.asarray(noisy_poses), jnp.asarray(noisy_pts), a)
    pb = ba.ba_partials(jnp.asarray(noisy_poses), jnp.asarray(noisy_pts), b)
    for f, x, y in zip(full, pa, pb):
        np.testing.assert_allclose(np.asarray(f), np.asarray(x) + np.asarray(y),
                                   rtol=1e-4, atol=1e-4)


def test_fern_retrieval():
    rng = jax.random.PRNGKey(0)
    h, w, F = 24, 32, 128
    coder = ferns.make_coder(rng, h, w, F)
    keys = jax.random.split(jax.random.PRNGKey(1), 8)
    frames = [
        (jax.random.uniform(k, (h, w, 3)), jax.random.uniform(k, (h, w)) * 4.0)
        for k in keys
    ]
    codes = jnp.stack([ferns.encode(coder, c, d) for c, d in frames])
    # Self-dissimilarity is 0; cross is large.
    self_d = ferns.dissimilarity(codes[3], codes)
    assert float(self_d[3]) == 0.0
    assert float(jnp.min(jnp.delete(self_d, 3, assume_unique_indices=True))) > 0.2
    # A mildly perturbed copy of frame 5 retrieves frame 5.
    c5, d5 = frames[5]
    c5n = jnp.clip(c5 + 0.03 * jax.random.normal(rng, c5.shape), 0, 1)
    q = ferns.encode(coder, c5n, d5)
    best, diss = ferns.find_best(q, codes, jnp.ones((8,), bool), jnp.int32(8))
    assert int(best) == 5
    assert float(diss) < 0.2


def _paired_problem(m=5, L=30, noise_pose=0.03, noise_pt=0.03, seed=2):
    """Random paired landmark set + noisy odometry chain (no loop edges)."""
    rng = np.random.default_rng(seed)
    gt = _circle_poses(m, radius=0.5)
    pts = rng.uniform(-1, 1, (L, 3)).astype(np.float32)
    pts[:, 2] += 3.0
    ka = rng.integers(0, m, L).astype(np.int32)
    kb = ((ka + 1 + rng.integers(0, m - 1, L)) % m).astype(np.int32)

    def cam(k, l):
        Ti = np.asarray(se3_inverse(jnp.asarray(gt[k])))
        return Ti[:3, :3] @ pts[l] + Ti[:3, 3]

    za = np.stack([cam(ka[l], l) for l in range(L)]).astype(np.float32)
    zb = np.stack([cam(kb[l], l) for l in range(L)]).astype(np.float32)
    pobs = ba.PairedObs(
        ka=jnp.asarray(ka), kb=jnp.asarray(kb),
        za=jnp.asarray(za), zb=jnp.asarray(zb),
        weight=jnp.ones((L,)), valid=jnp.ones((L,), bool),
    )
    g = ba.empty_graph(16)
    ne = jnp.zeros((), jnp.int32)
    noisy = [gt[0]]
    for i in range(m - 1):
        T_rel = np.asarray(se3_inverse(jnp.asarray(gt[i]))) @ gt[i + 1]
        Tn = T_rel @ np.asarray(
            se3_exp(jnp.asarray(rng.normal(0, noise_pose, 6).astype(np.float32)))
        )
        noisy.append(noisy[-1] @ Tn)
        g, ne = ba.add_edge(g, ne, i, i + 1, jnp.asarray(Tn))
    npts = pts + rng.normal(0, noise_pt, pts.shape).astype(np.float32)
    return gt, pts, np.stack(noisy), npts, pobs, g


def test_paired_hybrid_matches_generic_hybrid():
    """The O(L) paired Schur path is numerically the dense-Hpl golden."""
    gt, pts, noisy, npts, pobs, g = _paired_problem()
    gobs = ba.paired_to_generic(pobs)
    p1, x1, c1 = ba.optimize_hybrid(
        jnp.asarray(noisy), g, jnp.asarray(npts), gobs, iters=8
    )
    p2, x2, c2 = ba.optimize_hybrid_paired(
        jnp.asarray(noisy), g, jnp.asarray(npts), pobs, iters=8
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=2e-5)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=2e-5)
    np.testing.assert_allclose(float(c1), float(c2), rtol=1e-4)


def test_hybrid_beats_pose_graph_only():
    """Landmark observations add constraint directions a rigid odometry
    chain cannot carry: the joint solve recovers poses the pose-graph-only
    GN (which is happy with any drifted-but-consistent chain) cannot."""
    gt, pts, noisy, npts, pobs, g = _paired_problem()
    e0 = _trans_rmse(noisy, gt)
    pg_only, _ = ba.optimize_pose_graph(jnp.asarray(noisy), g, iters=8)
    e_pg = _trans_rmse(np.asarray(pg_only), gt)
    ph, xh, _ = ba.optimize_hybrid_paired(
        jnp.asarray(noisy), g, jnp.asarray(npts), pobs, iters=8
    )
    e_h = _trans_rmse(np.asarray(ph), gt)
    assert e_h < 0.7 * e_pg, (e0, e_pg, e_h)


def test_hybrid_empty_bank_degrades_to_pose_graph():
    """Zero valid observations -> exactly pose-graph GN."""
    gt, est, g = _chain_with_loop()
    pobs = ba.empty_paired_obs(64)
    pts = jnp.zeros((64, 3))
    ph, _, _ = ba.optimize_hybrid_paired(jnp.asarray(est), g, pts, pobs, iters=6)
    p_pg, _ = ba.optimize_pose_graph(jnp.asarray(est), g, iters=6)
    np.testing.assert_allclose(np.asarray(ph), np.asarray(p_pg), atol=1e-5)
