"""Absolute Trajectory Error (ATE) evaluation, TUM-benchmark style.

Reimplements the standard TUM RGB-D `evaluate_ate.py` protocol the
reference is validated with (SURVEY.md §5): rigid (Umeyama, no scale)
alignment of the estimated trajectory to ground truth, then RMSE over
translational residuals.  NumPy — host-side evaluation only.
"""

from __future__ import annotations

import numpy as np


def align_umeyama(est: np.ndarray, gt: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Least-squares rigid alignment est -> gt (no scale).

    est, gt: (N, 3). Returns (R, t) with gt ~ est @ R.T + t.
    """
    mu_e = est.mean(axis=0)
    mu_g = gt.mean(axis=0)
    E = est - mu_e
    G = gt - mu_g
    C = G.T @ E / len(est)
    U, _, Vt = np.linalg.svd(C)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    t = mu_g - R @ mu_e
    return R, t


def ate_rmse(est_poses: np.ndarray, gt_poses: np.ndarray) -> float:
    """ATE RMSE (meters) between pose arrays (N, 4, 4) after alignment."""
    est = np.asarray(est_poses)[:, :3, 3]
    gt = np.asarray(gt_poses)[:, :3, 3]
    R, t = align_umeyama(est, gt)
    aligned = est @ R.T + t
    err = aligned - gt
    return float(np.sqrt((err**2).sum(axis=1).mean()))


def rpe_rmse(est_poses: np.ndarray, gt_poses: np.ndarray, delta: int = 1) -> float:
    """Relative Pose Error (translational RMSE, meters) at frame delta."""
    est = np.asarray(est_poses)
    gt = np.asarray(gt_poses)
    errs = []
    for i in range(len(est) - delta):
        de = np.linalg.inv(est[i]) @ est[i + delta]
        dg = np.linalg.inv(gt[i]) @ gt[i + delta]
        rel = np.linalg.inv(dg) @ de
        errs.append(np.linalg.norm(rel[:3, 3]))
    return float(np.sqrt(np.mean(np.square(errs))))


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> quaternion (x, y, z, w), TUM trajectory order."""
    R = np.asarray(R, np.float64)
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2.0
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2.0
        q = np.zeros(4)
        q[i] = 0.25 * s
        q[j] = (R[j, i] + R[i, j]) / s
        q[k] = (R[k, i] + R[i, k]) / s
        w = (R[k, j] - R[j, k]) / s
        x, y, z = q[0], q[1], q[2]
    return np.array([x, y, z, w])
