import jax
import jax.numpy as jnp
import numpy as np

from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.ops import raycast as rc
from instancefusion_tpu.ops import tsdf
from tests.helpers import SMALL_CFG, SMALL_INTR, SMALL_TSDF


def make_pose(eye=(0.0, -0.9, 1.1)):
    poses = synthetic.orbit_trajectory(3)
    return poses[1]


def test_integrate_updates_near_surface_only():
    vol = tsdf.allocate(SMALL_TSDF)
    T = make_pose()
    frame = synthetic.render_frame(T, SMALL_INTR)
    vol2 = tsdf.integrate(vol, frame.depth, frame.color, T, SMALL_INTR, SMALL_TSDF)
    w = np.asarray(vol2.weight)
    assert w.max() == 1.0
    assert 0 < (w > 0).sum() < w.size  # some but not all voxels touched
    # Weights only where the projective SDF was within the band.
    s = np.asarray(vol2.sdf)
    assert np.all(s[w > 0] >= -1.0 - 1e-6) and np.all(s[w > 0] <= 1.0 + 1e-6)


def test_integrate_weight_saturates():
    cfg = SMALL_TSDF._replace(max_weight=3.0) if hasattr(SMALL_TSDF, "_replace") else SMALL_TSDF
    import dataclasses

    cfg = dataclasses.replace(SMALL_TSDF, max_weight=3.0)
    vol = tsdf.allocate(cfg)
    T = make_pose()
    frame = synthetic.render_frame(T, SMALL_INTR)
    for _ in range(5):
        vol = tsdf.integrate(vol, frame.depth, frame.color, T, SMALL_INTR, cfg)
    assert np.asarray(vol.weight).max() <= 3.0 + 1e-6


def test_trilinear_sample_matches_grid_at_centers():
    vol = tsdf.allocate(SMALL_TSDF)
    # Fill with a linear SDF field f(p) = p_z - 1.0 (normalized by trunc).
    coords = tsdf.voxel_world_coords(SMALL_TSDF)
    lin = jnp.clip((coords[..., 2] - 1.0) / SMALL_TSDF.trunc, -1, 1)
    vol = vol._replace(sdf=lin, weight=jnp.ones_like(lin))
    pts = coords[10:20, 10:20, 10:20].reshape(-1, 3)
    s, valid = tsdf.sample_trilinear(vol, pts, SMALL_TSDF)
    assert np.asarray(valid).all()
    expected = np.clip((np.asarray(pts[:, 2]) - 1.0) / SMALL_TSDF.trunc, -1, 1)
    np.testing.assert_allclose(np.asarray(s), expected, atol=1e-4)


def test_integrate_then_raycast_roundtrip():
    """Golden geometry test: fuse synthetic frames, raycast back, compare
    the raycast depth against the exact analytic depth."""
    vol = tsdf.allocate(SMALL_TSDF)
    poses = synthetic.orbit_trajectory(5)
    frames = [synthetic.render_frame(poses[i], SMALL_INTR) for i in range(5)]
    for f in frames:
        vol = tsdf.integrate(vol, f.depth, f.color, f.T_wc, SMALL_INTR, SMALL_TSDF)
    maps = rc.raycast(vol, poses[2], SMALL_INTR, SMALL_TSDF, SMALL_CFG.raycast)
    valid = np.asarray(maps.valid) & (np.asarray(frames[2].depth) > 0)
    assert valid.mean() > 0.5  # most pixels hit
    err = np.abs(np.asarray(maps.depth) - np.asarray(frames[2].depth))[valid]
    # Sub-voxel median accuracy (voxel = 4 cm).
    assert np.median(err) < SMALL_TSDF.voxel_size
    assert np.percentile(err, 90) < 3 * SMALL_TSDF.voxel_size


def test_raycast_normals_unit_and_outward():
    vol = tsdf.allocate(SMALL_TSDF)
    poses = synthetic.orbit_trajectory(3)
    f = synthetic.render_frame(poses[1], SMALL_INTR)
    for _ in range(2):
        vol = tsdf.integrate(vol, f.depth, f.color, f.T_wc, SMALL_INTR, SMALL_TSDF)
    maps = rc.raycast(vol, poses[1], SMALL_INTR, SMALL_TSDF, SMALL_CFG.raycast)
    n = np.asarray(maps.normal_w)
    valid = np.asarray(maps.valid)
    norms = np.linalg.norm(n[valid], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    # Normals should face the camera: n . (eye - p) > 0 for most pixels.
    eye = np.asarray(poses[1][:3, 3])
    to_cam = eye - np.asarray(maps.vertex_w)[valid]
    to_cam /= np.linalg.norm(to_cam, axis=-1, keepdims=True)
    frac_facing = (np.sum(n[valid] * to_cam, axis=-1) > 0).mean()
    assert frac_facing > 0.95
