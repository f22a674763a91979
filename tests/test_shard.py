"""Distributed layer tests on the 8-device CPU mesh (SURVEY §5).

The sharded block map must agree with the single-device block map (its
golden), the halo exchange must heal slab seams, and the psum'd BA
reductions must match their unsharded counterparts bit-for-bit-ish.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancefusion_tpu.config import RaycastConfig, TsdfConfig
from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.ops import ba, blocks
from instancefusion_tpu.parallel import mesh as meshmod, shard
from tests.helpers import SMALL_INTR
from tests.test_ba import _ba_problem, _chain_with_loop

NSHARDS = 4

CFG = TsdfConfig(
    voxel_size=0.04,
    trunc=0.12,
    grid_size=96,  # Nb=12 blocks per axis; 4 shards x 3-block slabs
    origin=(-1.92, -1.92, -0.4),
    block_size=8,
    table_capacity=1728,
)
RC = RaycastConfig(near=0.2, far=4.0)


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= NSHARDS
    return meshmod.make_mesh(NSHARDS)


def _frames(n=2):
    poses = synthetic.orbit_trajectory(max(n, 2))
    return [synthetic.render_frame(poses[i], SMALL_INTR) for i in range(n)]


def test_sharded_integrate_matches_single(mesh):
    frames = _frames(2)
    single = blocks.allocate(CFG)
    sh = shard.allocate(CFG, NSHARDS)
    for f in frames:
        single = blocks.integrate(single, f.depth, f.color, f.T_wc, SMALL_INTR, CFG)
        sh = shard.integrate(sh, f.depth, f.color, f.T_wc, mesh, SMALL_INTR, CFG)

    # Same set of allocated blocks.
    ds = np.asarray(single.directory) >= 0
    dh = np.asarray(sh.directory) >= 0
    np.testing.assert_array_equal(ds, dh)
    assert int(sh.n_active.sum()) == int(single.n_active)
    assert int(sh.overflow.sum()) == 0

    # Same voxel contents: compare via directory lookups.
    nb = CFG.grid_size // CFG.block_size
    sdir = np.asarray(single.directory).reshape(-1)
    hdir = np.asarray(sh.directory).reshape(-1)
    ssdf = np.asarray(single.sdf)
    hsdf = np.asarray(sh.sdf)
    sw = np.asarray(single.weight)
    hw = np.asarray(sh.weight)
    sel = np.nonzero(sdir >= 0)[0]
    np.testing.assert_allclose(hw[hdir[sel]], sw[sdir[sel]], atol=1e-5)
    np.testing.assert_allclose(hsdf[hdir[sel]], ssdf[sdir[sel]], atol=1e-4)


def test_sharded_raycast_matches_single(mesh):
    # Tiny camera: the shard_map raycast compile on 4 virtual CPU devices
    # dominates test time, and resolution is irrelevant to seam healing.
    from instancefusion_tpu.geometry.camera import Intrinsics

    tiny = Intrinsics(fx=64.6, fy=64.5, cx=39.5, cy=29.5, width=80, height=60)
    f = synthetic.render_frame(synthetic.orbit_trajectory(2)[0], tiny)
    single = blocks.integrate(
        blocks.allocate(CFG), f.depth, f.color, f.T_wc, tiny, CFG
    )
    sh = shard.integrate(
        shard.allocate(CFG, NSHARDS), f.depth, f.color, f.T_wc, mesh, tiny, CFG
    )
    ms = blocks.raycast(single, f.T_wc, tiny, CFG, RC)
    mh = shard.raycast(sh, f.T_wc, mesh, tiny, CFG, RC)
    vs = np.asarray(ms.valid)
    vh = np.asarray(mh.valid)
    both = vs & vh
    # Halo exchange heals slab seams: nearly all single-map hits survive.
    assert both.sum() / max(vs.sum(), 1) > 0.97, (both.sum(), vs.sum())
    np.testing.assert_allclose(
        np.asarray(mh.depth)[both], np.asarray(ms.depth)[both], atol=2e-3
    )
    cos = np.sum(np.asarray(mh.normal_w)[both] * np.asarray(ms.normal_w)[both], -1)
    assert np.median(cos) > 0.999


def test_sharded_pose_graph_matches_single(mesh):
    gt, est, g = _chain_with_loop()
    H0, b0, c0 = ba.pose_graph_normal_eqs(jnp.asarray(est), g)
    # Shard the edge set (capacity is divisible by NSHARDS).
    H1, b1, c1 = shard.sharded_pose_graph_normal_eqs(mesh, jnp.asarray(est), g)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(b0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(c1), float(c0), rtol=1e-5)


def test_sharded_schur_ba_matches_single(mesh):
    gt_poses, gt_pts, noisy_poses, noisy_pts, obs = _ba_problem(m=4, L=8)
    # Pad observations to a shard-divisible count (invalid rows are inert).
    n = obs.k.shape[0]
    pad = (-n) % NSHARDS
    obs = ba.BAObservations(
        k=jnp.pad(obs.k, (0, pad)),
        l=jnp.pad(obs.l, (0, pad)),
        z=jnp.pad(obs.z, ((0, pad), (0, 0))),
        weight=jnp.pad(obs.weight, (0, pad)),
        valid=jnp.pad(obs.valid, (0, pad)),
    )
    p0, x0, c0 = ba.optimize_ba(
        jnp.asarray(noisy_poses), jnp.asarray(noisy_pts), obs, iters=4
    )
    p1, x1, c1 = ba.optimize_ba(
        jnp.asarray(noisy_poses), jnp.asarray(noisy_pts), obs, iters=4,
        partials_fn=shard.sharded_ba_partials(mesh),
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=1e-4)


def test_fault_injection_shard_loss_degrades_gracefully(mesh):
    """SURVEY §6 fault injection: wipe one shard's payload (host loss) —
    compositing must stay finite, surviving shards keep their surface, and
    the wiped slab simply disappears (recovery = checkpoint restore,
    exercised in tests/test_pipeline.py)."""
    from instancefusion_tpu.geometry.camera import Intrinsics

    tiny = Intrinsics(fx=64.6, fy=64.5, cx=39.5, cy=29.5, width=80, height=60)
    f = synthetic.render_frame(synthetic.orbit_trajectory(2)[0], tiny)
    sh = shard.integrate(
        shard.allocate(CFG, NSHARDS), f.depth, f.color, f.T_wc, mesh, tiny, CFG
    )
    healthy = shard.raycast(sh, f.T_wc, mesh, tiny, CFG, RC)
    n_healthy = int(healthy.valid.sum())
    assert n_healthy > 500

    # Wipe shard 1's rows (weights to zero = unobserved).
    cl = sh.sdf.shape[0] // NSHARDS
    w = np.array(sh.weight)
    w[cl : 2 * cl] = 0.0
    sh_broken = sh._replace(weight=jnp.asarray(w))
    broken = shard.raycast(sh_broken, f.T_wc, mesh, tiny, CFG, RC)
    n_broken = int(broken.valid.sum())
    assert np.isfinite(np.asarray(broken.depth)).all()
    assert 0 < n_broken < n_healthy
    # Pixels that survive agree with the healthy map.
    both = np.asarray(broken.valid) & np.asarray(healthy.valid)
    np.testing.assert_allclose(
        np.asarray(broken.depth)[both], np.asarray(healthy.depth)[both],
        atol=5e-3,
    )
