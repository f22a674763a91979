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

    # Wipe shard 1's rows: a lost host loses its payload entirely, so both
    # planes reset — sdf to the UNOBSERVED sentinel (what the raycaster
    # samples; weights are never gathered on the sampling path) and weight
    # to zero (what integrate/clean consult).
    cl = sh.sdf.shape[0] // NSHARDS
    w = np.array(sh.weight)
    s = np.array(sh.sdf)
    w[cl : 2 * cl] = 0.0
    s[cl : 2 * cl] = blocks.UNOBSERVED
    sh_broken = sh._replace(weight=jnp.asarray(w), sdf=jnp.asarray(s))
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


def test_reshard_migrates_rows_to_slab_owners(mesh):
    """all_to_all re-sharding (SURVEY §6): a map whose rows all sit on
    shard 0 — exactly what loading a single-process checkpoint onto an
    S-shard mesh produces — migrates every row to its slab owner and then
    behaves identically to a natively-sharded map."""
    from instancefusion_tpu.geometry.camera import Intrinsics

    tiny = Intrinsics(fx=64.6, fy=64.5, cx=39.5, cy=29.5, width=80, height=60)
    f = synthetic.render_frame(synthetic.orbit_trajectory(2)[0], tiny)
    single = blocks.integrate(
        blocks.allocate(CFG), f.depth, f.color, f.T_wc, tiny, CFG
    )
    cl = CFG.table_capacity // NSHARDS
    n0 = int(single.n_active)
    assert 0 < n0 <= cl, n0

    # Pack everything into shard 0's slot range (gslot == local slot there).
    sh0 = shard.ShardedBlockMap(
        directory=single.directory,
        block_coords=single.block_coords[: CFG.table_capacity],
        n_active=jnp.array([n0] + [0] * (NSHARDS - 1), jnp.int32),
        overflow=jnp.zeros((NSHARDS,), jnp.int32),
        sdf=single.sdf[: CFG.table_capacity],
        weight=single.weight[: CFG.table_capacity],
        color=single.color[: CFG.table_capacity],
        cuts=shard.uniform_cuts(CFG, NSHARDS),
    )
    bm, _, migrated, leftover = shard.reshard(sh0, mesh, CFG, migrate_cap=cl)
    assert int(leftover.sum()) == 0
    assert int(migrated.sum()) > 0
    assert int(bm.n_active.sum()) == n0
    assert int(bm.overflow.sum()) == 0

    # Every live row now sits in its owner's slot range.
    nb = CFG.grid_size // CFG.block_size
    coords = np.asarray(bm.block_coords)
    nact = np.asarray(bm.n_active)
    for s in range(NSHARDS):
        rows = coords[s * cl : s * cl + nact[s]]
        owners = np.clip(rows[:, 0] // (nb // NSHARDS), 0, NSHARDS - 1)
        assert (owners == s).all()

    # Directory-addressed contents unchanged.
    sdir = np.asarray(single.directory).reshape(-1)
    hdir = np.asarray(bm.directory).reshape(-1)
    sel = np.nonzero(sdir >= 0)[0]
    np.testing.assert_array_equal(hdir >= 0, sdir >= 0)
    np.testing.assert_allclose(
        np.asarray(bm.sdf)[hdir[sel]], np.asarray(single.sdf)[sdir[sel]],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(bm.weight)[hdir[sel]], np.asarray(single.weight)[sdir[sel]],
        atol=1e-6,
    )

    # The resharded map raycasts like the single-device golden.
    ms = blocks.raycast(single, f.T_wc, tiny, CFG, RC)
    mh = shard.raycast(bm, f.T_wc, mesh, tiny, CFG, RC)
    both = np.asarray(ms.valid) & np.asarray(mh.valid)
    assert both.sum() / max(np.asarray(ms.valid).sum(), 1) > 0.97
    np.testing.assert_allclose(
        np.asarray(mh.depth)[both], np.asarray(ms.depth)[both], atol=2e-3
    )

    # Small migrate_cap drains over repeated rounds.
    bm2, _, _, left = shard.reshard(sh0, mesh, CFG, migrate_cap=32)
    rounds = 1
    while int(left.sum()) > 0:
        bm2, _, _, left = shard.reshard(bm2, mesh, CFG, migrate_cap=32)
        rounds += 1
        assert rounds < 32
    assert int(bm2.n_active.sum()) == n0
    np.testing.assert_array_equal(
        np.asarray(bm2.directory) >= 0, np.asarray(single.directory) >= 0
    )


def test_sharded_label_voting_matches_single(mesh):
    """Distributed label voting (BASELINE: masks fused into the *sharded*
    volume): per-voxel votes on sharded rows match the single-device
    ops/labels golden, and the pmax-composited predicted-id image matches
    the single-device nearest-label sampling."""
    from instancefusion_tpu.geometry.camera import Intrinsics
    from instancefusion_tpu.ops import labels

    tiny = Intrinsics(fx=64.6, fy=64.5, cx=39.5, cy=29.5, width=80, height=60)
    f = synthetic.render_frame(synthetic.orbit_trajectory(2)[0], tiny)
    single = blocks.integrate(
        blocks.allocate(CFG), f.depth, f.color, f.T_wc, tiny, CFG
    )
    sh = shard.integrate(
        shard.allocate(CFG, NSHARDS), f.depth, f.color, f.T_wc, mesh, tiny, CFG
    )

    # Two instance ids split left/right across the image.
    half = jnp.arange(tiny.width)[None, :] < tiny.width // 2
    gid = jnp.where(f.depth > 0, jnp.where(half, 3, 11), -1).astype(jnp.int32)

    v0 = labels.fuse(
        labels.allocate(CFG), single, gid, f.depth, f.T_wc, tiny, CFG
    )
    vh = shard.fuse_labels(
        shard.allocate_votes(CFG, NSHARDS), sh, gid, f.depth, f.T_wc,
        mesh, tiny, CFG,
    )
    n0 = int(jnp.sum((v0.count > 0) & (v0.label >= 0)))
    assert n0 > 500

    # Directory-addressed vote planes identical.
    sdir = np.asarray(single.directory).reshape(-1)
    hdir = np.asarray(sh.directory).reshape(-1)
    sel = np.nonzero(sdir >= 0)[0]
    np.testing.assert_array_equal(
        np.asarray(vh.label)[hdir[sel]], np.asarray(v0.label)[sdir[sel]]
    )
    np.testing.assert_allclose(
        np.asarray(vh.count)[hdir[sel]], np.asarray(v0.count)[sdir[sel]],
        atol=1e-6,
    )

    # Predicted-id image: sharded pmax composite vs single-device lookup.
    maps = blocks.raycast(single, f.T_wc, tiny, CFG, RC)
    g0 = labels.sample_nearest(v0, single, maps.vertex_w, maps.valid, CFG)
    gh = shard.sample_labels(vh, sh, maps.vertex_w, maps.valid, mesh, CFG)
    np.testing.assert_array_equal(np.asarray(gh), np.asarray(g0))


def test_dp_and_tp_segmentation_match_single(mesh):
    """DP (batch-sharded) and TP (channel-sharded params) segmentation
    produce the single-device result (SURVEY §3.2)."""
    import jax

    from instancefusion_tpu.models import parallel as mpar, segmentation as seg

    h, w, nc, k, width = 48, 64, 8, 8, 16
    params = seg.init_params(jax.random.PRNGKey(0), h, w, nc, width=width)
    rng = jax.random.PRNGKey(1)
    rgb = jax.random.uniform(rng, (NSHARDS, h, w, 3))

    single = [seg.segment(params, rgb[i], nc, k, width) for i in range(NSHARDS)]

    dp = mpar.dp_segment_fn(mesh, nc, k, width)
    out = dp(params, rgb)
    for i in range(NSHARDS):
        np.testing.assert_array_equal(
            np.asarray(out.mask_id[i]), np.asarray(single[i].mask_id)
        )
        np.testing.assert_array_equal(
            np.asarray(out.classes[i]), np.asarray(single[i].classes)
        )

    shard_params, tp = mpar.tp_segment_fn(mesh, nc, k, width)
    p_tp = shard_params(params)
    got = tp(p_tp, rgb[0])
    np.testing.assert_array_equal(
        np.asarray(got.mask_id), np.asarray(single[0].mask_id)
    )
    np.testing.assert_allclose(
        np.asarray(got.scores), np.asarray(single[0].scores), atol=1e-4
    )


def test_sharded_paired_terms_match_single(mesh):
    """The distributed paired-Schur reducer: psum'd S/rhs/cost equal the
    single-device terms, and the full hybrid solve through the sharded
    terms_fn matches the unsharded solve."""
    from tests.test_ba import _paired_problem

    gt, pts, noisy, npts, pobs, g = _paired_problem(m=5, L=32)
    poses = jnp.asarray(noisy)
    points = jnp.asarray(npts)

    S0, rhs0, _, _, _, _, c0 = ba.paired_terms(poses, points, pobs)
    terms = shard.sharded_paired_terms(mesh)
    S1, rhs1, Hll_inv1, Wa1, Wb1, bl1, c1 = terms(poses, points, pobs)
    np.testing.assert_allclose(np.asarray(S1), np.asarray(S0), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rhs1), np.asarray(rhs0), atol=1e-5)
    np.testing.assert_allclose(float(c1), float(c0), rtol=1e-5)
    assert Hll_inv1.shape == (32, 3, 3)  # landmark-aligned leaves intact

    p0, x0, _ = ba.optimize_hybrid_paired(poses, g, points, pobs, iters=6)
    p1, x1, _ = ba.optimize_hybrid_paired(
        poses, g, points, pobs, iters=6, terms_fn=terms
    )
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), atol=1e-4)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=1e-4)


def test_sharded_splat_fast_path_matches_single(mesh):
    """The fused fast path (list-based replicated allocation + slot
    integrate + per-shard splat + pmin composite) tracks the single-chip
    splat engine: same trajectory (sub-voxel), same allocation set modulo
    pose-divergence boundary blocks."""
    from instancefusion_tpu.config import RaycastConfig as RC_
    from instancefusion_tpu.engine import slam, slam_sharded
    from tests.helpers import SMALL_CFG

    cfg = dataclasses.replace(
        SMALL_CFG,
        map_kind="blocks",
        tsdf=dataclasses.replace(CFG, touched_capacity=512),
        raycast=RC_(near=0.2, far=4.0, use_depth_prior=True,
                    screen_space_normals=True, use_splat=True, splat_rmax=3),
    )
    n = 6
    poses_gt = synthetic.orbit_trajectory(n)
    frames = [synthetic.render_frame(poses_gt[i], SMALL_INTR) for i in range(n)]
    s1 = slam.init_state(cfg, frames[0].T_wc)
    s2 = slam_sharded.init_state(cfg, mesh, frames[0].T_wc)
    step2 = slam_sharded.make_step(cfg, mesh, donate=True)
    for f in frames:
        s1, i1 = slam.step(cfg, s1, f.depth, f.color)
        s2, i2 = step2(s2, f.depth, f.color)
        assert bool(i2.track_ok)
    # Trajectories agree to well under a voxel.
    assert float(jnp.max(jnp.abs(s1.T_wc - s2.T_wc))) < 0.5 * CFG.voxel_size
    # Same allocation set modulo a few boundary blocks from the tiny pose
    # divergence between the two engines' band sampling.
    d1 = np.asarray(s1.volume.directory) >= 0
    d2 = np.asarray(s2.volume.directory) >= 0
    assert (d1 != d2).sum() <= 0.02 * d1.sum() + 2, (d1.sum(), d2.sum())
    # The composited prediction has comparable coverage.
    v1 = int(s1.pred.valid.sum())
    v2 = int(s2.pred.valid.sum())
    assert abs(v1 - v2) < 0.1 * max(v1, v2), (v1, v2)
    # Payload rows spread over shards (not all on one).
    counts = np.asarray(s2.volume.n_active)
    assert (counts > 0).sum() >= 2, counts


def test_sharded_clean_matches_single(mesh):
    """Sharded hygiene (SURVEY §6 / VERDICT r4 Missing #2): per-shard row
    culling + compaction matches blocks.clean on the same map — same
    surviving block set, same directory-addressed contents."""
    frames = _frames(2)
    single = blocks.allocate(CFG)
    sh = shard.allocate(CFG, NSHARDS)
    for f in frames:
        single = blocks.integrate(single, f.depth, f.color, f.T_wc, SMALL_INTR, CFG)
        sh = shard.integrate(sh, f.depth, f.color, f.T_wc, mesh, SMALL_INTR, CFG)

    # min_weight=1.5 culls the single-observation fringe rows (frame 2
    # only partially overlaps frame 1), exercising real culling.
    s_out, _ = blocks.clean(single, CFG, min_weight=1.5)
    h_out, _ = shard.clean(sh, mesh, CFG, min_weight=1.5)
    assert int(s_out.n_active) < int(single.n_active)  # something culled
    np.testing.assert_array_equal(
        np.asarray(s_out.directory) >= 0, np.asarray(h_out.directory) >= 0
    )
    assert int(h_out.n_active.sum()) == int(s_out.n_active)

    sdir = np.asarray(s_out.directory).reshape(-1)
    hdir = np.asarray(h_out.directory).reshape(-1)
    sel = np.nonzero(sdir >= 0)[0]
    np.testing.assert_allclose(
        np.asarray(h_out.sdf)[hdir[sel]], np.asarray(s_out.sdf)[sdir[sel]],
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(h_out.weight)[hdir[sel]], np.asarray(s_out.weight)[sdir[sel]],
        atol=1e-6,
    )


def test_sharded_streaming_evict_admit_roundtrip(mesh):
    """Sharded active-window streaming: every shard evicts its own cold
    rows to the host store; admission re-appends each row on its slab
    owner, bit-exact."""
    from instancefusion_tpu.engine.streaming import ShardedBlockStreamer

    frames = _frames(2)
    sh = shard.allocate(CFG, NSHARDS)
    for f in frames:
        sh = shard.integrate(sh, f.depth, f.color, f.T_wc, mesh, SMALL_INTR, CFG)
    n0 = int(sh.n_active.sum())
    assert n0 > 20

    def rows_by_coord(bm):
        coords = np.asarray(bm.block_coords)
        sdf = np.asarray(bm.sdf)
        w = np.asarray(bm.weight)
        out = {}
        for i in range(coords.shape[0]):
            if coords[i, 0] >= 0:
                out[tuple(coords[i])] = (sdf[i], w[i])
        return out

    golden = rows_by_coord(sh)
    streamer = ShardedBlockStreamer(
        CFG, mesh, radius=0.4, evict_cap=512, admit_cap=512
    )
    far = np.array([50.0, 50.0, 50.0], np.float32)
    vol, _, _, n_out = streamer.evict(sh, None, far)
    assert n_out == n0
    assert int(vol.n_active.sum()) == 0
    assert len(streamer.store) == n0
    assert int(jnp.sum(vol.directory >= 0)) == 0

    # Save/load the store (the evict/resume invariant), then re-admit.
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "store.npz")
        streamer.save(path)
        streamer.store = {}
        streamer.load(path)
    streamer.radius = 1e9
    vol, _, _, n_in = streamer.admit(vol, None, np.zeros(3, np.float32))
    assert n_in == n0
    assert len(streamer.store) == 0
    assert int(vol.n_active.sum()) == n0
    got = rows_by_coord(vol)
    assert set(got) == set(golden)
    for k in golden:
        np.testing.assert_array_equal(golden[k][0], got[k][0])
        np.testing.assert_array_equal(golden[k][1], got[k][1])
    # Every re-admitted row landed on its cuts-owner shard.
    cl = CFG.table_capacity // NSHARDS
    coords = np.asarray(vol.block_coords)
    nact = np.asarray(vol.n_active)
    cuts = np.asarray(vol.cuts)
    for s in range(NSHARDS):
        rows = coords[s * cl : s * cl + nact[s]]
        owners = np.searchsorted(cuts, rows[:, 0], side="right")
        assert (owners == s).all()


def test_reshard_policy_rebalances_skew(mesh):
    """The reshard POLICY (VERDICT r4 Missing #1): a camera dwelling in a
    few x-slabs skews per-shard occupancy; occupancy-balanced cuts + the
    all_to_all drain drop the max blocks/shard while the map stays
    bit-equal (same directory set, same directory-addressed contents)."""
    f = _frames(1)[0]
    sh = shard.allocate(CFG, NSHARDS)
    sh = shard.integrate(sh, f.depth, f.color, f.T_wc, mesh, SMALL_INTR, CFG)
    counts0 = np.asarray(sh.n_active)
    assert counts0.max() > 1.2 * counts0.mean(), counts0  # genuinely skewed

    before = {
        "dirset": np.asarray(sh.directory) >= 0,
        "n": int(sh.n_active.sum()),
    }
    sdir = np.asarray(sh.directory).reshape(-1)
    sel = np.nonzero(sdir >= 0)[0]
    sdf_before = np.asarray(sh.sdf)[sdir[sel]]

    sh = sh._replace(cuts=shard.balanced_cuts(sh.directory, CFG, NSHARDS))
    moved = 0
    for _ in range(8):
        sh, _, migrated, leftover = shard.reshard(sh, mesh, CFG, migrate_cap=64)
        moved += int(migrated.sum())
        if int(leftover.sum()) == 0:
            break
    assert int(leftover.sum()) == 0
    assert moved > 0
    counts1 = np.asarray(sh.n_active)
    assert counts1.max() < counts0.max(), (counts0, counts1)
    assert int(sh.n_active.sum()) == before["n"]
    np.testing.assert_array_equal(
        np.asarray(sh.directory) >= 0, before["dirset"]
    )
    hdir = np.asarray(sh.directory).reshape(-1)
    np.testing.assert_allclose(
        np.asarray(sh.sdf)[hdir[sel]], sdf_before, atol=1e-6
    )


def test_sharded_run_chunk_matches_stepping(mesh):
    """slam_sharded.make_run_chunk (lax.scan replay, one dispatch per K
    frames) == K sequential make_step calls: same pose, same occupancy,
    same prediction."""
    from instancefusion_tpu.config import (
        EngineConfig, IcpConfig, PreprocessConfig,
        RaycastConfig as RC_, TsdfConfig as TC_,
    )
    from instancefusion_tpu.engine import slam_sharded

    ecfg = EngineConfig(
        intrinsics=SMALL_INTR,
        tsdf=dataclasses.replace(CFG, table_capacity=4096, touched_capacity=512),
        icp=IcpConfig(iters=(6, 4, 4), min_valid=60, rgb_weight=0.0),
        raycast=RC_(near=0.2, far=4.0, use_depth_prior=True,
                    screen_space_normals=True, use_splat=True, splat_rmax=3),
        preprocess=PreprocessConfig(),
        map_kind="blocks", num_shards=NSHARDS,
    )
    frames = _frames(3)
    s_ref = slam_sharded.init_state(ecfg, mesh, frames[0].T_wc)
    step = slam_sharded.make_step(ecfg, mesh)
    for f in frames:
        s_ref, _ = step(s_ref, f.depth, f.color)

    s_chk = slam_sharded.init_state(ecfg, mesh, frames[0].T_wc)
    run_chunk = slam_sharded.make_run_chunk(ecfg, mesh)
    depths = jnp.stack([f.depth for f in frames])
    colors = jnp.stack([f.color for f in frames])
    s_chk, infos = run_chunk(s_chk, depths, colors)

    np.testing.assert_allclose(
        np.asarray(s_chk.T_wc), np.asarray(s_ref.T_wc), atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(s_chk.volume.n_active), np.asarray(s_ref.volume.n_active)
    )
    np.testing.assert_allclose(
        np.asarray(s_chk.pred.depth), np.asarray(s_ref.pred.depth), atol=1e-4
    )
    assert infos.track_ok.shape == (3,)
