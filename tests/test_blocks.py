"""Block-sparse TSDF map vs the dense golden reference (SURVEY §5).

The block map must agree with `ops/tsdf.py` on allocated space: same
integration math, same trilinear samples, same raycast surfaces; plus the
sparse-only behaviors (allocation, capacity overflow, empty-space skip).
"""

import jax.numpy as jnp
import numpy as np

from instancefusion_tpu.config import RaycastConfig, TsdfConfig
from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.ops import blocks, raycast as rc_dense, tsdf
from tests.helpers import SMALL_INTR

CFG = TsdfConfig(
    voxel_size=0.04,
    trunc=0.12,
    grid_size=96,
    origin=(-1.92, -1.92, -0.4),
    block_size=8,
    table_capacity=1728,  # 12^3 = full grid fits: no overflow in goldens
)
RC = RaycastConfig(near=0.2, far=4.0)


def _frame():
    T = synthetic.orbit_trajectory(3)[1]
    return synthetic.render_frame(T, SMALL_INTR)


def _integrate_both(n_frames=1):
    poses = synthetic.orbit_trajectory(max(n_frames, 2))
    dense = tsdf.allocate(CFG)
    bm = blocks.allocate(CFG)
    for i in range(n_frames):
        f = synthetic.render_frame(poses[i], SMALL_INTR)
        dense = tsdf.integrate(dense, f.depth, f.color, f.T_wc, SMALL_INTR, CFG)
        bm = blocks.integrate(bm, f.depth, f.color, f.T_wc, SMALL_INTR, CFG)
    return dense, bm, poses


def _dense_of_blocks(bm):
    """Expand the block map to a dense volume for whole-grid comparison."""
    n = CFG.grid_size
    b = CFG.block_size
    nb = n // b
    sdf = np.ones((n, n, n), np.float32)
    w = np.zeros((n, n, n), np.float32)
    directory = np.asarray(bm.directory)
    bs = np.asarray(bm.sdf).reshape(-1, b, b, b)
    bw = np.asarray(bm.weight).reshape(-1, b, b, b)
    for bi in range(nb):
        for bj in range(nb):
            for bk in range(nb):
                s = directory[bi, bj, bk]
                if s >= 0:
                    sl = np.s_[
                        bi * b : (bi + 1) * b,
                        bj * b : (bj + 1) * b,
                        bk * b : (bk + 1) * b,
                    ]
                    sdf[sl] = bs[s]
                    w[sl] = bw[s]
    return sdf, w


def test_integrate_matches_dense_on_allocated():
    dense, bm, _ = _integrate_both(2)
    bsdf, bwgt = _dense_of_blocks(bm)
    dw = np.asarray(dense.weight)
    ds = np.asarray(dense.sdf)
    obs = bwgt > 0
    assert obs.sum() > 10000
    # The block map only integrates the truncation band; the dense golden
    # additionally carves free space (psi=1 updates in front of the
    # surface).  Invariants:
    # 1. The block map never updates a voxel the dense pass skipped.
    assert np.all(bwgt <= dw + 1e-5)
    # 2. Where both saw the same number of observations, values match
    #    exactly (same math, same order).
    same = obs & (np.abs(bwgt - dw) < 1e-5)
    assert same.sum() / obs.sum() > 0.95
    np.testing.assert_allclose(bsdf[same], ds[same], rtol=1e-4, atol=1e-4)
    # 3. Voxels where counts differ are free-space/band-edge (dense sdf
    #    near +1), never near the surface.
    diff = obs & ~same
    if diff.sum():
        assert np.min(ds[diff]) > 0.5
    # The block map must cover (at least) every dense voxel observed within
    # the truncation band interior — spot-check: dense voxels with |sdf|<0.5
    # and weight>0 are allocated in the block map.
    interior = (dw > 0) & (np.abs(np.asarray(dense.sdf)) < 0.5)
    covered = obs & interior
    assert covered.sum() / max(interior.sum(), 1) > 0.98


def test_allocation_grows_and_is_idempotent():
    f = _frame()
    bm = blocks.allocate(CFG)
    bm1 = blocks.integrate(bm, f.depth, f.color, f.T_wc, SMALL_INTR, CFG)
    n1 = int(bm1.n_active)
    assert n1 > 50
    assert int(bm1.overflow) == 0
    # Same frame again: no new blocks.
    bm2 = blocks.integrate(bm1, f.depth, f.color, f.T_wc, SMALL_INTR, CFG)
    assert int(bm2.n_active) == n1
    # Weights doubled where observed (within max_weight).
    assert float(jnp.max(bm2.weight)) == 2.0


def test_capacity_overflow_is_counted_not_ub():
    tiny = CFG.__class__(**{**CFG.__dict__, "table_capacity": 24})
    f = _frame()
    bm = blocks.allocate(tiny)
    bm = blocks.integrate(bm, f.depth, f.color, f.T_wc, SMALL_INTR, tiny)
    # The last group of 8 slots is reserved (blocks.RESERVED_SLOTS — the
    # Pallas group kernels' pad target), so usable capacity is 24 - 8.
    assert int(bm.n_active) == 24 - blocks.RESERVED_SLOTS
    assert int(bm.overflow) > 0
    # Directory must not point into the reserved tail.
    assert int(jnp.max(bm.directory)) < 24 - blocks.RESERVED_SLOTS


def test_trilinear_matches_dense():
    dense, bm, poses = _integrate_both(1)
    # Sample at jittered centers of observed near-surface voxels so points
    # land inside the allocated band.
    rng = np.random.default_rng(0)
    ds = np.asarray(dense.sdf)
    dw = np.asarray(dense.weight)
    ii, jj, kk = np.nonzero((dw > 0) & (np.abs(ds) < 0.5))
    sel = rng.choice(len(ii), size=500, replace=False)
    centers = np.stack([ii[sel], jj[sel], kk[sel]], -1).astype(np.float32)
    p = (
        np.asarray(CFG.origin)
        + (centers + 0.5 + rng.uniform(-0.4, 0.4, (500, 3))) * CFG.voxel_size
    ).astype(np.float32)
    p = jnp.asarray(p)
    sd, vd = tsdf.sample_trilinear(dense, p, CFG)
    sb, vb = blocks.sample_trilinear(bm, p, CFG)
    vd = np.asarray(vd)
    vb = np.asarray(vb)
    # Block-map validity additionally requires allocation; wherever the
    # block map says valid, the dense sample must agree.
    both = vb & vd
    assert both.sum() > 50
    np.testing.assert_allclose(
        np.asarray(sb)[both], np.asarray(sd)[both], rtol=1e-4, atol=1e-4
    )
    # Block-valid must imply dense-valid (never the weaker way).
    assert not np.any(vb & ~vd)


def test_raycast_matches_dense():
    dense, bm, poses = _integrate_both(1)
    T = poses[0]
    md = rc_dense.raycast(dense, T, SMALL_INTR, CFG, RC)
    mb = blocks.raycast(bm, T, SMALL_INTR, CFG, RC)
    vd = np.asarray(md.valid)
    vb = np.asarray(mb.valid)
    both = vd & vb
    # The block raycast must find (nearly) the same surface.
    assert both.sum() / max(vd.sum(), 1) > 0.95
    dd = np.asarray(md.depth)[both]
    db = np.asarray(mb.depth)[both]
    assert np.median(np.abs(dd - db)) < 0.5 * CFG.voxel_size
    nd = np.asarray(md.normal_w)[both]
    nb_ = np.asarray(mb.normal_w)[both]
    cos = np.sum(nd * nb_, axis=-1)
    assert np.median(cos) > 0.99


def test_empty_map_raycast_all_invalid():
    bm = blocks.allocate(CFG)
    m = blocks.raycast(bm, jnp.eye(4), SMALL_INTR, CFG, RC)
    assert not bool(jnp.any(m.valid))


def test_clean_culls_and_compacts():
    f = _frame()
    bm = blocks.allocate(CFG)
    bm = blocks.integrate(bm, f.depth, f.color, f.T_wc, SMALL_INTR, CFG)
    bm = blocks.integrate(bm, f.depth, f.color, f.T_wc, SMALL_INTR, CFG)
    n0 = int(bm.n_active)
    # Sabotage a third of the slots: weights below the cull threshold.
    import numpy as _np

    kill = _np.arange(0, n0, 3)
    w = _np.array(bm.weight)
    w[kill] = 0.25
    bm = bm._replace(weight=jnp.asarray(w))

    from instancefusion_tpu.ops import labels as lbl

    votes = lbl.allocate(CFG)
    bm2, votes2 = blocks.clean(bm, CFG, min_weight=1.0, votes=votes)
    n1 = int(bm2.n_active)
    # Expected survivors: allocated rows whose best weight clears the bar
    # AND that hold (an approach band to) a surface — fully-carved /
    # truncation-saturated blocks are reclaimed too.
    sdf = _np.asarray(bm.sdf)
    observed = _np.where(w > 0.0, sdf, 2.0)
    nonempty = observed[:n0].min(axis=1) <= 0.98
    expected = int(((w[:n0].max(axis=1) >= 1.0) & nonempty).sum())
    assert n1 == expected
    assert n1 <= n0 - len(kill)
    # Directory consistency: every directory entry points at a live row
    # whose coords match.
    d = _np.asarray(bm2.directory)
    coords = _np.asarray(bm2.block_coords)
    ii, jj, kk = _np.nonzero(d >= 0)
    assert len(ii) == n1
    for a, b, c in zip(ii[:50], jj[:50], kk[:50]):
        s = d[a, b, c]
        assert (coords[s] == (a, b, c)).all()
    # Surviving payload intact: weights of kept rows are >= threshold.
    assert float(jnp.max(bm2.weight[:n1].max(axis=1).min())) >= 1.0
    # Raycast still works and finds the surface.
    m = blocks.raycast(bm2, f.T_wc, SMALL_INTR, CFG, RC)
    assert int(m.valid.sum()) > 1000
    # Votes compacted in lockstep (all unlabeled here, shapes preserved).
    assert votes2.label.shape == votes.label.shape


def test_clean_reclaims_carved_empty_blocks():
    """Space-carved blocks (all observed voxels at sdf ~ +1, high weight)
    must be culled by clean() or the frustum carve list grows forever."""
    bm = blocks.allocate(CFG)
    f = _frame()
    bm = blocks.integrate(bm, f.depth, f.color, f.T_wc, SMALL_INTR, CFG)
    n0 = int(bm.n_active)
    assert n0 > 0
    # Forge one surface block into the fully-carved state.
    sdf_np = np.asarray(bm.sdf)
    w_np = np.asarray(bm.weight)
    surface = np.nonzero(
        (np.where(w_np > 0, sdf_np, 2.0)[:n0].min(axis=1) <= 0.98)
        & (w_np[:n0].max(axis=1) >= 1.0)
    )[0]
    target = int(surface[0])
    sdf = bm.sdf.at[target].set(1.0)
    w = bm.weight.at[target].set(32.0)
    bm = bm._replace(sdf=sdf, weight=w)
    before, _ = blocks.clean(
        bm._replace(sdf=bm.sdf.at[target].set(-0.5)), CFG, min_weight=1.0
    )
    after, _ = blocks.clean(bm, CFG, min_weight=1.0)
    # Carving the target block (vs giving it a surface) loses exactly it.
    assert int(after.n_active) == int(before.n_active) - 1
    coords = np.asarray(bm.block_coords[target])
    assert int(after.directory[coords[0], coords[1], coords[2]]) == -1
    assert int(before.directory[coords[0], coords[1], coords[2]]) >= 0


def test_discover_allocate_small_camera():
    """Regression: alloc_cap > #candidate samples must not crash top_k.

    A small camera (here 40x30 at stride 4, 3 band samples -> 240
    candidates) used to hit ``ValueError: k must be no larger than size``
    in ``discover_allocate`` (round-3 regression); the cap is clamped to
    the candidate count now.
    """
    from instancefusion_tpu.geometry.camera import Intrinsics

    tiny_intr = Intrinsics(fx=30.0, fy=30.0, cx=20.0, cy=15.0, width=40, height=30)
    f = synthetic.render_frame(synthetic.orbit_trajectory(3)[1], tiny_intr)
    bm = blocks.allocate(CFG)
    bm = blocks.discover_allocate(
        bm, f.depth, f.T_wc, tiny_intr, CFG, samples=3, stride=4, alloc_cap=4096
    )
    assert int(bm.n_active) > 0
    assert int(bm.overflow) == 0
    # Idempotent: a second pass discovers nothing new.
    bm2 = blocks.discover_allocate(
        bm, f.depth, f.T_wc, tiny_intr, CFG, samples=3, stride=4, alloc_cap=4096
    )
    assert int(bm2.n_active) == int(bm.n_active)
