"""TPU check: group-addressed integrate/splat vs slot-list goldens + perf."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from instancefusion_tpu.config import (
    EngineConfig, IcpConfig, PreprocessConfig, RaycastConfig, TsdfConfig,
)
from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.engine import slam
from instancefusion_tpu.geometry.camera import TUM_FR1
from instancefusion_tpu.ops import blocks

grid = 512
extent = grid * 0.0075
cfg = EngineConfig(
    intrinsics=TUM_FR1,
    tsdf=TsdfConfig(voxel_size=extent / grid * 2, trunc=6 * extent / grid * 2,
                    grid_size=grid, origin=(-extent, -extent, 1.2 - extent),
                    block_size=8, table_capacity=65536, touched_capacity=2048,
                    use_pallas=True),
    icp=IcpConfig(iters=(10, 5, 4), rgb_weight=0.0, use_pallas=True),
    raycast=RaycastConfig(near=0.2, far=4.0, use_depth_prior=True,
                          screen_space_normals=True, use_splat=True),
    preprocess=PreprocessConfig(use_pallas=True),
    map_kind="blocks", use_color=True,
)
intr = cfg.intrinsics
poses = synthetic.orbit_trajectory(12)
frames = [synthetic.render_frame(poses[i], intr) for i in range(12)]
state = slam.init_state(cfg, poses[0])
for i in range(10):
    state, _ = slam.step(cfg, state, frames[i].depth, frames[i].color)
depth, color = frames[10].depth, frames[10].color
T = state.T_wc
vol = state.volume


def timeit(name, fn, *a, n=20):
    out = fn(*a)
    float(jnp.sum(jnp.abs(jax.tree.leaves(out)[0].astype(jnp.float32))))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    float(jnp.sum(jnp.abs(jax.tree.leaves(out)[0].astype(jnp.float32))))
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3:7.3f} ms")
    return out


# Slot path (golden).
fs = jax.jit(lambda bm, T: blocks.frustum_slots(bm, T, intr, cfg.tsdf, 0.2, 4.0, 2048))
slots, sv = fs(vol, T)
print("valid slots:", int(sv.sum()))
integ_s = jax.jit(lambda bm, s, v, d, c, T: blocks.integrate_slots(
    bm, s, v, d, c, T, intr, cfg.tsdf))
vol_s = timeit("integrate_slots", integ_s, vol, slots, sv, depth, color, T)

# Group path.
fg = jax.jit(lambda bm, T: blocks.frustum_groups(bm, T, intr, cfg.tsdf, 0.2, 4.0, 1024))
gids, rv = timeit("frustum_groups", fg, vol, T)
print("valid groups:", int(jnp.sum(jnp.any(rv, 1))), "rows:", int(rv.sum()))
integ_g = jax.jit(lambda bm, g, rv, d, c, T: blocks.integrate_groups(
    bm, g, rv, d, c, T, intr, cfg.tsdf))
vol_g = timeit("integrate_groups", integ_g, vol, gids, rv, depth, color, T)

# Same touched set? row sets must match.
rows_s = np.sort(np.asarray(slots)[np.asarray(sv)])
rows_g = np.sort((np.asarray(gids)[:, None] * 8 + np.arange(8)).reshape(-1)[
    np.asarray(rv).reshape(-1)])
assert np.array_equal(rows_s, rows_g), (rows_s.shape, rows_g.shape)

np.testing.assert_allclose(np.asarray(vol_g.sdf), np.asarray(vol_s.sdf),
                           atol=1e-5)
np.testing.assert_allclose(np.asarray(vol_g.weight), np.asarray(vol_s.weight),
                           atol=1e-5)
np.testing.assert_allclose(np.asarray(vol_g.color), np.asarray(vol_s.color),
                           atol=1e-4)
print("integrate groups == slots OK")

prior = jnp.where(depth > 0, depth, state.pred.depth)
splat_s = jax.jit(lambda bm, T, s, v, pr: blocks.raycast_splat(
    bm, T, intr, cfg.tsdf, s, v, with_color=True, interpret=False,
    depth_prior=pr, rmax=8))
ms = timeit("raycast_splat (slots)", splat_s, vol_s, T, slots, sv, prior)
splat_g = jax.jit(lambda bm, T, g, rv, pr: blocks.raycast_splat_groups(
    bm, T, intr, cfg.tsdf, g, rv, with_color=True, depth_prior=pr, rmax=8))
mg = timeit("raycast_splat (groups)", splat_g, vol_s, T, gids, rv, prior)
vs, vg = np.asarray(ms.valid), np.asarray(mg.valid)
print("valid px slots/groups:", vs.sum(), vg.sum())
both = vs & vg
assert both.sum() / max(vs.sum(), 1) > 0.999
np.testing.assert_allclose(np.asarray(mg.depth)[both], np.asarray(ms.depth)[both],
                           atol=1e-4)
print("splat groups == slots OK")

# Full step timing.
st = jax.jit(lambda s, d, c: slam.step(cfg, s, d, c))
timeit("FULL slam.step (groups)", st, state, depth, color, n=30)
