"""Per-phase timing of the group-addressed 512^3 path (the real bench path)."""
import time
import jax, jax.numpy as jnp

from instancefusion_tpu.config import (
    EngineConfig, IcpConfig, PreprocessConfig, RaycastConfig, TsdfConfig,
)
from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.engine import slam
from instancefusion_tpu.geometry.camera import TUM_FR1
from instancefusion_tpu.ops import blocks, icp, preprocess

grid = 512
extent = grid * 0.0075
cfg = EngineConfig(
    intrinsics=TUM_FR1,
    tsdf=TsdfConfig(
        voxel_size=extent / grid * 2, trunc=6 * extent / grid * 2,
        grid_size=grid, origin=(-extent, -extent, 1.2 - extent),
        block_size=8, table_capacity=65536, touched_capacity=2048,
        use_pallas=True,
    ),
    icp=IcpConfig(iters=(10, 5, 4), rgb_weight=0.0, use_pallas=True,
                  assoc_every=(2, 2, 4)),
    raycast=RaycastConfig(near=0.2, far=4.0, use_depth_prior=True,
                          screen_space_normals=True, use_splat=True),
    preprocess=PreprocessConfig(use_pallas=True),
    map_kind="blocks", use_color=True,
)
intr = cfg.intrinsics

poses = synthetic.orbit_trajectory(40)
frames = [synthetic.render_frame(poses[i], intr) for i in range(40)]

state = slam.init_state(cfg, poses[0])
for i in range(10):
    state, info = slam.step(cfg, state, frames[i].depth, frames[i].color)

depth = frames[10].depth
color = frames[10].color


def _sync(out):
    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
    return float(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32))))


def timeit(name, fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _sync(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt*1e3:8.3f} ms")
    return out


intensity = preprocess.rgb_to_intensity(color)
pre = jax.jit(lambda d, inten: preprocess.build_frame_pyramid(
    d, intr, cfg.preprocess, cfg.icp.levels, inten))
pyr = timeit("preprocess pyramid", pre, depth, intensity)

track = jax.jit(lambda pyr, pv, pn, pval, T: icp.track(
    pyr, pv, pn, pval, T, T, intr, cfg.icp))
timeit("icp.track (10/5/4)", track, pyr,
       state.pred.vertex_w, state.pred.normal_w, state.pred.valid, state.T_wc)

T_new = state.T_wc
prior = jnp.where(depth > 0, depth, state.pred.depth)

da = jax.jit(lambda bm, d, T: blocks.discover_allocate(bm, d, T, intr, cfg.tsdf))
vol = timeit("discover_allocate", da, state.volume, depth, T_new)

kg = min(cfg.tsdf.group_capacity, cfg.tsdf.table_capacity // 8)
fg = jax.jit(lambda bm, T: blocks.frustum_groups(
    bm, T, intr, cfg.tsdf, cfg.raycast.near, cfg.raycast.far, kg))
gids, row_valid = timeit("frustum_groups", fg, vol, T_new)

integ = jax.jit(lambda bm, g, rv, d, c, T: blocks.integrate_groups(
    bm, g, rv, d, c, T, intr, cfg.tsdf))
vol2 = timeit("integrate_groups (pallas)", integ, vol, gids, row_valid, depth, color, T_new)

splat = jax.jit(lambda bm, T, g, rv, pr: blocks.raycast_splat_groups(
    bm, T, intr, cfg.tsdf, g, rv, with_color=True,
    depth_prior=pr, rmax=cfg.raycast.splat_rmax))
timeit("raycast_splat_groups (pallas)", splat, vol2, T_new, gids, row_valid, prior)

st = jax.jit(lambda s, d, c: slam.step(cfg, s, d, c))
timeit("FULL slam.step", st, state, depth, color, n=30)

# Donated full step: measures the copy-on-write cost at the jit boundary.
std = jax.jit(lambda s, d, c: slam.step(cfg, s, d, c), donate_argnums=(0,))
s2 = jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x, state)
out = std(s2, depth, color)
_sync(out)
n = 30
t0 = time.perf_counter()
cur = out[0]
for _ in range(n):
    cur, info = std(cur, depth, color)
_sync(cur)
dt = (time.perf_counter() - t0) / n
print(f"{'FULL slam.step (donated)':34s} {dt*1e3:8.3f} ms")

print("groups valid:", int(jnp.sum(row_valid)), " n_active:", int(vol2.n_active))
