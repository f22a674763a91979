"""Per-phase timing of the 512^3 bench configuration on the TPU."""
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
    icp=IcpConfig(iters=(10, 5, 4), rgb_weight=0.0, use_pallas=True),
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

k = min(cfg.tsdf.touched_capacity, blocks.num_blocks_per_axis(cfg.tsdf) ** 3)
fs = jax.jit(lambda bm, T: blocks.frustum_slots(
    bm, T, intr, cfg.tsdf, cfg.raycast.near, cfg.raycast.far, k))
slots, slot_valid = timeit("frustum_slots", fs, vol, T_new)

integ = jax.jit(lambda bm, s, sv, d, c, T: blocks.integrate_slots(
    bm, s, sv, d, c, T, intr, cfg.tsdf))
vol2 = timeit("integrate_slots (pallas)", integ, vol, slots, slot_valid, depth, color, T_new)

splat = jax.jit(lambda bm, T, s, sv, pr: blocks.raycast_splat(
    bm, T, intr, cfg.tsdf, s, sv, with_color=True, interpret=False,
    depth_prior=pr, rmax=cfg.raycast.splat_rmax))
timeit("raycast_splat (pallas)", splat, vol2, T_new, slots, slot_valid, prior)

st = jax.jit(lambda s, d, c: slam.step(cfg, s, d, c))
timeit("FULL slam.step", st, state, depth, color, n=30)

# ICP sub-breakdown: iteration scaling
for iters in [(1, 1, 1), (2, 2, 2), (10, 5, 4)]:
    c2 = IcpConfig(iters=iters, rgb_weight=0.0, use_pallas=True)
    tr = jax.jit(lambda pyr, pv, pn, pval, T, c2=c2: icp.track(
        pyr, pv, pn, pval, T, T, intr, c2))
    timeit(f"icp.track {iters}", tr, pyr,
           state.pred.vertex_w, state.pred.normal_w, state.pred.valid, state.T_wc)

print("slots valid:", int(jnp.sum(slot_valid)), " n_active:", int(vol2.n_active))
