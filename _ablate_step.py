"""In-context phase attribution: time slam.step variants with phases removed.

Microbenching individual ops over the axon relay is floored by ~0.4 ms of
per-program dispatch; deltas between full-step variants measure the true
in-program cost of each phase (including XLA overlap effects).
"""
import time

import jax
import jax.numpy as jnp

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
    tsdf=TsdfConfig(voxel_size=extent / grid * 2, trunc=6 * extent / grid * 2,
                    grid_size=grid, origin=(-extent, -extent, 1.2 - extent),
                    block_size=8, table_capacity=65536, touched_capacity=2048,
                    use_pallas=True),
    icp=IcpConfig(iters=(10, 5, 4), rgb_weight=0.0, use_pallas=True,
                  assoc_every=(2, 2, 4)),
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


def make_step(skip=()):
    def step(state, depth, color):
        intensity = None
        pyr = preprocess.build_frame_pyramid(depth, intr, cfg.preprocess,
                                             cfg.icp.levels, intensity)
        if "icp" not in skip:
            result = icp.track(pyr, state.pred.vertex_w, state.pred.normal_w,
                               state.pred.valid, state.T_wc, state.pred_T_wc,
                               intr, cfg.icp)
            T_new = jnp.where(result.valid, result.T_wc, state.T_wc)
        else:
            T_new = state.T_wc
        d0 = pyr[0]["depth"]
        prior = jnp.where(d0 > 0.0, d0, state.pred.depth)
        volume = state.volume
        if "alloc" not in skip:
            volume = blocks.discover_allocate(volume, d0, T_new, intr, cfg.tsdf)
        if "groups" not in skip:
            kg = min(cfg.tsdf.group_capacity, cfg.tsdf.table_capacity // 8)
            gids, row_valid = blocks.frustum_groups(
                volume, T_new, intr, cfg.tsdf, cfg.raycast.near,
                cfg.raycast.far, kg)
        else:
            gids = jnp.zeros((1,), jnp.int32)
            row_valid = jnp.zeros((1, 8), bool)
        if "integrate" not in skip and "groups" not in skip:
            volume = blocks.integrate_groups(volume, gids, row_valid, d0,
                                             color, T_new, intr, cfg.tsdf)
        if "splat" not in skip and "groups" not in skip:
            pred = blocks.raycast_splat_groups(
                volume, T_new, intr, cfg.tsdf, gids, row_valid,
                with_color=cfg.use_color, depth_prior=prior,
                rmax=cfg.raycast.splat_rmax)
        else:
            pred = state.pred
        return state._replace(T_wc=T_new, volume=volume, pred=pred,
                              pred_T_wc=T_new)

    return jax.jit(step)


def timeit(name, fn, n=30):
    s = fn(state, depth, color)
    float(jnp.sum(s.T_wc))
    t0 = time.perf_counter()
    for _ in range(n):
        s = fn(s, depth, color)
    float(jnp.sum(s.T_wc))
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1e3:7.3f} ms")


timeit("full", make_step())
timeit("no icp", make_step(("icp",)))
timeit("no alloc", make_step(("alloc",)))
timeit("no integrate", make_step(("integrate",)))
timeit("no splat", make_step(("splat",)))
timeit("no integrate+splat+groups", make_step(("groups",)))
timeit("icp only", make_step(("alloc", "groups")))
timeit("preprocess only", make_step(("icp", "alloc", "groups")))
