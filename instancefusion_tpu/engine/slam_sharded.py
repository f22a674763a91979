"""Sharded SLAM engine: the per-frame step over a device mesh (configs 4/5).

Same track -> fuse -> predict structure as engine/slam.py, with the map
ops routed through parallel/shard.py: integrate updates each shard's own
payload rows (zero communication), raycast halo-exchanges slab boundaries
and pmin-composites the predicted maps, and the composited (replicated)
maps feed the same ICP as the single-device engine.  The frame is
replicated — the map, not the sequence, is the long axis (SURVEY.md §6).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from instancefusion_tpu.config import EngineConfig
from instancefusion_tpu.engine.slam import StepInfo, tsdf_integrate_count
from instancefusion_tpu.ops import icp, preprocess, raycast as rc
from instancefusion_tpu.parallel import shard
from instancefusion_tpu.parallel.mesh import SHARD_AXIS


class ShardedSlamState(NamedTuple):
    T_wc: jnp.ndarray
    volume: shard.ShardedBlockMap
    pred: rc.RaycastMaps
    pred_T_wc: jnp.ndarray
    frame_idx: jnp.ndarray
    lost_frames: jnp.ndarray


def init_state(cfg: EngineConfig, mesh: Mesh, T_init_wc=None) -> ShardedSlamState:
    intr = cfg.intrinsics
    h, w = intr.height, intr.width
    num_shards = mesh.shape[SHARD_AXIS]
    volume = shard.allocate(cfg.tsdf, num_shards, with_color=cfg.use_color)
    pred = rc.RaycastMaps(
        vertex_w=jnp.zeros((h, w, 3), jnp.float32),
        normal_w=jnp.zeros((h, w, 3), jnp.float32),
        depth=jnp.zeros((h, w), jnp.float32),
        color=jnp.zeros((h, w, 3), jnp.float32),
        valid=jnp.zeros((h, w), bool),
    )
    T0 = jnp.eye(4, dtype=jnp.float32) if T_init_wc is None else T_init_wc
    return ShardedSlamState(
        T_wc=T0,
        volume=volume,
        pred=pred,
        pred_T_wc=T0,
        frame_idx=jnp.zeros((), jnp.int32),
        lost_frames=jnp.zeros((), jnp.int32),
    )


def make_step(cfg: EngineConfig, mesh: Mesh):
    """Build the jitted sharded step for (cfg, mesh).

    The mesh is closed over (it is not a pytree); the returned function
    has the same signature/behavior as engine/slam.step.
    """
    intr = cfg.intrinsics

    @jax.jit
    def step(state: ShardedSlamState, depth, color):
        intensity = preprocess.rgb_to_intensity(color) if cfg.use_color else None
        pyr = preprocess.build_frame_pyramid(
            depth, intr, cfg.preprocess, cfg.icp.levels, intensity
        )
        pred_intensity = (
            preprocess.rgb_to_intensity(state.pred.color) if cfg.use_color else None
        )
        result = icp.track(
            pyr,
            state.pred.vertex_w,
            state.pred.normal_w,
            state.pred.valid,
            state.T_wc,
            state.pred_T_wc,
            intr,
            cfg.icp,
            pred_intensity=pred_intensity,
        )
        first = state.frame_idx == 0
        fuse_ok = result.valid | first
        T_new = jnp.where(result.valid, result.T_wc, state.T_wc)

        d0 = pyr[0]["depth"]
        fused = jnp.where(fuse_ok, tsdf_integrate_count(d0), 0.0)
        depth_masked = jnp.where(fuse_ok, d0, jnp.zeros_like(d0))
        volume = shard.integrate(
            state.volume,
            depth_masked,
            color if cfg.use_color else None,
            T_new,
            mesh,
            intr,
            cfg.tsdf,
        )
        pred = shard.raycast(
            volume, T_new, mesh, intr, cfg.tsdf, cfg.raycast,
            with_color=cfg.use_color,
        )
        new_state = ShardedSlamState(
            T_wc=T_new,
            volume=volume,
            pred=pred,
            pred_T_wc=T_new,
            frame_idx=state.frame_idx + 1,
            lost_frames=jnp.where(result.valid | first, 0, state.lost_frames + 1).astype(
                jnp.int32
            ),
        )
        info = StepInfo(
            inliers=result.inliers,
            residual=result.residual,
            track_ok=result.valid | first,
            fused_voxels=fused,
        )
        return new_state, info

    return step
