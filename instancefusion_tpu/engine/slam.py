"""SLAM engine: the per-frame pipeline as one pure function under jit.

TPU-native replacement for the reference's engine facade
(`ElasticFusion::processFrame` in the expected `Core/src/ElasticFusion.cpp`
— SURVEY.md §4.2).  Differences dictated by XLA semantics:

- All state (pose, volume, predicted maps, health) is an explicit pytree;
  `step` is `state, frame -> state, info` with no hidden globals.
- The whole per-frame pipeline — preprocess, 3-level ICP (every
  iteration), TSDF integrate, raycast prediction — is traced into a
  single `jit` program; there is no device<->host round trip per ICP
  iteration like the reference's 6x6 CPU solve.
- Frame 0 needs no special case: the predicted maps start invalid, the
  tracking-health gate fails closed, and the engine fuses at the initial
  pose.

This is the dense-volume (config 1) engine; the block-sparse engine that
scales to 512^3+ builds on the same step structure in `engine/blocks.py`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from instancefusion_tpu.config import EngineConfig
from instancefusion_tpu.ops import icp, preprocess, raycast as rc, tsdf


class SlamState(NamedTuple):
    T_wc: jnp.ndarray  # (4,4) current camera-to-world pose
    volume: tsdf.TsdfVolume
    pred: rc.RaycastMaps  # model prediction rendered at pred_T_wc
    pred_T_wc: jnp.ndarray  # (4,4) pose the prediction was rendered from
    frame_idx: jnp.ndarray  # () i32
    lost_frames: jnp.ndarray  # () i32 — consecutive tracking failures


class StepInfo(NamedTuple):
    inliers: jnp.ndarray
    residual: jnp.ndarray
    track_ok: jnp.ndarray
    fused_voxels: jnp.ndarray  # voxels receiving an update this frame


def init_state(cfg: EngineConfig, T_init_wc: jnp.ndarray | None = None) -> SlamState:
    intr = cfg.intrinsics
    h, w = intr.height, intr.width
    volume = tsdf.allocate(cfg.tsdf, with_color=cfg.use_color)
    pred = rc.RaycastMaps(
        vertex_w=jnp.zeros((h, w, 3), jnp.float32),
        normal_w=jnp.zeros((h, w, 3), jnp.float32),
        depth=jnp.zeros((h, w), jnp.float32),
        color=jnp.zeros((h, w, 3), jnp.float32),
        valid=jnp.zeros((h, w), bool),
    )
    T0 = jnp.eye(4, dtype=jnp.float32) if T_init_wc is None else T_init_wc
    return SlamState(
        T_wc=T0,
        volume=volume,
        pred=pred,
        pred_T_wc=T0,
        frame_idx=jnp.zeros((), jnp.int32),
        lost_frames=jnp.zeros((), jnp.int32),
    )


@functools.partial(jax.jit, static_argnums=(0,))
def step(
    cfg: EngineConfig,
    state: SlamState,
    depth: jnp.ndarray,
    color: jnp.ndarray,
) -> tuple[SlamState, StepInfo]:
    """Track -> fuse -> predict for one RGB-D frame."""
    intr = cfg.intrinsics
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

    # Health gate: on tracking failure, fuse nothing and keep the pose
    # (the reference fuses regardless; gating is the SURVEY §6 failure-
    # detection design). Frame 0 "fails" tracking by construction but must
    # still fuse — allow fusion when the map is empty.
    first = state.frame_idx == 0
    fuse_ok = result.valid | first
    T_new = jnp.where(result.valid, result.T_wc, state.T_wc)

    d0 = pyr[0]["depth"]
    fused = jnp.where(
        fuse_ok,
        tsdf_integrate_count(d0),
        jnp.zeros((), jnp.float32),
    )
    depth_masked = jnp.where(fuse_ok, d0, jnp.zeros_like(d0))
    volume = tsdf.integrate(
        state.volume,
        depth_masked,
        color if cfg.use_color else None,
        T_new,
        intr,
        cfg.tsdf,
    )

    pred = rc.raycast(
        volume, T_new, intr, cfg.tsdf, cfg.raycast, with_color=cfg.use_color
    )

    new_state = SlamState(
        T_wc=T_new,
        volume=volume,
        pred=pred,
        pred_T_wc=T_new,
        frame_idx=state.frame_idx + 1,
        lost_frames=jnp.where(
            result.valid | first, 0, state.lost_frames + 1
        ).astype(jnp.int32),
    )
    info = StepInfo(
        inliers=result.inliers,
        residual=result.residual,
        track_ok=result.valid | first,
        fused_voxels=fused,
    )
    return new_state, info


def tsdf_integrate_count(depth: jnp.ndarray) -> jnp.ndarray:
    """Proxy metric: valid depth pixels fused this frame."""
    return jnp.sum((depth > 0).astype(jnp.float32))


def run_sequence(cfg: EngineConfig, frames, T_init_wc=None):
    """Host-side driver: run `step` over an iterable of (depth, color).

    Returns (poses [list of np 4x4], infos [list of StepInfo]).
    """
    state = init_state(cfg, T_init_wc)
    poses, infos = [], []
    for depth, color in frames:
        state, info = step(cfg, state, depth, color)
        poses.append(jax.device_get(state.T_wc))
        infos.append(jax.device_get(info))
    return poses, infos, state
