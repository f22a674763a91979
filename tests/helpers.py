"""Shared test fixtures: small synthetic camera + scene + volume."""

import jax.numpy as jnp

from instancefusion_tpu.config import (
    EngineConfig,
    IcpConfig,
    PreprocessConfig,
    RaycastConfig,
    TsdfConfig,
)
from instancefusion_tpu.geometry.camera import Intrinsics

# Quarter-VGA-ish camera keeps CPU tests fast.
SMALL_INTR = Intrinsics(fx=129.3, fy=129.1, cx=79.5, cy=59.5, width=160, height=120)

SMALL_TSDF = TsdfConfig(
    voxel_size=0.04,
    trunc=0.12,
    grid_size=96,
    origin=(-1.92, -1.92, -0.4),
)

SMALL_CFG = EngineConfig(
    intrinsics=SMALL_INTR,
    tsdf=SMALL_TSDF,
    icp=IcpConfig(iters=(10, 7, 7), min_valid=60, rgb_weight=0.0),
    raycast=RaycastConfig(near=0.2, far=4.0),
    preprocess=PreprocessConfig(),
    map_kind="dense",
)


def small_config() -> EngineConfig:
    return SMALL_CFG
