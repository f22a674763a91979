"""Compute ops: kernels (jnp reference + Pallas) for the SLAM pipeline."""

from instancefusion_tpu.ops import (  # noqa: F401
    ba,
    blocks,
    ferns,
    icp,
    labels,
    preprocess,
    raycast,
    tsdf,
)
