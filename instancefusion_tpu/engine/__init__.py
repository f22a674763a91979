"""Engine layer: per-frame SLAM step, backend, pipeline orchestration."""

from instancefusion_tpu.engine import (  # noqa: F401
    instances,
    pipeline,
    posegraph,
    slam,
    slam_sharded,
)
