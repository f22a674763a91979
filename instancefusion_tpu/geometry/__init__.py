from instancefusion_tpu.geometry.se3 import (
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
    se3_inverse,
    transform_points,
)
from instancefusion_tpu.geometry.camera import Intrinsics, project, backproject

__all__ = [
    "se3_exp",
    "se3_log",
    "so3_exp",
    "so3_log",
    "se3_inverse",
    "transform_points",
    "Intrinsics",
    "project",
    "backproject",
]
