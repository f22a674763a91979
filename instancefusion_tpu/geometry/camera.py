"""Pinhole camera model.

Replaces the reference's ``Utils/Intrinsics.h`` / ``Utils/Resolution.h``
singletons (expected upstream layout — SURVEY.md §3 "Utils/config").  Unlike
the reference's mutable globals, intrinsics here are a hashable frozen
dataclass so they can be a static argument to ``jit`` and scale exactly
(not approximately) across pyramid levels.

Pixel convention: a pixel (u, v) integer index samples the *center* of that
pixel; projecting a 3D point yields continuous coordinates where (0, 0) is
the center of the top-left pixel (matching TUM RGB-D calibration usage).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Intrinsics:
    fx: float
    fy: float
    cx: float
    cy: float
    width: int
    height: int

    def level(self, lvl: int) -> "Intrinsics":
        """Intrinsics for pyramid level `lvl` (each level halves resolution).

        Uses the standard half-pixel-aware rescaling so pixel centers stay
        aligned: K_l = S K S^-1 with S = diag(s, s, 1) in center-origin
        coordinates -> cx_l = (cx + 0.5) * s - 0.5.
        """
        if lvl == 0:
            return self
        s = 0.5**lvl
        return Intrinsics(
            fx=self.fx * s,
            fy=self.fy * s,
            cx=(self.cx + 0.5) * s - 0.5,
            cy=(self.cy + 0.5) * s - 0.5,
            width=self.width >> lvl,
            height=self.height >> lvl,
        )


# Default TUM RGB-D (freiburg1) calibration — standard published values.
TUM_FR1 = Intrinsics(fx=517.3, fy=516.5, cx=318.6, cy=255.3, width=640, height=480)
TUM_FR3 = Intrinsics(fx=535.4, fy=539.2, cx=320.1, cy=247.6, width=640, height=480)


def project(intr: Intrinsics, p_cam: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Camera-frame points (..., 3) -> pixel coords (u, v) and depth z.

    Returns (u, v, z); caller masks on z > 0 and image bounds.
    """
    z = p_cam[..., 2]
    zsafe = jnp.where(jnp.abs(z) > 1e-12, z, 1e-12)
    u = intr.fx * p_cam[..., 0] / zsafe + intr.cx
    v = intr.fy * p_cam[..., 1] / zsafe + intr.cy
    return u, v, z


def backproject(intr: Intrinsics, depth: jnp.ndarray) -> jnp.ndarray:
    """Depth map (H, W) -> camera-frame vertex map (H, W, 3).

    Invalid depth (<= 0) yields a zero vertex; validity is tracked by the
    caller via ``depth > 0`` (mirrors the reference's ``createVMap`` CUDA
    kernel contract — expected ``Core/src/Cuda/cudafuncs.cu``).
    """
    h, w = depth.shape
    vv, uu = jnp.meshgrid(
        jnp.arange(h, dtype=depth.dtype), jnp.arange(w, dtype=depth.dtype), indexing="ij"
    )
    x = (uu - intr.cx) / intr.fx * depth
    y = (vv - intr.cy) / intr.fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def ray_directions(intr: Intrinsics, dtype=jnp.float32) -> jnp.ndarray:
    """Unit-z ray directions (H, W, 3) in the camera frame: (x/z, y/z, 1)."""
    h, w = intr.height, intr.width
    vv, uu = jnp.meshgrid(
        jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij"
    )
    x = (uu - intr.cx) / intr.fx
    y = (vv - intr.cy) / intr.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
