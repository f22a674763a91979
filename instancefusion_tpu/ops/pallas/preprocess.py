"""Fused preprocessing Pallas kernel: bilateral + vertex map + normal map.

TPU-native replacement for the reference's separate CUDA kernels
(`computeBilateralFilter`, `createVMap`, `createNMap` in the expected
`Core/src/Cuda/cudafuncs.cu` — SURVEY.md §3.1 item 1).  The jnp reference
(`ops/preprocess.py`) runs these as separate XLA ops, each re-reading the
depth image from HBM; this kernel produces the filtered depth, the vertex
map and the normal map in ONE pass with the image resident in VMEM
(640x480 f32 = 1.2 MB, well under the ~16 MB budget), so HBM traffic is
one image read + three map writes — the speed-of-light minimum.

Everything is stencil work (static shifts), the Pallas-safe subset: no
per-lane gathers.  The pixel-coordinate terms use broadcasted_iota.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from instancefusion_tpu.config import PreprocessConfig
from instancefusion_tpu.geometry.camera import Intrinsics


def _shift2d(x, dy, dx, fill):
    """Static 2-D shift with border fill (jnp.roll + edge masking)."""
    h, w = x.shape
    y = jnp.roll(x, (dy, dx), (0, 1))
    vv = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inb = (vv - dy >= 0) & (vv - dy < h) & (uu - dx >= 0) & (uu - dx < w)
    return jnp.where(inb, y, fill)


def _kernel(depth_ref, dfilt_ref, vmap_ref, nmap_ref, valid_ref, *, intr, cfg):
    d = depth_ref[:]
    h, w = d.shape

    # --- clamp
    dvalid = (d >= cfg.depth_min) & (d <= cfg.depth_max)
    d = jnp.where(dvalid, d, 0.0)

    # --- bilateral filter (static (2r+1)^2 stencil)
    r = cfg.bilateral_radius
    inv2ss = 0.5 / (cfg.bilateral_sigma_space**2)
    inv2sd = 0.5 / (cfg.bilateral_sigma_depth**2)
    valid_c = d > 0.0
    acc = jnp.zeros_like(d)
    wacc = jnp.zeros_like(d)
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            s = _shift2d(d, dy, dx, 0.0)
            ok = (s > 0.0) & valid_c
            wgt = jnp.exp(-(dy * dy + dx * dx) * inv2ss - (s - d) ** 2 * inv2sd)
            wgt = jnp.where(ok, wgt, 0.0)
            acc = acc + wgt * s
            wacc = wacc + wgt
    df = jnp.where(wacc > 1e-8, acc / jnp.maximum(wacc, 1e-8), 0.0)
    df = jnp.where(valid_c, df, 0.0)
    dfilt_ref[:] = df

    # --- vertex map (back-projection; iota pixel grid)
    vv = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    x = (uu - intr.cx) / intr.fx * df
    y = (vv - intr.cy) / intr.fy * df
    vmap_ref[:, :, 0] = x
    vmap_ref[:, :, 1] = y
    vmap_ref[:, :, 2] = df

    # --- normal map (cross of central differences)
    vval = df > 0.0
    dxx = _shift2d(x, 0, -1, 0.0) - _shift2d(x, 0, 1, 0.0)
    dxy = _shift2d(y, 0, -1, 0.0) - _shift2d(y, 0, 1, 0.0)
    dxz = _shift2d(df, 0, -1, 0.0) - _shift2d(df, 0, 1, 0.0)
    dyx = _shift2d(x, -1, 0, 0.0) - _shift2d(x, 1, 0, 0.0)
    dyy = _shift2d(y, -1, 0, 0.0) - _shift2d(y, 1, 0, 0.0)
    dyz = _shift2d(df, -1, 0, 0.0) - _shift2d(df, 1, 0, 0.0)
    vx = _shift2d(vval, 0, -1, False) & _shift2d(vval, 0, 1, False)
    vy = _shift2d(vval, -1, 0, False) & _shift2d(vval, 1, 0, False)
    nx = dxy * dyz - dxz * dyy
    ny = dxz * dyx - dxx * dyz
    nz = dxx * dyy - dxy * dyx
    norm = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    inv = jnp.where(norm > 1e-12, 1.0 / jnp.maximum(norm, 1e-12), 0.0)
    nx, ny, nz = nx * inv, ny * inv, nz * inv
    flip = nz > 0.0
    nx = jnp.where(flip, -nx, nx)
    ny = jnp.where(flip, -ny, ny)
    nz = jnp.where(flip, -nz, nz)

    vv_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    uu_i = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (vv_i == 0) | (vv_i == h - 1) | (uu_i == 0) | (uu_i == w - 1)
    nvalid = vval & vx & vy & (norm > 1e-12) & ~border
    nmap_ref[:, :, 0] = jnp.where(nvalid, nx, 0.0)
    nmap_ref[:, :, 1] = jnp.where(nvalid, ny, 0.0)
    nmap_ref[:, :, 2] = jnp.where(nvalid, nz, 0.0)
    valid_ref[:] = nvalid & vval


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def fused_preprocess(
    depth: jnp.ndarray,
    intr: Intrinsics,
    cfg: PreprocessConfig,
    interpret: bool = False,
):
    """One-pass clamp + bilateral + vertex/normal maps.

    Returns (depth_filtered, vmap, nmap, valid) matching the level-0
    outputs of `ops/preprocess.build_frame_pyramid` (its golden test).
    """
    h, w = depth.shape
    return pl.pallas_call(
        functools.partial(_kernel, intr=intr, cfg=cfg),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w, 3), jnp.float32),
            jax.ShapeDtypeStruct((h, w, 3), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.bool_),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(depth)
