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
    """Static 2-D shift with border fill.

    dy/dx are Python ints (stencil offsets).  Mosaic lowers `jnp.roll`
    through slices and rejects the zero-size slice a 0-shift produces, so
    each axis is rolled only when its shift is nonzero (pltpu.roll is the
    TPU-native circular shift).
    """
    h, w = x.shape
    y = x
    if dy:
        y = pltpu.roll(y, dy % h, 0)  # pltpu.roll requires shift >= 0
    if dx:
        y = pltpu.roll(y, dx % w, 1)
    vv = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    uu = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inb = (vv - dy >= 0) & (vv - dy < h) & (uu - dx >= 0) & (uu - dx < w)
    return jnp.where(inb, y, fill)


def _kernel(depth_ref, dfilt_ref, vx_ref, vy_ref, vz_ref,
            nx_ref, ny_ref, nz_ref, valid_ref, *, intr, cfg):
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

    # --- vertex map (back-projection; iota pixel grid — int iota + cast,
    # Mosaic's tpu.iota is integer-only)
    vv = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(jnp.float32)
    uu = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(jnp.float32)
    x = (uu - intr.cx) / intr.fx * df
    y = (vv - intr.cy) / intr.fy * df
    # Component planes, not (H, W, 3): a 3-wide minor dim pads to 128
    # lanes in VMEM (42x memory blowup) — stack happens outside.
    vx_ref[:] = x
    vy_ref[:] = y
    vz_ref[:] = df

    # --- normal map (cross of central differences)
    vval = df > 0.0
    dxx = _shift2d(x, 0, -1, 0.0) - _shift2d(x, 0, 1, 0.0)
    dxy = _shift2d(y, 0, -1, 0.0) - _shift2d(y, 0, 1, 0.0)
    dxz = _shift2d(df, 0, -1, 0.0) - _shift2d(df, 0, 1, 0.0)
    dyx = _shift2d(x, -1, 0, 0.0) - _shift2d(x, 1, 0, 0.0)
    dyy = _shift2d(y, -1, 0, 0.0) - _shift2d(y, 1, 0, 0.0)
    dyz = _shift2d(df, -1, 0, 0.0) - _shift2d(df, 1, 0, 0.0)
    # Mosaic cannot rotate i1 vectors — shift validity as f32.
    vvalf = jnp.where(vval, 1.0, 0.0)
    vx = (_shift2d(vvalf, 0, -1, 0.0) > 0.5) & (_shift2d(vvalf, 0, 1, 0.0) > 0.5)
    vy = (_shift2d(vvalf, -1, 0, 0.0) > 0.5) & (_shift2d(vvalf, 1, 0, 0.0) > 0.5)
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
    nx_ref[:] = jnp.where(nvalid, nx, 0.0)
    ny_ref[:] = jnp.where(nvalid, ny, 0.0)
    nz_ref[:] = jnp.where(nvalid, nz, 0.0)
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
    plane = jax.ShapeDtypeStruct((h, w), jnp.float32)
    df, vx, vy, vz, nx, ny, nz, valid = pl.pallas_call(
        functools.partial(_kernel, intr=intr, cfg=cfg),
        out_shape=(
            plane, plane, plane, plane, plane, plane, plane,
            jax.ShapeDtypeStruct((h, w), jnp.bool_),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),) * 8,
        # 9 VGA planes + stencil temporaries exceed the conservative 16 MB
        # default scoped-vmem limit; the chip has far more.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(depth)
    vmap = jnp.stack([vx, vy, vz], axis=-1)
    nmap = jnp.stack([nx, ny, nz], axis=-1)
    return df, vmap, nmap, valid
