"""Pallas ICP normal-equation reduction kernel.

The reference's hottest kernels (`icpStep` + block tree reduction,
expected `Core/src/Cuda/icp.cu` — SURVEY.md §4.3) compute per-pixel
point-to-plane residuals/jacobians and reduce 27 floats per pixel block.
The jnp path (`ops/icp.build_normal_equations`) materializes the masked
jacobian J (HW, 6) to HBM and runs a (6,HW)x(HW,6) matmul — an extra
~7 MB of HBM write+read per ICP iteration at VGA.

This kernel fuses residual + jacobian + weighting + the full 29-term
reduction (21 upper-tri JᵀJ, 6 Jᵀr, inlier count, |r| sum) in one pass:
each grid step reads one pixel tile and accumulates partials in a VMEM
scratch accumulator; the last step writes 32 floats.  HBM traffic is
exactly one read of the association arrays — speed-of-light for this op.

Association (the projective gather of target vertex/normal per source
pixel) stays in XLA: per-lane dynamic gathers are the one primitive this
kernel class cannot beat XLA at on TPU; everything after the gather is
fused here.  Layout: component-planar (N/128, 128) f32 arrays.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_TILE_ROWS = 64  # 64 x 128 = 8192 pixels per grid step


def _kernel(px, py, pz, nx, ny, nz, qx, qy, qz, m, out_ref, acc_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = m[:]
    pxv, pyv, pzv = px[:], py[:], pz[:]
    nxv, nyv, nzv = nx[:], ny[:], nz[:]
    dx = pxv - qx[:]
    dy = pyv - qy[:]
    dz = pzv - qz[:]
    r = nxv * dx + nyv * dy + nzv * dz
    # J = [n, p x n]
    j3 = pyv * nzv - pzv * nyv
    j4 = pzv * nxv - pxv * nzv
    j5 = pxv * nyv - pyv * nxv
    j = (nxv, nyv, nzv, j3, j4, j5)

    vals = []
    for a in range(6):
        for b in range(a, 6):
            vals.append(jnp.sum(j[a] * j[b] * w))
    for a in range(6):
        vals.append(jnp.sum(j[a] * (-r) * w))
    vals.append(jnp.sum(w))
    vals.append(jnp.sum(jnp.abs(r) * w))
    vals += [jnp.zeros(())] * (32 - len(vals))
    acc_ref[0, :] = acc_ref[0, :] + jnp.stack(vals)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


def _pad_plane(x: jnp.ndarray, rows: int) -> jnp.ndarray:
    n = x.shape[0]
    pad = rows * _LANES - n
    return jnp.pad(x, (0, pad)).reshape(rows, _LANES)


@functools.partial(jax.jit, static_argnums=(4,))
def reduce_normal_equations(
    p_w: jnp.ndarray,  # (N,3) transformed source points (world)
    n_t: jnp.ndarray,  # (N,3) associated target normals
    q_w: jnp.ndarray,  # (N,3) associated target vertices
    mask: jnp.ndarray,  # (N,) f32 weights (0 = rejected)
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused (H6, b6, inliers, res_sum) from associated correspondences."""
    n = p_w.shape[0]
    rows = -(-n // _LANES)
    rows = -(-rows // _TILE_ROWS) * _TILE_ROWS  # multiple of the tile
    planes = [
        _pad_plane(p_w[:, 0], rows), _pad_plane(p_w[:, 1], rows),
        _pad_plane(p_w[:, 2], rows),
        _pad_plane(n_t[:, 0], rows), _pad_plane(n_t[:, 1], rows),
        _pad_plane(n_t[:, 2], rows),
        _pad_plane(q_w[:, 0], rows), _pad_plane(q_w[:, 1], rows),
        _pad_plane(q_w[:, 2], rows),
        _pad_plane(mask.astype(jnp.float32), rows),
    ]
    grid = rows // _TILE_ROWS
    spec = pl.BlockSpec(
        (_TILE_ROWS, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        _kernel,
        grid=(grid,),
        in_specs=[spec] * 10,
        out_specs=pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 32), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 32), jnp.float32)],
        interpret=interpret,
    )(*planes)[0]

    H6 = jnp.zeros((6, 6), jnp.float32)
    k = 0
    for a in range(6):
        for b in range(a, 6):
            H6 = H6.at[a, b].set(out[k])
            H6 = H6.at[b, a].set(out[k])
            k += 1
    b6 = out[21:27]
    return H6, b6, out[27], out[28]
