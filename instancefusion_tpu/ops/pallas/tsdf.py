"""Pallas TSDF block-update and label-vote kernels.

Replaces the fusion math of the reference's surfel data-fusion pipeline
and instance label-update CUDA kernels (SURVEY.md §3.1 items 5, 7) for
the block-sparse map.  The projective association (voxel -> pixel ->
depth/label sample) stays in XLA (per-lane gathers are XLA's domain on
TPU); these kernels own the HBM-dominant read-modify-write of the block
payloads — sdf, weight, color (and label, count) updated in ONE pass with
`input_output_aliases`, so per touched voxel the traffic is exactly one
payload read + one payload write.

Layout: payload tiles are (TILE_BLOCKS, 512) f32 — the 512-voxel block
rows are already lane-aligned (4 x 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 64  # block rows per grid step (64 x 512 voxels)


def _update_kernel(
    sdf_ref, w_ref, cr_ref, cg_ref, cb_ref,
    psi_ref, wobs_ref, or_ref, og_ref, ob_ref,
    sdf_out, w_out, cr_out, cg_out, cb_out,
    *, max_weight: float,
):
    w_old = w_ref[:]
    w_obs = wobs_ref[:]
    w_new = w_old + w_obs
    denom = jnp.maximum(w_new, 1e-6)
    inv = 1.0 / denom
    # Preserve never-fused voxels (sentinel sdf) instead of writing 0.
    sdf_out[:] = jnp.where(
        w_new > 0.0, (sdf_ref[:] * w_old + psi_ref[:] * w_obs) * inv, sdf_ref[:]
    )
    w_out[:] = jnp.minimum(w_new, max_weight)
    cr_out[:] = (cr_ref[:] * w_old + or_ref[:] * w_obs) * inv
    cg_out[:] = (cg_ref[:] * w_old + og_ref[:] * w_obs) * inv
    cb_out[:] = (cb_ref[:] * w_old + ob_ref[:] * w_obs) * inv


@functools.partial(jax.jit, static_argnums=(10, 11))
def fused_tsdf_update(
    sdf, weight, cr, cg, cb,  # (K, 512) payload planes (gathered rows)
    psi, w_obs, obs_r, obs_g, obs_b,  # (K, 512) observations
    max_weight: float,
    interpret: bool = False,
):
    """Weighted running-average update, all planes in one fused pass."""
    k = sdf.shape[0]
    pad = (-k) % _TILE
    args = [sdf, weight, cr, cg, cb, psi, w_obs, obs_r, obs_g, obs_b]
    if pad:
        args = [jnp.pad(a, ((0, pad), (0, 0))) for a in args]
    kp = k + pad
    spec = pl.BlockSpec((_TILE, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_update_kernel, max_weight=max_weight),
        grid=(kp // _TILE,),
        in_specs=[spec] * 10,
        out_specs=(spec,) * 5,
        out_shape=tuple(
            jax.ShapeDtypeStruct((kp, 512), jnp.float32) for _ in range(5)
        ),
        input_output_aliases={0: 0, 1: 1, 2: 2, 3: 3, 4: 4},
        interpret=interpret,
    )(*args)
    return tuple(o[:k] for o in outs)


def _vote_kernel(lab_ref, cnt_ref, gid_ref, obs_ref, lab_out, cnt_out):
    lab = lab_ref[:]
    cnt = cnt_ref[:]
    gid = gid_ref[:]
    obs = obs_ref[:] > 0.0
    adopt = obs & (cnt <= 0.0)
    same = obs & (lab == gid) & ~adopt
    other = obs & ~adopt & ~same
    lab_out[:] = jnp.where(adopt, gid, lab)
    cnt_out[:] = jnp.where(
        adopt, 1.0, jnp.where(same, cnt + 1.0, jnp.where(other, cnt - 1.0, cnt))
    )


@functools.partial(jax.jit, static_argnums=(4,))
def fused_label_vote(
    label, count,  # (K, 512) i32 / f32 vote planes (gathered rows)
    gid, obs,  # (K, 512) observed ids (i32) and observation mask (f32)
    interpret: bool = False,
):
    """Boyer-Moore streaming-majority vote update in one fused pass."""
    k = label.shape[0]
    pad = (-k) % _TILE
    args = [label, count, gid, obs]
    if pad:
        args = [jnp.pad(a, ((0, pad), (0, 0))) for a in args]
    kp = k + pad
    spec = pl.BlockSpec((_TILE, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)
    lab, cnt = pl.pallas_call(
        _vote_kernel,
        grid=(kp // _TILE,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((kp, 512), jnp.int32),
            jax.ShapeDtypeStruct((kp, 512), jnp.float32),
        ),
        input_output_aliases={0: 0, 1: 1},
        interpret=interpret,
    )(*args)
    return lab[:k], cnt[:k]
