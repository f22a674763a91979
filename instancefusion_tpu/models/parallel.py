"""Data- and tensor-parallel execution of the segmentation head.

SURVEY.md §3.2 first-class parallelism strategies for the network side:

- **DP**: keyframe segmentation batches shard over the mesh's device axis
  (`pjit` with a batch-sharded input) — the multi-sequence / keyframe-
  backlog case.  Params replicate; there is no gradient sync to worry
  about at inference, and for training the mean-loss grads are psum'd by
  GSPMD automatically.
- **TP**: the head's conv kernels shard on their output-channel dim over
  the same axis (`NamedSharding`), GSPMD inserting the activation
  collectives — the large-backbone case.  At this head's default width
  TP is overkill (documented; the machinery matters for swapping in a
  bigger backbone, which the config exposes via `width`).

Both return plain callables; the caller owns the mesh (parallel/mesh.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from instancefusion_tpu.models import segmentation as seg
from instancefusion_tpu.parallel.mesh import SHARD_AXIS


def dp_segment_fn(mesh: Mesh, num_classes: int, max_instances: int,
                  width: int = 32):
    """Batched segmentation with the batch axis sharded over the mesh.

    Returns `fn(params, rgb f32[B,H,W,3]) -> Segmentation` with leading
    batch dims on every Segmentation field; B must be divisible by the
    mesh axis size.
    """
    batch_sharding = NamedSharding(mesh, P(SHARD_AXIS))
    replicated = NamedSharding(mesh, P())

    def _one(params, rgb):
        return seg.segment(params, rgb, num_classes, max_instances, width)

    fn = jax.jit(
        jax.vmap(_one, in_axes=(None, 0)),
        in_shardings=(replicated, batch_sharding),
    )
    return fn


def tp_param_shardings(params, mesh: Mesh):
    """NamedSharding tree for tensor-parallel head params.

    Conv kernels (H, W, Cin, Cout) shard on Cout when divisible by the
    mesh axis; everything else (biases, norm scales, odd-sized outputs
    like the 1/2/num_classes prediction convs) replicates.  GSPMD then
    partitions the matmul-heavy convs and all-gathers activations where
    layers disagree — standard Megatron-style column parallelism, derived
    from shardings rather than hand-written collectives.
    """
    n = mesh.shape[SHARD_AXIS]

    def spec(x):
        if x.ndim == 4 and x.shape[-1] % n == 0 and x.shape[-1] >= n:
            return NamedSharding(mesh, P(None, None, None, SHARD_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec, params)


def tp_segment_fn(mesh: Mesh, num_classes: int, max_instances: int,
                  width: int = 32):
    """Single-frame segmentation with tensor-parallel params.

    Returns (shard_params, fn): call `params = shard_params(params)` once
    to lay the weights out over the mesh, then `fn(params, rgb)` runs the
    GSPMD-partitioned forward.
    """
    replicated = NamedSharding(mesh, P())

    def shard_params(params):
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s),
            params, tp_param_shardings(params, mesh),
        )

    def _one(params, rgb):
        return seg.segment(params, rgb, num_classes, max_instances, width)

    fn = jax.jit(_one, in_shardings=(None, replicated),
                 out_shardings=replicated)
    return shard_params, fn
