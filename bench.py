"""Headline benchmark: fused frames/s/chip (BASELINE.json metric).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Runs the full per-frame pipeline (preprocess -> 3-level ICP -> TSDF
integrate -> raycast prediction) on the real TPU chip over synthetic
frames.  The baseline target is >= 30 fused frames/s/chip at 512^3
(BASELINE.md); `vs_baseline` is value / 30.

Current configuration: dense TSDF engine. The grid defaults to the largest
dense setting that exercises the 512^3-class workload; override with
BENCH_GRID / BENCH_FRAMES env vars.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from instancefusion_tpu.config import (
        EngineConfig,
        IcpConfig,
        PreprocessConfig,
        RaycastConfig,
        TsdfConfig,
    )
    from instancefusion_tpu.datasets import synthetic
    from instancefusion_tpu.engine import slam
    from instancefusion_tpu.geometry.camera import TUM_FR1

    grid = int(os.environ.get("BENCH_GRID", "512"))
    nframes = int(os.environ.get("BENCH_FRAMES", "30"))
    warmup = 3

    extent = grid * 0.0075  # keep the synthetic room inside the volume
    cfg = EngineConfig(
        intrinsics=TUM_FR1,
        tsdf=TsdfConfig(
            voxel_size=extent / grid * 2,  # ~1.5cm at 512
            trunc=6 * extent / grid * 2,
            grid_size=grid,
            origin=(-extent, -extent, 1.2 - extent),
        ),
        icp=IcpConfig(iters=(10, 5, 4), rgb_weight=0.0),
        raycast=RaycastConfig(near=0.2, far=4.0),
        preprocess=PreprocessConfig(),
        map_kind="dense",
        use_color=True,
    )

    poses = synthetic.orbit_trajectory(nframes + warmup)
    # Pre-render frames on device (rendering is not part of the timed loop).
    frames = [
        synthetic.render_frame(poses[i], cfg.intrinsics)
        for i in range(nframes + warmup)
    ]
    jax.block_until_ready(frames[-1].depth)

    state = slam.init_state(cfg, poses[0])
    for i in range(warmup):
        state, info = slam.step(cfg, state, frames[i].depth, frames[i].color)
    jax.block_until_ready(state.volume.sdf)

    t0 = time.perf_counter()
    for i in range(warmup, warmup + nframes):
        state, info = slam.step(cfg, state, frames[i].depth, frames[i].color)
    jax.block_until_ready(state.volume.sdf)
    dt = time.perf_counter() - t0

    fps = nframes / dt
    print(
        json.dumps(
            {
                "metric": f"fused_frames_per_s_per_chip_{grid}cubed",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
