"""Sharded-engine fps at the graded bench config (VERDICT r4 Weak #1).

Runs engine/slam_sharded on a 1-device mesh (this box's single TPU chip)
with EXACTLY bench.py's 512^3/VGA configuration, so the number is
directly comparable to the single-chip headline: the r4 gap was
166 vs 210 fps (0.79x) from slot-list vs group-in-place addressing in
the shard bodies; the r5 port of the group kernels into
shard._fused_step_shard should close it to >= 0.9x.

Env: BENCH_GRID/BENCH_FRAMES/BENCH_TOUCHED as bench.py; SHARDS (default 1);
BENCH_CHUNK=K replays K frames per dispatch via slam_sharded.make_run_chunk
(the sharded analog of bench.py's chunked mode — amortizes the per-frame
dispatch that is the residual gap vs the single-chip engine).
Fetch-synced timing (axon's block_until_ready does not sync).
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    shards = int(os.environ.get("SHARDS", "1"))
    if os.environ.get("BENCH_PLATFORM") == "cpu" and jax.device_count() < shards:
        jax.config.update("jax_num_cpu_devices", shards)
    import jax.numpy as jnp

    from instancefusion_tpu.config import (
        EngineConfig, IcpConfig, PreprocessConfig, RaycastConfig, TsdfConfig,
    )
    from instancefusion_tpu.datasets import synthetic
    from instancefusion_tpu.engine import slam_sharded
    from instancefusion_tpu.geometry.camera import TUM_FR1
    from instancefusion_tpu.parallel import mesh as meshmod

    grid = int(os.environ.get("BENCH_GRID", "512"))
    nframes = int(os.environ.get("BENCH_FRAMES", "30"))
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = os.environ.get("BENCH_PALLAS", "1" if on_tpu else "0") == "1"
    warmup = 3
    touched_cap = int(os.environ.get("BENCH_TOUCHED", "2048"))
    extent = grid * 0.0075
    cfg = EngineConfig(
        intrinsics=TUM_FR1,
        tsdf=TsdfConfig(
            voxel_size=extent / grid * 2,
            trunc=6 * extent / grid * 2,
            grid_size=grid,
            origin=(-extent, -extent, 1.2 - extent),
            block_size=8,
            table_capacity=65536,
            touched_capacity=touched_cap,
            use_pallas=use_pallas,
        ),
        icp=IcpConfig(iters=(10, 5, 4), rgb_weight=0.0, use_pallas=use_pallas,
                      assoc_every=(2, 2, 4)),
        raycast=RaycastConfig(near=0.2, far=4.0, use_depth_prior=True,
                              screen_space_normals=True,
                              use_splat=on_tpu or os.environ.get("BENCH_SPLAT") == "1",
                              predict_color=False),
        preprocess=PreprocessConfig(use_pallas=use_pallas),
        map_kind="blocks",
        use_color=True,
        color_every=int(os.environ.get("BENCH_COLOR_EVERY", "4")),
        num_shards=shards,
    )

    mesh = meshmod.make_mesh(shards)
    poses = synthetic.orbit_trajectory(nframes + warmup)
    frames = [
        synthetic.render_frame(poses[i], cfg.intrinsics)
        for i in range(nframes + warmup)
    ]
    state = slam_sharded.init_state(cfg, mesh, poses[0])
    step = slam_sharded.make_step(cfg, mesh, donate=True)
    chunk = int(os.environ.get("BENCH_CHUNK", "0"))

    def sync(state) -> float:
        return float(jnp.sum(state.T_wc))

    for i in range(warmup):
        state, _ = step(state, frames[i].depth, frames[i].color)
    sync(state)
    if chunk:
        assert nframes % chunk == 0, "BENCH_FRAMES must be a multiple of BENCH_CHUNK"
        run_chunk = slam_sharded.make_run_chunk(cfg, mesh)
        staged = [
            (
                jnp.stack([f.depth for f in frames[i : i + chunk]]),
                jnp.stack([f.color for f in frames[i : i + chunk]]),
            )
            for i in range(warmup, warmup + nframes, chunk)
        ]
        state, _ = run_chunk(state, *staged[0])  # compile
        sync(state)
        staged = staged[1:] + [staged[0]]
        t0 = time.perf_counter()
        for d, c in staged:
            state, _ = run_chunk(state, d, c)
        sync(state)
        dt = time.perf_counter() - t0
    else:
        t0 = time.perf_counter()
        for i in range(warmup, warmup + nframes):
            state, _ = step(state, frames[i].depth, frames[i].color)
        sync(state)
        dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"sharded_frames_per_s_{grid}cubed_{shards}shard",
        "value": round(nframes / dt, 3),
        "unit": "frames/s",
        "color_every": cfg.color_every,
        "chunk": chunk,
    }))


if __name__ == "__main__":
    main()
