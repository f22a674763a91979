"""Headline benchmark: fused frames/s/chip (BASELINE.json metric).

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Runs the full per-frame pipeline (preprocess -> 3-level ICP -> TSDF
integrate -> raycast prediction) on the real TPU chip over synthetic
frames at 640x480 with a 512^3 block-hashed TSDF (the BASELINE headline
configuration; >= 30 fused frames/s/chip is the target).

Timing is fetch-synced: this box's axon relay completes
`jax.block_until_ready` before device execution finishes, so the timed
region ends with a scalar `device_get` that cannot resolve until every
chained step has executed.  Steps are chained (state feeds state) so no
step can be elided or overlapped out of the measurement.

Env overrides: BENCH_GRID (512), BENCH_FRAMES (30), BENCH_MAP
(blocks|dense).
"""

from __future__ import annotations

import json
import os
import time


def _arm_watchdog(seconds: float) -> None:
    """Print a JSON failure line and hard-exit if the run wedges.

    This box's TPU is reached over a relay tunnel that can wedge so hard
    that even `jax.devices()` blocks forever; a benchmark that hangs
    records nothing.  The watchdog guarantees ONE JSON line either way.
    """
    import threading

    def fire():
        print(
            json.dumps(
                {
                    "metric": "fused_frames_per_s_per_chip",
                    "value": 0.0,
                    "unit": "frames/s",
                    "vs_baseline": 0.0,
                    "error": f"watchdog: no result within {seconds:.0f}s "
                    "(TPU tunnel unreachable?)",
                }
            ),
            flush=True,
        )
        # Do NOT hard-exit here: os._exit mid-compile-RPC is exactly the
        # kill-a-client-mid-RPC failure mode that wedged the relay for
        # every later process (observed 2026-08-21, ~75 min outage).
        # The JSON failure line is out; give any in-flight RPC a long
        # grace period to complete before exiting.
        import threading as _t

        _t.Timer(600.0, lambda: os._exit(3)).start()

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    global _WATCHDOG
    _WATCHDOG = t


_WATCHDOG = None


def main() -> None:
    # 512^3 compile is ~1-2 min alone but several minutes when the host is
    # also compiling CPU-mesh tests; leave generous headroom — the
    # watchdog's os._exit lands mid-RPC and can wedge the relay tunnel
    # for every later process (observed 2026-08-21), so firing it on a
    # merely-slow compile is far worse than waiting longer.
    _arm_watchdog(float(os.environ.get("BENCH_WATCHDOG_S", "1500")))
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp

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
    map_kind = os.environ.get("BENCH_MAP", "blocks")
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = os.environ.get("BENCH_PALLAS", "1" if on_tpu else "0") == "1"
    warmup = 3

    use_splat = os.environ.get("BENCH_SPLAT", "1" if on_tpu else "0") == "1"
    touched_cap = int(os.environ.get("BENCH_TOUCHED", "2048"))
    extent = grid * 0.0075  # keep the synthetic room inside the volume
    cfg = EngineConfig(
        intrinsics=TUM_FR1,
        tsdf=TsdfConfig(
            voxel_size=extent / grid * 2,  # ~1.5cm at 512
            trunc=6 * extent / grid * 2,
            grid_size=grid,
            origin=(-extent, -extent, 1.2 - extent),
            block_size=8,
            table_capacity=65536,
            touched_capacity=touched_cap,
            use_pallas=use_pallas,
            bin_groups=os.environ.get("BENCH_BIN", "0") == "1",
        ),
        icp=IcpConfig(iters=(10, 5, 4),
                      # BENCH_RGB: photometric-term weight (VERDICT r4
                      # Weak #3 — measure it where it counts).  The
                      # recorded headline stays geometric-only unless set.
                      rgb_weight=float(os.environ.get("BENCH_RGB", "0.0")),
                      use_pallas=use_pallas,
                      assoc_every=(2, 2, 4)),
        raycast=RaycastConfig(near=0.2, far=4.0, use_depth_prior=True,
                              screen_space_normals=True, use_splat=use_splat,
                              predict_color=os.environ.get(
                                  "BENCH_PREDCOLOR", "0") == "1"),
        preprocess=PreprocessConfig(use_pallas=use_pallas),
        map_kind=map_kind,
        use_color=True,
        color_every=int(os.environ.get("BENCH_COLOR_EVERY", "4")),
    )

    poses = synthetic.orbit_trajectory(nframes + warmup)
    # Pre-render frames on device (rendering is not part of the timed loop).
    frames = [
        synthetic.render_frame(poses[i], cfg.intrinsics)
        for i in range(nframes + warmup)
    ]

    def sync(state) -> float:
        # Scalar fetch forces execution of the whole dependency chain.
        return float(jnp.sum(state.T_wc))

    # Chunked offline-log replay (slam.run_chunk): K frames per dispatch,
    # identical per-frame pipeline, host dispatch amortized.  chunk=1
    # falls back to the per-frame step_donated driver (live mode).
    chunk = int(os.environ.get("BENCH_CHUNK", "6"))

    state = slam.init_state(cfg, poses[0])
    for i in range(warmup):
        state, info = slam.step_donated(
            cfg, state, frames[i].depth, frames[i].color
        )
    sync(state)

    if chunk > 1:
        assert nframes % chunk == 0, "BENCH_FRAMES must be a multiple of BENCH_CHUNK"
        batches = [
            (
                jnp.stack([frames[i + j].depth for j in range(chunk)]),
                jnp.stack([frames[i + j].color for j in range(chunk)]),
            )
            for i in range(warmup, warmup + nframes, chunk)
        ]
        # Warm the chunk program too (donates state; rebind).
        state, _ = slam.run_chunk(cfg, state, *batches[0])
        sync(state)
        t0 = time.perf_counter()
        for d, c in batches:
            state, _ = slam.run_chunk(cfg, state, d, c)
        sync(state)
        dt = time.perf_counter() - t0
        fps = nframes / dt
    else:
        t0 = time.perf_counter()
        for i in range(warmup, warmup + nframes):
            state, info = slam.step_donated(
                cfg, state, frames[i].depth, frames[i].color
            )
        sync(state)
        dt = time.perf_counter() - t0
        fps = nframes / dt
    if _WATCHDOG is not None:
        _WATCHDOG.cancel()
    # One honest record: the measurement MODE rides along with the number
    # (chunked offline replay vs per-frame live dispatch, and the color
    # cadence) so rounds stay comparable — per-frame live mode (chunk=1,
    # color_every=1) measures ~4-8% below the chunked default here.
    print(
        json.dumps(
            {
                "metric": f"fused_frames_per_s_per_chip_{grid}cubed_{map_kind}",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / 30.0, 3),
                "chunk": chunk,
                "color_every": cfg.color_every,
                "predict_color": cfg.raycast.predict_color,
            }
        )
    )


if __name__ == "__main__":
    main()
