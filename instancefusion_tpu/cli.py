"""Command-line entry point.

Replaces the reference's Pangolin GUI app (`GUI/src/Main.cpp`,
`MainController` — expected layout, SURVEY.md §2 L7) with a headless CLI:
run a sequence (synthetic / TUM / ScanNet) through the engine, stream
per-frame JSONL metrics, and report ATE + throughput at the end.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _add_run_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--preset", default="config1", help="config1..config5")
    p.add_argument(
        "--dataset",
        default="synthetic",
        help="'synthetic', or a path to a TUM-format sequence directory",
    )
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--small", action="store_true", help="use the small test camera/volume")
    p.add_argument("--platform", default=None, help="force jax platform (e.g. cpu)")
    p.add_argument("--metrics-out", default=None, help="write JSONL metrics here")
    p.add_argument("--quiet", action="store_true")


def cmd_run(args: argparse.Namespace) -> int:
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from instancefusion_tpu.config import PRESETS
    from instancefusion_tpu.engine import slam
    from instancefusion_tpu.utils.ate import ate_rmse

    if args.small:
        import dataclasses

        from instancefusion_tpu.config import EngineConfig, IcpConfig, RaycastConfig, TsdfConfig
        from instancefusion_tpu.geometry.camera import Intrinsics

        cfg = EngineConfig(
            intrinsics=Intrinsics(fx=129.3, fy=129.1, cx=79.5, cy=59.5, width=160, height=120),
            tsdf=TsdfConfig(voxel_size=0.04, trunc=0.12, grid_size=96, origin=(-1.92, -1.92, -0.4)),
            icp=IcpConfig(iters=(10, 7, 7), min_valid=60, rgb_weight=0.0),
            raycast=RaycastConfig(near=0.2, far=4.0),
        )
    else:
        cfg = PRESETS[args.preset]()

    if args.dataset == "synthetic":
        from instancefusion_tpu.datasets import synthetic

        # Scale the synthetic room preset volume to the camera.
        poses = synthetic.orbit_trajectory(args.frames)
        frame_iter = (
            synthetic.render_frame(poses[i], cfg.intrinsics)
            for i in range(args.frames)
        )
        gt = np.asarray(poses)
        T0 = poses[0]
    else:
        from instancefusion_tpu.datasets import tum

        seq = tum.TumSequence(args.dataset, cfg.intrinsics)
        frame_iter = seq.frames(limit=args.frames or None)
        gt = seq.gt_poses(limit=args.frames or None)
        T0 = None if gt is None else gt[0]

    state = slam.init_state(cfg, T0)
    out = open(args.metrics_out, "w") if args.metrics_out else None
    est = []
    t_start = time.perf_counter()
    nframes = 0
    for i, frame in enumerate(frame_iter):
        depth, color = frame.depth, frame.color
        state, info = slam.step(cfg, state, depth, color)
        est.append(np.asarray(state.T_wc))
        nframes += 1
        rec = {
            "frame": i,
            "inliers": float(info.inliers),
            "residual_m": float(info.residual),
            "track_ok": bool(info.track_ok),
            "fused": float(info.fused_voxels),
        }
        if out:
            out.write(json.dumps(rec) + "\n")
        if not args.quiet:
            print(json.dumps(rec))
    elapsed = time.perf_counter() - t_start
    if out:
        out.close()

    summary = {
        "frames": nframes,
        "fps": nframes / max(elapsed, 1e-9),
        "elapsed_s": elapsed,
    }
    if gt is not None and len(est) == len(gt):
        summary["ate_rmse_m"] = ate_rmse(np.stack(est), gt)
    print(json.dumps({"summary": summary}))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="ifusion", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)
    runp = sub.add_parser("run", help="run SLAM over a sequence")
    _add_run_args(runp)
    args = parser.parse_args(argv)
    if args.cmd == "run":
        return cmd_run(args)
    parser.error(f"unknown command {args.cmd}")
    return 2


if __name__ == "__main__":
    sys.exit(main())
