"""Capture a jax.profiler trace of the bench step and print top ops.

Writes /tmp/ifl_trace, then parses the perfetto trace.json.gz to rank
device ops by total duration over the profiled frames.
"""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

from instancefusion_tpu.config import (
    EngineConfig, IcpConfig, PreprocessConfig, RaycastConfig, TsdfConfig,
)
from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.engine import slam
from instancefusion_tpu.geometry.camera import TUM_FR1

grid = 512
extent = grid * 0.0075
cfg = EngineConfig(
    intrinsics=TUM_FR1,
    tsdf=TsdfConfig(
        voxel_size=extent / grid * 2, trunc=6 * extent / grid * 2,
        grid_size=grid, origin=(-extent, -extent, 1.2 - extent),
        block_size=8, table_capacity=65536, touched_capacity=2048,
        use_pallas=True,
    ),
    icp=IcpConfig(iters=(10, 5, 4), rgb_weight=0.0, use_pallas=True,
                  assoc_every=(2, 2, 4)),
    raycast=RaycastConfig(near=0.2, far=4.0, use_depth_prior=True,
                          screen_space_normals=True, use_splat=True,
                          predict_color=False),
    preprocess=PreprocessConfig(use_pallas=True),
    map_kind="blocks", use_color=True,
)

poses = synthetic.orbit_trajectory(40)
frames = [synthetic.render_frame(poses[i], cfg.intrinsics) for i in range(40)]

state = slam.init_state(cfg, poses[0])
for i in range(10):
    state, info = slam.step_donated(cfg, state, frames[i].depth, frames[i].color)
float(jnp.sum(state.T_wc))

logdir = "/tmp/ifl_trace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    for i in range(10, 20):
        state, info = slam.step_donated(cfg, state, frames[i].depth,
                                        frames[i].color)
    float(jnp.sum(state.T_wc))

paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", paths, file=sys.stderr)
agg = defaultdict(float)
cnt = defaultdict(int)
pid_names = {}
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pn = pid_names.get(ev.get("pid"), "")
        if "TPU" not in pn and "/device" not in pn.lower():
            continue
        agg[ev["name"]] += ev.get("dur", 0)
        cnt[ev["name"]] += 1

total = sum(agg.values())
print(f"total device-op time over 10 frames: {total/1e3:.2f} ms")
for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
    print(f"{dur/1e3/10:9.3f} ms/frame  x{cnt[name]//10:<4d} {name[:110]}")
