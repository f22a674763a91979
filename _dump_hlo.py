"""Dump the optimized HLO of the bench step and summarize the big fusions."""
import re
import sys

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
                          screen_space_normals=True, use_splat=True),
    preprocess=PreprocessConfig(use_pallas=True),
    map_kind="blocks", use_color=True,
)

poses = synthetic.orbit_trajectory(2)
fr = synthetic.render_frame(poses[0], cfg.intrinsics)
state = slam.init_state(cfg, poses[0])

lowered = jax.jit(
    slam.step.__wrapped__, static_argnums=(0,)
).lower(cfg, state, fr.depth, fr.color)
txt = lowered.compile().as_text()
with open("/tmp/step_hlo.txt", "w") as f:
    f.write(txt)
print("bytes:", len(txt))

names = sys.argv[1:] or [
    "slice_bitcast_fusion", "pad_maximum_fusion", "wrapper",
    "fusion.5 ", "fusion.3 ", "fusion.4 ", "while.8",
]
lines = txt.splitlines()
for i, ln in enumerate(lines):
    for n in names:
        if re.match(rf"\s*%?{re.escape(n.strip())}[ .=]", ln.strip()) or \
           f" {n.strip()} = " in ln or ln.strip().startswith(n.strip() + " = "):
            print("L%d: %s" % (i, ln.strip()[:300]))
            break
