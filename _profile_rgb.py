"""Isolate the photometric-term cost: time icp.track with rgb off/on (TPU).

r5 finding: BENCH_RGB=0.1 bench.py measured 41.8 fps vs 213 with rgb
off.  Cause: `associate_rgb` used 4 XLA flat gathers per association
round (~1 ms each at VGA on this chip) while the geometric path gathers
via the one-hot MXU kernel.  After folding the rgb planes into the same
`gather_target_maps` contraction: 1.85 -> 2.21 ms/track (was 20.6), and
the full bench runs 178.7 fps with rgb on (predict_color accounts for
~6 of the remaining 16%).
"""
import time

import jax
import jax.numpy as jnp

from instancefusion_tpu.config import IcpConfig, PreprocessConfig
from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.geometry.camera import TUM_FR1
from instancefusion_tpu.ops import icp, preprocess

intr = TUM_FR1
poses = synthetic.orbit_trajectory(12)
f0 = synthetic.render_frame(poses[0], intr)
f1 = synthetic.render_frame(poses[1], intr)
pcfg = PreprocessConfig(use_pallas=True)
pyr = preprocess.build_frame_pyramid(
    f0.depth, intr, pcfg, 3, preprocess.rgb_to_intensity(f0.color)
)
pyr1 = preprocess.build_frame_pyramid(
    f1.depth, intr, pcfg, 3, preprocess.rgb_to_intensity(f1.color)
)

# Fake prediction maps straight from frame 1's geometry (world frame).
R = jnp.asarray(poses[1][:3, :3])
t = jnp.asarray(poses[1][:3, 3])
pv = pyr1[0]["vmap"] @ R.T + t
pn = pyr1[0]["nmap"] @ R.T
pval = pyr1[0]["valid"]
pdepth = f1.depth
pint = pyr1[0]["intensity"]


def run(rgb_w, n=30):
    cfg = IcpConfig(iters=(10, 5, 4), rgb_weight=rgb_w, use_pallas=True,
                    assoc_every=(2, 2, 4))

    @jax.jit
    def tr(pyr, pv, pn, pval, T0, pd, pi):
        r = icp.track(pyr, pv, pn, pval, T0, jnp.asarray(poses[1]), intr,
                      cfg, pred_intensity=pi if rgb_w > 0 else None,
                      pred_depth=pd)
        return r.T_wc

    T0 = jnp.asarray(poses[1])
    out = tr(pyr, pv, pn, pval, T0, pdepth, pint)
    float(jnp.sum(out))  # compile + fetch-sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = tr(pyr, pv, pn, pval, T0, pdepth, pint)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / n
    print(f"rgb_weight={rgb_w}: {dt*1e3:.2f} ms/track")


if __name__ == "__main__":
    run(0.0)
    run(0.1)
