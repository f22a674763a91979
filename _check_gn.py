"""TPU check: fused GN inner-loop kernel vs the jnp fixed-correspondence loop."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from instancefusion_tpu.config import (
    EngineConfig, IcpConfig, PreprocessConfig, RaycastConfig, TsdfConfig,
)
from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.engine import slam
from instancefusion_tpu.geometry.camera import TUM_FR1
from instancefusion_tpu.ops import icp, preprocess

grid = 512
extent = grid * 0.0075
cfg = EngineConfig(
    intrinsics=TUM_FR1,
    tsdf=TsdfConfig(voxel_size=extent / grid * 2, trunc=6 * extent / grid * 2,
                    grid_size=grid, origin=(-extent, -extent, 1.2 - extent),
                    block_size=8, table_capacity=65536, touched_capacity=2048,
                    use_pallas=True),
    icp=IcpConfig(iters=(10, 5, 4), rgb_weight=0.0, use_pallas=True,
                  assoc_every=2),
    raycast=RaycastConfig(near=0.2, far=4.0, use_depth_prior=True,
                          screen_space_normals=True, use_splat=True),
    preprocess=PreprocessConfig(use_pallas=True),
    map_kind="blocks", use_color=True,
)
intr = cfg.intrinsics
poses = synthetic.orbit_trajectory(12)
frames = [synthetic.render_frame(poses[i], intr) for i in range(12)]
state = slam.init_state(cfg, poses[0])
for i in range(10):
    state, _ = slam.step(cfg, state, frames[i].depth, frames[i].color)
pyr = jax.jit(lambda d: preprocess.build_frame_pyramid(
    d, intr, cfg.preprocess, 3))(frames[10].depth)
pv, pn, pval, T = state.pred.vertex_w, state.pred.normal_w, state.pred.valid, state.T_wc
src = pyr[0]

# Build correspondences once.
assoc = jax.jit(lambda s, pv, pn, pval, T: icp.associate(
    s["vmap"], s["valid"], pv, pn, pval, T, jnp.linalg.inv(T), intr, cfg.icp))
q_w, n_t, a_ok = assoc(src, pv, pn, pval, T)

# jnp reference: 3 fixed-correspondence GN steps.
def jnp_inner(T0, n_steps=3):
    Tc = T0
    nin = rsum = jnp.zeros(())
    for _ in range(n_steps):
        H6, b6, nin, rsum = icp.reduce_equations(
            src["vmap"], src["nmap"], src["valid"], q_w, n_t, a_ok, Tc,
            cfg.icp.__class__(**{**cfg.icp.__dict__, "use_pallas": False}),
        )
        xi = icp.solve_increment(H6, b6, cfg.icp)
        ok = nin >= cfg.icp.min_valid
        xi = jnp.where(ok, xi, jnp.zeros_like(xi))
        from instancefusion_tpu.geometry.se3 import se3_exp
        Tc = jnp.matmul(se3_exp(xi), Tc, precision=jax.lax.Precision.HIGHEST)
    return Tc, nin, rsum

T_ref, nin_ref, rsum_ref = jax.jit(jnp_inner)(T)

from instancefusion_tpu.ops.pallas.icp import gn_iterations

gate = (src["valid"].reshape(-1) & a_ok).astype(jnp.float32)
fused = jax.jit(lambda T0: gn_iterations(
    src["vmap"].reshape(-1, 3), src["nmap"].reshape(-1, 3), q_w, n_t, gate,
    T0, inner_n=3, dist_thresh=cfg.icp.dist_thresh,
    angle_thresh=cfg.icp.angle_thresh, huber_delta=cfg.icp.huber_delta,
    damping=cfg.icp.damping, min_valid=cfg.icp.min_valid))
T_got, nin_got, rsum_got = fused(T)
print("T err:", float(jnp.max(jnp.abs(T_got - T_ref))))
print("nin:", float(nin_got), "vs", float(nin_ref))
print("rsum:", float(rsum_got), "vs", float(rsum_ref))
np.testing.assert_allclose(np.asarray(T_got), np.asarray(T_ref),
                           atol=2e-4)
assert abs(float(nin_got) - float(nin_ref)) < 5

# Timing: fused vs jnp inner, and full track/step.
def t(name, fn, *a, n=30):
    out = fn(*a)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*a)
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1e3:7.3f} ms")

t("fused gn x3", fused, T)
t("jnp inner x3", jax.jit(jnp_inner), T)
tr = jax.jit(lambda pyr, pv, pn, pval, T: icp.track(
    pyr, pv, pn, pval, T, T, intr, cfg.icp))
t("track (10,5,4) ae=2 fused", tr, pyr, pv, pn, pval, T)
s = state
out = slam.step(cfg, s, frames[10].depth, frames[10].color)
float(jnp.sum(out[0].T_wc))
t0 = time.perf_counter()
for i in range(30):
    s, _ = slam.step(cfg, s, frames[10].depth, frames[10].color)
float(jnp.sum(s.T_wc))
print(f"FULL step: {(time.perf_counter()-t0)/30*1e3:.3f} ms")
