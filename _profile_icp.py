"""ICP cost breakdown on TPU at bench config."""
import time
import jax, jax.numpy as jnp

from instancefusion_tpu.config import EngineConfig, IcpConfig, PreprocessConfig, RaycastConfig, TsdfConfig
from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.engine import slam
from instancefusion_tpu.geometry.camera import TUM_FR1
from instancefusion_tpu.ops import icp, preprocess
from instancefusion_tpu.geometry.se3 import se3_inverse

grid = 512
extent = grid * 0.0075
cfg = EngineConfig(
    intrinsics=TUM_FR1,
    tsdf=TsdfConfig(voxel_size=extent / grid * 2, trunc=6 * extent / grid * 2,
                    grid_size=grid, origin=(-extent, -extent, 1.2 - extent),
                    block_size=8, table_capacity=65536, touched_capacity=2048,
                    use_pallas=True),
    icp=IcpConfig(iters=(10, 5, 4), rgb_weight=0.0, use_pallas=True),
    raycast=RaycastConfig(near=0.2, far=4.0, use_depth_prior=True,
                          screen_space_normals=True, use_splat=True),
    preprocess=PreprocessConfig(use_pallas=True),
    map_kind="blocks", use_color=True,
)
intr = cfg.intrinsics
poses = synthetic.orbit_trajectory(40)
frames = [synthetic.render_frame(poses[i], intr) for i in range(40)]
state = slam.init_state(cfg, poses[0])
for i in range(8):
    state, info = slam.step(cfg, state, frames[i].depth, frames[i].color)
depth, color = frames[8].depth, frames[8].color
intensity = preprocess.rgb_to_intensity(color)
pyr = preprocess.build_frame_pyramid(depth, intr, cfg.preprocess, cfg.icp.levels, intensity)
pyr = jax.tree.map(lambda x: x, pyr)


def _sync(out):
    leaves = [l for l in jax.tree.leaves(out) if hasattr(l, "dtype")]
    return float(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32))))


def timeit(name, fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _sync(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1e3:8.3f} ms")
    return out


T = state.T_wc
T_cw = se3_inverse(T)

# One linearization at each level
for lvl in range(3):
    src = pyr[lvl]
    intr_l = intr.level(lvl)
    tv, tn, tval = icp._subsample_maps(state.pred.vertex_w, state.pred.normal_w, state.pred.valid, lvl)
    bne = jax.jit(lambda vm, nm, vs, tv, tn, tva, T: icp.build_normal_equations(
        vm, nm, vs, tv, tn, tva, T, T_cw, intr_l, cfg.icp))
    timeit(f"build_normal_equations lvl{lvl}", bne,
           src["vmap"], src["nmap"], src["valid"], tv, tn, tval, T)

# gather kernel alone at level 0
from instancefusion_tpu.ops.pallas.icp import gather_target_maps, reduce_normal_equations
from instancefusion_tpu.geometry.camera import project
from instancefusion_tpu.geometry.se3 import transform_points, rotate_vectors

src = pyr[0]
h, w = intr.height, intr.width

def assoc(vm, T):
    p_w = transform_points(T, vm.reshape(-1, 3))
    p_tc = transform_points(T_cw, p_w)
    u, v, z = project(intr, p_tc)
    return p_w, u.reshape(h, w), v.reshape(h, w), z

p_w, u, v, z = jax.jit(assoc)(src["vmap"], T)
sel = src["valid"] & (z > 0).reshape(h, w)
timeit("assoc math (transform+project) lvl0", jax.jit(assoc), src["vmap"], T)
g = jax.jit(lambda u, v, sel: gather_target_maps(
    u, v, sel, state.pred.vertex_w, state.pred.normal_w, state.pred.valid))
q_w, n_t, av = timeit("gather_target_maps lvl0", g, u, v, sel)
m = av.reshape(-1).astype(jnp.float32)
r = jax.jit(lambda p, n, q, m: reduce_normal_equations(
    p.reshape(-1, 3), n.reshape(-1, 3), q.reshape(-1, 3), m))
timeit("reduce_normal_equations lvl0", r, p_w, n_t, q_w, m)

# subsample slicing cost
ss = jax.jit(lambda a, b, c: icp._subsample_maps(a, b, c, 2))
timeit("_subsample_maps lvl2", ss, state.pred.vertex_w, state.pred.normal_w, state.pred.valid)
