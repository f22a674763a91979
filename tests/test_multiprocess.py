"""Multi-process `jax.distributed` coverage (SURVEY §5 multi-host row).

The 8-virtual-device single-process mesh exercises the collective MATH;
this exercises the PROCESS-BOUNDARY machinery the pod path actually uses:
`initialize_multihost` (coordinator handshake), per-process device
visibility, global-array construction from process-local chunks, and a
cross-process psum through the sharded Schur-BA reducer — all on
localhost CPU, no cluster (the same code path as ICI/DCN by construction;
`shard_map` is backend-agnostic).
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from instancefusion_tpu.parallel.mesh import initialize_multihost

initialize_multihost(
    coordinator=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc, jax.process_count()

import numpy as np
import jax.numpy as jnp
from jax.experimental import multihost_utils
from jax.sharding import PartitionSpec as P

from instancefusion_tpu.ops import ba
from instancefusion_tpu.parallel import mesh as meshmod, shard

mesh = meshmod.make_mesh()  # all global devices (one per process)
S_total = jax.device_count()
assert S_total == nproc

# Deterministic paired-BA problem, identical in every process.
rng = np.random.default_rng(0)
m, L = 4, 8 * S_total
gt = np.stack([np.eye(4, dtype=np.float32)] * m)
pts = rng.uniform(-1, 1, (L, 3)).astype(np.float32)
pts[:, 2] += 3.0
ka = rng.integers(0, m, L).astype(np.int32)
kb = ((ka + 1) % m).astype(np.int32)
za = pts + rng.normal(0, 0.01, pts.shape).astype(np.float32)
zb = pts + rng.normal(0, 0.01, pts.shape).astype(np.float32)
obs_full = ba.PairedObs(
    ka=jnp.asarray(ka), kb=jnp.asarray(kb), za=jnp.asarray(za),
    zb=jnp.asarray(zb), weight=jnp.ones((L,)), valid=jnp.ones((L,), bool),
)
poses_full = jnp.asarray(gt)
pts_full = jnp.asarray(pts)

# Golden: single-device terms on the full problem (deterministic).
S0, rhs0, *_rest0, c0 = ba.paired_terms(poses_full, pts_full, obs_full)

# Global arrays from process-local chunks: this process owns rows
# [pid*L/nproc, (pid+1)*L/nproc) of the landmark axis.
lo, hi = pid * (L // nproc), (pid + 1) * (L // nproc)
to_glob = lambda x, spec: multihost_utils.host_local_array_to_global_array(
    x, mesh, spec
)
obs_g = ba.PairedObs(*[to_glob(x[lo:hi], P("shards")) for x in obs_full])
poses_g = to_glob(poses_full, P())
pts_g = to_glob(pts_full[lo:hi], P("shards"))

terms = shard.sharded_paired_terms(mesh)
S1, rhs1, _hll, _wa, _wb, _bl, c1 = jax.jit(terms)(poses_g, pts_g, obs_g)

# Replicated outputs are addressable everywhere; compare to the golden.
S1_local = np.asarray(S1.addressable_data(0))
rhs1_local = np.asarray(rhs1.addressable_data(0))
np.testing.assert_allclose(S1_local, np.asarray(S0), atol=1e-5)
np.testing.assert_allclose(rhs1_local, np.asarray(rhs0), atol=1e-5)
np.testing.assert_allclose(
    float(np.asarray(c1.addressable_data(0))), float(c0), rtol=1e-5
)
print(f"MPOK pid={pid} procs={jax.process_count()} devices={S_total}",
      flush=True)
"""


@pytest.mark.slow
def test_two_process_distributed_schur_reduction(tmp_path):
    """Spawn 2 localhost processes; the psum'd reduced camera system must
    match the single-device golden computed independently in each."""
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process
    port = "12473"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd="/root/repo", text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out[-3000:]}"
        assert f"MPOK pid={pid} procs=2" in out, out[-2000:]


_ENGINE_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")
pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from instancefusion_tpu.parallel.mesh import initialize_multihost

initialize_multihost(
    coordinator=f"localhost:{port}", num_processes=nproc, process_id=pid
)
assert jax.process_count() == nproc

import dataclasses
import numpy as np
import jax.numpy as jnp

from instancefusion_tpu.config import RaycastConfig
from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.engine import slam_sharded
from instancefusion_tpu.parallel import mesh as meshmod
from tests.helpers import SMALL_CFG, SMALL_INTR, SMALL_TSDF

cfg = dataclasses.replace(
    SMALL_CFG,
    map_kind="blocks",
    num_shards=nproc,
    tsdf=dataclasses.replace(SMALL_TSDF, table_capacity=4096, touched_capacity=512),
    raycast=RaycastConfig(near=0.2, far=4.0, use_depth_prior=True,
                          screen_space_normals=True, use_splat=True,
                          splat_rmax=3),
)
mesh = meshmod.make_mesh()  # spans both processes, one device each
n = 3
poses = synthetic.orbit_trajectory(max(n, 2))
frames = [synthetic.render_frame(poses[i], SMALL_INTR) for i in range(n)]

# The ENGINE's own entry points on the cross-process mesh — no
# special-casing on process_count anywhere in engine code.
state = slam_sharded.init_state(cfg, mesh, frames[0].T_wc)
step = slam_sharded.make_step(cfg, mesh)
for f in frames:
    state, info = step(state, f.depth, f.color)
    assert bool(np.asarray(info.track_ok.addressable_data(0))), "lost"

T = np.asarray(state.T_wc.addressable_data(0))
n_active = np.asarray(state.n_active_global().addressable_data(0)) \
    if hasattr(state, "n_active_global") else np.asarray(
        state.volume.n_active.addressable_data(0))
print("ENGOK pid=%d T=%s nact=%s" % (
    pid, ",".join("%.6f" % v for v in T[:3, 3]),
    ",".join(str(int(v)) for v in np.atleast_1d(n_active)),
), flush=True)
"""


@pytest.mark.slow
def test_two_process_sharded_engine_steps(tmp_path):
    """VERDICT r4 Missing #3: the REAL sharded engine — replicated-input
    band allocation, group/slot integrate, raw-plane psum splat
    compositing, the composited-map ICP — runs across 2 OS processes via
    the engine's own init_state/make_step, and its trajectory matches the
    single-process 2-virtual-device golden."""
    import dataclasses

    import jax
    import numpy as np

    if jax.device_count() < 2:
        pytest.skip("needs >= 2 virtual devices for the golden")

    # Golden: same engine on a single-process 2-device mesh.
    from instancefusion_tpu.config import RaycastConfig
    from instancefusion_tpu.datasets import synthetic
    from instancefusion_tpu.engine import slam_sharded
    from instancefusion_tpu.parallel import mesh as meshmod
    from tests.helpers import SMALL_CFG, SMALL_INTR, SMALL_TSDF

    cfg = dataclasses.replace(
        SMALL_CFG,
        map_kind="blocks",
        num_shards=2,
        tsdf=dataclasses.replace(
            SMALL_TSDF, table_capacity=4096, touched_capacity=512
        ),
        raycast=RaycastConfig(near=0.2, far=4.0, use_depth_prior=True,
                              screen_space_normals=True, use_splat=True,
                              splat_rmax=3),
    )
    mesh = meshmod.make_mesh(2)
    n = 3
    poses = synthetic.orbit_trajectory(max(n, 2))
    frames = [synthetic.render_frame(poses[i], SMALL_INTR) for i in range(n)]
    state = slam_sharded.init_state(cfg, mesh, frames[0].T_wc)
    step = slam_sharded.make_step(cfg, mesh)
    for f in frames:
        state, _ = step(state, f.depth, f.color)
    T_gold = np.asarray(state.T_wc)
    nact_gold = np.asarray(state.volume.n_active)

    worker = tmp_path / "engine_worker.py"
    worker.write_text(_ENGINE_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one device per process
    # The worker lives in tmp_path, so sys.path[0] is tmp_path, not the
    # repo — make `tests.helpers` importable explicitly.
    env["PYTHONPATH"] = "/root/repo" + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
    )
    port = "12479"
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd="/root/repo", text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out[-3000:]}"
        assert f"ENGOK pid={pid}" in out, out[-2000:]

    # Cross-process trajectory and per-shard occupancy match the golden.
    import re

    m = re.search(r"ENGOK pid=0 T=([\-0-9.,]+) nact=([0-9,]+)", outs[0])
    assert m, outs[0][-2000:]
    t_mp = np.array([float(v) for v in m.group(1).split(",")])
    nact_mp = np.array([int(v) for v in m.group(2).split(",")])
    np.testing.assert_allclose(t_mp, T_gold[:3, 3], atol=1e-4)
    np.testing.assert_array_equal(nact_mp, nact_gold)
