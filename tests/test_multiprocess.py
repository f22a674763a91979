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
