"""Active/inactive local loop closure (engine/localloop.py).

Unit-level: per-block stamp/gap bookkeeping in slam.step; end-level: a
drifted pose is pulled back onto the old (inactive) geometry by the
model-to-model registration, mirroring the reference's ElasticFusion-style
local loops (SURVEY.md §3 "Local loop closure").
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.engine import localloop as ll, slam
from instancefusion_tpu.geometry.se3 import se3_exp
from tests.helpers import SMALL_CFG, SMALL_INTR, SMALL_TSDF

BLOCKS_CFG = dataclasses.replace(
    SMALL_CFG,
    map_kind="blocks",
    track_stamps=True,
    tsdf=dataclasses.replace(SMALL_TSDF, table_capacity=4096),
)


def _run(cfg, n=6):
    poses = synthetic.orbit_trajectory(n)
    frames = [synthetic.render_frame(p, SMALL_INTR) for p in poses]
    state = slam.init_state(cfg, poses[0])
    for i in range(n):
        state, _ = slam.step_gt(cfg, state, frames[i].depth, frames[i].color,
                                poses[i])
    return state, poses, frames


def test_stamps_track_fusion_and_gaps():
    state, poses, frames = _run(BLOCKS_CFG)
    n_active = int(state.volume.n_active)
    assert n_active > 20
    last = np.asarray(state.stamp[:n_active, 0])
    gap = np.asarray(state.stamp[:n_active, 1])
    # Blocks in view of the last frame carry its (1-based) stamp.
    assert last.max() == int(state.frame_idx)
    # Continuous-ish observation: any recorded gaps are small (a block may
    # swing out of the frustum for a few frames during the orbit) — far
    # below any practical local_window.
    assert gap.max() <= 6

    # Simulate a long look-away then a revisit: age every stamp, then fuse
    # one more frame — re-fused blocks must record the observation gap.
    aged = state._replace(
        stamp=state.stamp.at[:, 0].set(
            jnp.where(state.stamp[:, 0] > 0, 1, 0)
        ),
        frame_idx=jnp.asarray(400, jnp.int32),
    )
    f = frames[0]
    aged, _ = slam.step_gt(BLOCKS_CFG, aged, f.depth, f.color, poses[0])
    gap2 = np.asarray(aged.stamp[:, 1])
    assert gap2.max() >= 390  # revisit evidence recorded
    assert int(ll.evidence_count(BLOCKS_CFG, aged)) > 10


def test_local_loop_corrects_injected_drift():
    cfg = dataclasses.replace(
        BLOCKS_CFG,
        posegraph=dataclasses.replace(
            BLOCKS_CFG.posegraph,
            local_window=50, local_min_pixels=1500,
        ),
    )
    state, poses, frames = _run(cfg)

    # Mark the whole map as revisited-after-a-long-gap (inactive model).
    state = state._replace(
        stamp=state.stamp.at[:, 1].set(
            jnp.where(state.stamp[:, 0] > 0, 200, 0)
        ),
        frame_idx=jnp.asarray(300, jnp.int32),
    )

    # Inject drift: the engine believes it is at a slightly wrong pose.
    xi = jnp.asarray([0.02, -0.015, 0.01, 0.008, -0.006, 0.01], jnp.float32)
    T_true = jnp.asarray(poses[5], jnp.float32)
    T_drift = jnp.matmul(se3_exp(xi), T_true)
    state = state._replace(T_wc=T_drift)

    # Current frame rendered from the TRUE pose; registering it against
    # the inactive model view must recover the true pose.
    from instancefusion_tpu.ops import preprocess

    f = frames[5]
    pyr = preprocess.build_frame_pyramid(
        f.depth, SMALL_INTR, cfg.preprocess, 1
    )
    res = ll.attempt(cfg, state, pyr[0]["vmap"], pyr[0]["nmap"],
                     pyr[0]["valid"])
    assert bool(res.ok)
    assert float(res.pred_pixels) >= 1500
    err_t = float(jnp.linalg.norm(res.T_corr_wc[:3, 3] - T_true[:3, 3]))
    drift_t = float(jnp.linalg.norm(T_drift[:3, 3] - T_true[:3, 3]))
    assert err_t < 0.25 * drift_t  # recovered most of the injected drift
    # Rotation error small too.
    dR = jnp.matmul(res.T_corr_wc[:3, :3].T, T_true[:3, :3])
    ang = float(jnp.arccos(jnp.clip((jnp.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 0.01

    # Consuming the evidence re-arms the detector.
    state = state._replace(stamp=ll.reset_gaps(state.stamp, 50))
    assert int(ll.evidence_count(cfg, state)) == 0


def test_clean_carries_stamps():
    from instancefusion_tpu.ops import blocks

    state, _, _ = _run(BLOCKS_CFG, n=3)
    n0 = int(state.volume.n_active)
    golden = {
        tuple(np.asarray(state.volume.block_coords[i])): np.asarray(
            state.stamp[i]
        )
        for i in range(n0)
    }
    vol2, _, stamp2 = blocks.clean(
        state.volume, BLOCKS_CFG.tsdf, min_weight=0.5, stamp=state.stamp
    )
    n2 = int(vol2.n_active)
    assert n2 > 0
    for i in range(n2):
        k = tuple(np.asarray(vol2.block_coords[i]))
        np.testing.assert_array_equal(golden[k], np.asarray(stamp2[i]))
