"""Instance subsystem tests: segmentation head, association, label voting.

Mirrors the reference's validation gap the other way around (SURVEY §5):
the fusion machinery is tested against the synthetic scene's *ground
truth* instance masks (so no network weights are needed), and the network
is tested structurally (shapes, jit, grouping correctness on constructed
predictions).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from instancefusion_tpu.config import InstanceConfig
from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.engine import instances as inst, slam
from instancefusion_tpu.models import segmentation as segm
from instancefusion_tpu.ops import labels as lbl
from tests.helpers import SMALL_CFG, SMALL_INTR, SMALL_TSDF

ICFG = InstanceConfig(max_instances=16, num_classes=8, min_mask_pixels=50)

INST_CFG = dataclasses.replace(
    SMALL_CFG,
    map_kind="blocks",
    use_instances=True,
    instances=ICFG,
    tsdf=dataclasses.replace(SMALL_TSDF, block_size=8, table_capacity=1728),
)


def gt_segmentation(frame, k=16) -> segm.Segmentation:
    """Ground-truth masks from the synthetic renderer as a Segmentation.

    Synthetic ids are 0..3 (walls, sphere, box, cylinder); class = id + 1
    so background(0) is reserved.
    """
    mask_id = frame.instance
    classes = jnp.arange(k, dtype=jnp.int32) + 1
    present = jnp.zeros((k,), bool).at[jnp.clip(mask_id, 0, k - 1)].set(
        True, mode="drop"
    ) & (jnp.arange(k) < 4)
    return segm.Segmentation(
        mask_id=jnp.where(mask_id >= 0, mask_id, -1),
        classes=jnp.where(present, classes, 0),
        scores=jnp.where(present, 1.0, 0.0),
        valid=present,
    )


def test_extract_instances_groups_by_center():
    h, w, k = 64, 64, 4
    # Two blobs with exact centers and offsets pointing at them.
    sem = jnp.zeros((h, w, 3))
    centers = [(16.0, 16.0), (48.0, 40.0)]
    yy, xx = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    in_a = (jnp.abs(yy - 16) < 8) & (jnp.abs(xx - 16) < 8)
    in_b = (jnp.abs(yy - 48) < 8) & (jnp.abs(xx - 40) < 8)
    fg = in_a | in_b
    sem = sem.at[..., 1].set(jnp.where(fg, 5.0, -5.0))
    sem = sem.at[..., 0].set(jnp.where(fg, -5.0, 5.0))
    heat = jnp.full((h, w), -10.0)
    for cy, cx in centers:
        heat = heat.at[int(cy), int(cx)].set(5.0)
    cy_t = jnp.where(in_a, 16.0, 48.0)
    cx_t = jnp.where(in_a, 16.0, 40.0)
    offset = jnp.stack([cy_t - yy, cx_t - xx], axis=-1)

    seg = segm.extract_instances(sem, heat, offset, k)
    mid = np.asarray(seg.mask_id)
    assert int(seg.valid.sum()) == 2
    ids_a = np.unique(mid[np.asarray(in_a)])
    ids_b = np.unique(mid[np.asarray(in_b)])
    assert len(ids_a) == 1 and len(ids_b) == 1 and ids_a[0] != ids_b[0]
    assert np.all(mid[~np.asarray(fg)] == -1)
    assert np.all(np.asarray(seg.classes)[[ids_a[0], ids_b[0]]] == 1)


def test_panoptic_head_forward_jits():
    params = segm.init_params(jax.random.PRNGKey(0), 48, 64, num_classes=8, width=8)
    rgb = jnp.ones((48, 64, 3)) * 0.5
    seg = jax.jit(
        lambda p, x: segm.segment(p, x, num_classes=8, max_instances=8, width=8)
    )(params, rgb)
    assert seg.mask_id.shape == (48, 64)
    assert seg.classes.shape == (8,)


def test_association_creates_then_matches():
    f = synthetic.render_frame(synthetic.orbit_trajectory(3)[1], SMALL_INTR)
    seg = gt_segmentation(f, ICFG.max_instances)
    table = inst.allocate(ICFG)
    # Frame 1: nothing predicted -> every big-enough mask creates a row.
    gid1, table = inst.associate(table, seg, jnp.full(f.instance.shape, -1), ICFG)
    created = int(table.active.sum())
    assert created >= 3  # walls, sphere, box (cylinder may be tiny/occluded)
    # Frame 2: predicted ids = frame-1 assignment -> all masks match, no growth.
    gid2, table2 = inst.associate(table, seg, gid1, ICFG)
    assert int(table2.active.sum()) == created
    assert int(table2.overflow) == 0
    same = np.asarray(gid1) == np.asarray(gid2)
    assert same[np.asarray(f.instance) >= 0].mean() > 0.95


def test_instance_colors_deterministic_distinct():
    gids = jnp.arange(12)
    c1 = inst.instance_color(gids)
    c2 = inst.instance_color(gids)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    assert len(np.unique(np.round(np.asarray(c1) * 255).astype(int), axis=0)) == 12
    assert np.all(np.asarray(inst.instance_color(jnp.array([-1]))) == 0.0)


def test_engine_instance_fusion_end_to_end():
    """Config-3 structure at test scale: GT masks fused into the block map;
    voxel labels converge to the GT objects and project back correctly."""
    n = 10
    poses = synthetic.orbit_trajectory(n)
    frames = [synthetic.render_frame(poses[i], SMALL_INTR) for i in range(n)]
    cfg = INST_CFG
    state = slam.init_state(cfg, frames[0].T_wc)
    for f in frames:
        seg = gt_segmentation(f, ICFG.max_instances)
        state, info = slam.step_seg(cfg, state, f.depth, f.color, seg)
    assert bool(info.track_ok)
    assert int(state.table.active.sum()) >= 3
    assert int(state.table.matches.sum()) > 0

    # Project fused labels back: accuracy vs GT instance image under the
    # majority gid<->gt-id mapping (association order is arbitrary).
    f = frames[-1]
    pred_gid = lbl.sample_nearest(
        state.votes, state.volume, state.pred.vertex_w, state.pred.valid, cfg.tsdf
    )
    pg = np.asarray(pred_gid)
    gt = np.asarray(f.instance)
    ok = (pg >= 0) & (gt >= 0) & np.asarray(state.pred.valid)
    assert ok.mean() > 0.3  # labeled coverage of the rendered view
    # majority mapping gid -> gt id
    acc_num = 0
    for g in np.unique(pg[ok]):
        sel = ok & (pg == g)
        vals, counts = np.unique(gt[sel], return_counts=True)
        acc_num += counts.max()
    assert acc_num / ok.sum() > 0.9


def test_segmentation_training_reduces_loss():
    """The head trains: a few optax steps on one synthetic frame with GT
    panoptic targets reduce the combined loss (SURVEY §3: the component
    must be trainable in-framework, not a frozen stub)."""
    import optax

    f = synthetic.render_frame(synthetic.orbit_trajectory(3)[1], SMALL_INTR)
    small = jax.image.resize(f.color, (60, 80, 3), "linear")
    inst = jax.image.resize(
        f.instance.astype(jnp.float32), (60, 80), "nearest"
    ).astype(jnp.int32)
    cls = jnp.arange(8, dtype=jnp.int32) + 1
    targets = segm.targets_from_instances(inst, cls[:8])

    params = segm.init_params(jax.random.PRNGKey(0), 60, 80, num_classes=9, width=8)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    step = jax.jit(
        lambda p, o, rgb, t: segm.train_step(p, o, rgb, t, tx, 9, 8),
    )
    losses = []
    for _ in range(12):
        params, opt_state, loss, aux = step(params, opt_state, small, targets)
        losses.append(float(loss))
    assert losses[-1] < 0.75 * losses[0], losses


def test_retire_stale_frees_rows():
    table = inst.allocate(ICFG)
    f = synthetic.render_frame(synthetic.orbit_trajectory(3)[1], SMALL_INTR)
    seg = gt_segmentation(f, ICFG.max_instances)
    gid, table = inst.associate(table, seg, jnp.full(f.instance.shape, -1), ICFG)
    n0 = int(table.active.sum())
    # Age everyone past probation with zero matches -> all retired.
    table = table._replace(age=jnp.full_like(table.age, 100))
    table2 = inst.retire_stale(table, ICFG, min_matches=1, probation_age=30)
    assert int(table2.active.sum()) == 0
    # Matched instances survive.
    table3 = table._replace(matches=jnp.full_like(table.matches, 5))
    table3 = inst.retire_stale(table3, ICFG, min_matches=1, probation_age=30)
    assert int(table3.active.sum()) == n0
