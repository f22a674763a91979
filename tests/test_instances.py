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
    # Offsets are resolution-normalized (units of image width).
    offset = jnp.stack([cy_t - yy, cx_t - xx], axis=-1) / w

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


def test_trained_head_end_to_end_voxel_labels():
    """Config-3 with the REAL network (r3 VERDICT item 5): the packaged
    trained head segments rendered frames — no GT masks anywhere — and
    the full chain head -> masks -> association -> table -> Boyer-Moore
    votes must label the map's band voxels with >= 80% class accuracy
    against the analytic scene."""
    import dataclasses

    from instancefusion_tpu.config import InstanceConfig
    from instancefusion_tpu.engine import pipeline
    from instancefusion_tpu.models import segmentation as segm
    from tests.helpers import SMALL_CFG, SMALL_INTR, SMALL_TSDF

    params, num_classes, width = segm.load_pretrained()
    cfg = dataclasses.replace(
        SMALL_CFG,
        map_kind="blocks",
        use_instances=True,
        tsdf=dataclasses.replace(SMALL_TSDF, table_capacity=4096),
        instances=InstanceConfig(max_instances=16, min_mask_pixels=30,
                                 seg_every=2, num_classes=num_classes),
    )
    n = 10
    poses = synthetic.orbit_trajectory(n)
    frames = [synthetic.render_frame(poses[i], SMALL_INTR) for i in range(n)]

    seg_jit = jax.jit(lambda rgb: segm.segment(
        params, rgb, num_classes, cfg.instances.max_instances, width
    ))
    res = pipeline.run(
        cfg, frames, T_init_wc=poses[0],
        segment_fn=lambda fr: seg_jit(fr.color), enable_loops=False,
    )
    state = res.state
    assert int(jnp.sum(state.table.active)) >= 2  # objects were created

    # Per-voxel GT class at the voxel centers of allocated blocks.
    tsdf_cfg = cfg.tsdf
    bm = state.volume
    n_act = int(bm.n_active)
    coords = np.asarray(bm.block_coords[:n_act])  # (N,3)
    b = tsdf_cfg.block_size
    local = np.stack(np.meshgrid(
        np.arange(b), np.arange(b), np.arange(b), indexing="ij"
    ), -1).reshape(-1, 3)
    vox = coords[:, None, :] * b + local[None, :, :]
    centers = np.asarray(tsdf_cfg.origin) + (vox + 0.5) * tsdf_cfg.voxel_size
    sdf_gt, obj_gt = synthetic.scene_sdf(jnp.asarray(centers.reshape(-1, 3)))
    obj_gt = np.asarray(obj_gt).reshape(n_act, -1)
    near = np.abs(np.asarray(sdf_gt).reshape(n_act, -1)) < tsdf_cfg.trunc

    votes_lab = np.asarray(state.votes.label[:n_act])
    votes_cnt = np.asarray(state.votes.count[:n_act])
    cls_of_gid = np.asarray(state.table.cls)
    voted = votes_cnt > 0
    # Voxels that are near a THING surface and received votes.
    m = voted & near & (obj_gt > 0)
    assert m.sum() > 1000, m.sum()
    pred_cls = cls_of_gid[np.clip(votes_lab, 0, cls_of_gid.shape[0] - 1)]
    acc = (pred_cls[m] == obj_gt[m]).mean()
    assert acc >= 0.8, acc
    # Coverage among voxels the sensor actually OBSERVED near a thing
    # surface (fused weight > 0 and inside the band — the orbit never
    # sees the objects' backsides, and occluded band voxels cannot vote).
    w_fused = np.asarray(state.volume.weight[:n_act])
    sdf_fused = np.asarray(state.volume.sdf[:n_act])
    observed = (w_fused > 0) & (np.abs(sdf_fused) < 0.95) & (obj_gt > 0) & near
    coverage = voted[observed].mean()
    assert coverage > 0.5, coverage


def test_instance_merge_on_double_overlap():
    """Two table rows that are one object (first seen from two sides)
    merge when a single mask overlaps both predicted regions; the voxel
    votes relabel to the survivor (SURVEY §4.5 create/MERGE/confirm)."""
    from instancefusion_tpu.config import InstanceConfig
    from instancefusion_tpu.engine import instances as inst
    from instancefusion_tpu.models.segmentation import Segmentation
    from instancefusion_tpu.ops import labels as lab

    cfg = InstanceConfig(max_instances=8, min_mask_pixels=10,
                         iou_match_thresh=0.3, merge_iou_thresh=0.2)
    table = inst.allocate(cfg)
    # Rows 2 and 5: same class, both active (the duplicated object).
    table = table._replace(
        active=table.active.at[2].set(True).at[5].set(True),
        cls=table.cls.at[2].set(7).at[5].set(7),
        score=table.score.at[2].set(3.0).at[5].set(1.5),
        matches=table.matches.at[2].set(4).at[5].set(2),
    )
    h, w = 32, 64
    pred_gid = jnp.full((h, w), -1, jnp.int32)
    pred_gid = pred_gid.at[:, 8:28].set(2).at[:, 36:56].set(5)
    # One mask spanning BOTH regions.
    mask = jnp.where(
        (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) >= 8)
        & (jax.lax.broadcasted_iota(jnp.int32, (h, w), 1) < 56),
        0, -1,
    )
    k = cfg.max_instances
    seg = Segmentation(
        mask_id=mask,
        classes=jnp.zeros((k,), jnp.int32).at[0].set(7),
        scores=jnp.zeros((k,)).at[0].set(1.0),
        valid=jnp.zeros((k,), bool).at[0].set(True),
    )
    src, dst, ok = inst.find_merges(table, seg, pred_gid, cfg)
    assert bool(ok[0])
    assert {int(src[0]), int(dst[0])} == {2, 5}

    table2 = inst.apply_merges(table, src, dst, ok)
    survivor, gone = int(dst[0]), int(src[0])
    assert bool(table2.active[survivor]) and not bool(table2.active[gone])
    assert float(table2.score[survivor]) == 4.5  # folded
    assert int(table2.matches[survivor]) == 6
    assert float(table2.score[gone]) == 0.0

    votes = lab.LabelVotes(
        label=jnp.full((4, 8), -1, jnp.int32).at[0].set(gone).at[1].set(survivor),
        count=jnp.ones((4, 8), jnp.float32),
    )
    votes2 = lab.relabel_votes(votes, src, dst, ok)
    assert int((votes2.label == gone).sum()) == 0
    assert int((votes2.label == survivor).sum()) == 16  # counts preserved


def test_mask_refine_normal_edges_stop_crease_bleed():
    """SURVEY §4.5 mask refinement vs depth AND normal edges: at a
    concave crease (wall meeting floor) there is NO depth jump, so the
    depth-only refine lets a bled mask vote across the seam; the normal
    term drops the crease band and stops it."""
    import jax.numpy as jnp
    import numpy as np

    from instancefusion_tpu.ops import labels
    from tests.helpers import SMALL_INTR

    intr = SMALL_INTR
    h, w = intr.height, intr.width
    vc = h - 20  # crease row, well below the optical center so the floor
    # is viewed steeply enough that its per-row depth step stays under
    # the depth-edge threshold (near the horizon a floor is edge-on and
    # depth itself jumps, which would mask the effect under test).
    v = np.arange(h, dtype=np.float32)
    yt = (v - intr.cy) / intr.fy  # unit-z ray y-slope per row

    # Wall: frontoparallel plane z=1 above the crease.  Floor: plane
    # y = const through the wall base — depth z = y_w / yt below the
    # crease, continuous at vc by construction.
    z_wall = 1.0
    y_w = z_wall * yt[vc]
    depth_rows = np.where(
        v < vc, z_wall, y_w / np.maximum(yt, y_w / 8.0)
    ).astype(np.float32)
    depth = jnp.asarray(np.broadcast_to(depth_rows[:, None], (h, w)).copy())

    # Depth truly continuous at the seam (no silhouette edge to catch).
    assert abs(float(depth[vc, 0] - depth[vc - 1, 0])) < 0.02

    # The network mask covers the wall and bleeds 2 rows onto the floor.
    mask = np.full((h, w), -1, np.int32)
    mask[: vc + 2, :] = 3
    mask = jnp.asarray(mask)

    # Depth-only refine: the bleed survives (no depth discontinuity).
    out_depth_only = np.asarray(labels.refine_mask_edges(mask, depth))
    assert (out_depth_only[vc : vc + 2, 4:-4] == 3).any()

    # With the normal term the crease band (and with it the bleed rows)
    # is dropped...
    out = np.asarray(
        labels.refine_mask_edges(mask, depth, intr=intr, normal_dot=0.6)
    )
    assert (out[vc : vc + 2, 4:-4] == -1).all(), "bleed crossed the seam"
    # ...while the wall interior keeps its label and the floor stays
    # unlabeled.
    assert (out[: vc - 4, 4:-4] == 3).mean() > 0.95
    assert (out[vc + 4 :, 4:-4] == -1).all()


def test_trained_head_generalizes_to_held_out_scene():
    """SURVEY §8 Phase 3 exit (r4 VERDICT ask #9): the packaged head was
    trained on randomized scenes with seeds 1..6 (and the legacy fixed
    scene); this runs the full no-GT-masks chain on a scene seed it has
    NEVER seen (HELD_OUT=1234, excluded in _train_seghead.py) and gates
    voxel label accuracy >= 80% against the analytic scene, class = kind."""
    import dataclasses

    from instancefusion_tpu.config import InstanceConfig
    from instancefusion_tpu.engine import pipeline
    from instancefusion_tpu.models import segmentation as segm
    from tests.helpers import SMALL_CFG, SMALL_INTR, SMALL_TSDF

    params, num_classes, width = segm.load_pretrained()
    cfg = dataclasses.replace(
        SMALL_CFG,
        map_kind="blocks",
        use_instances=True,
        tsdf=dataclasses.replace(SMALL_TSDF, table_capacity=4096),
        instances=InstanceConfig(max_instances=16, min_mask_pixels=30,
                                 seg_every=2, num_classes=num_classes),
    )
    scene = synthetic.random_scene(1234)
    kinds = np.asarray(scene.kinds)
    n = 10
    poses = synthetic.orbit_trajectory(n)
    frames = [
        synthetic.render_frame_scene(poses[i], SMALL_INTR, scene)
        for i in range(n)
    ]

    seg_jit = jax.jit(lambda rgb: segm.segment(
        params, rgb, num_classes, cfg.instances.max_instances, width
    ))
    res = pipeline.run(
        cfg, frames, T_init_wc=poses[0],
        segment_fn=lambda fr: seg_jit(fr.color), enable_loops=False,
    )
    state = res.state
    assert int(jnp.sum(state.table.active)) >= 2  # objects were created

    tsdf_cfg = cfg.tsdf
    bm = state.volume
    n_act = int(bm.n_active)
    coords = np.asarray(bm.block_coords[:n_act])
    b = tsdf_cfg.block_size
    local = np.stack(np.meshgrid(
        np.arange(b), np.arange(b), np.arange(b), indexing="ij"
    ), -1).reshape(-1, 3)
    vox = coords[:, None, :] * b + local[None, :, :]
    centers = np.asarray(tsdf_cfg.origin) + (vox + 0.5) * tsdf_cfg.voxel_size
    sdf_gt, obj_gt = synthetic.scene_sdf_with(
        jnp.asarray(centers.reshape(-1, 3)), scene
    )
    obj_gt = np.asarray(obj_gt).reshape(n_act, -1)
    near = np.abs(np.asarray(sdf_gt).reshape(n_act, -1)) < tsdf_cfg.trunc
    # GT class of a thing voxel = the KIND of its object slot.
    gt_cls = np.where(obj_gt > 0, kinds[np.maximum(obj_gt - 1, 0)], 0)

    votes_lab = np.asarray(state.votes.label[:n_act])
    votes_cnt = np.asarray(state.votes.count[:n_act])
    cls_of_gid = np.asarray(state.table.cls)
    voted = votes_cnt > 0
    m = voted & near & (obj_gt > 0)
    assert m.sum() > 500, m.sum()
    pred_cls = cls_of_gid[np.clip(votes_lab, 0, cls_of_gid.shape[0] - 1)]
    acc = (pred_cls[m] == gt_cls[m]).mean()
    assert acc >= 0.8, acc
