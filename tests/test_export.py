"""Mesh extraction, PLY export, offline rendering, relocalization."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from instancefusion_tpu.datasets import synthetic
from instancefusion_tpu.engine import pipeline
from instancefusion_tpu.ops import blocks, tsdf
from instancefusion_tpu.utils import meshing, render
from tests.helpers import SMALL_CFG, SMALL_INTR, SMALL_TSDF

RC = SMALL_CFG.raycast


def _fused_dense(n=3):
    poses = synthetic.orbit_trajectory(n)
    vol = tsdf.allocate(SMALL_TSDF)
    for i in range(n):
        f = synthetic.render_frame(poses[i], SMALL_INTR)
        vol = tsdf.integrate(vol, f.depth, f.color, f.T_wc, SMALL_INTR, SMALL_TSDF)
    return vol, poses


def test_mesh_extraction_lands_on_surface(tmp_path):
    vol, poses = _fused_dense()
    verts, tris = meshing.extract_mesh(vol, SMALL_TSDF)
    assert len(verts) > 2000
    assert len(tris) > 2000
    assert np.all(tris < len(verts))
    # Mesh vertices sit on the zero level set: analytic scene SDF ~ 0.
    s, _ = synthetic.scene_sdf(jnp.asarray(verts))
    med = float(np.median(np.abs(np.asarray(s))))
    assert med < 0.6 * SMALL_TSDF.voxel_size, med
    # PLY round-trip writes a parseable header.
    p = tmp_path / "mesh.ply"
    meshing.save_ply(str(p), verts, tris)
    head = p.read_text().splitlines()[:12]
    assert head[0] == "ply" and f"element vertex {len(verts)}" in head


def test_mesh_from_block_map_matches_dense():
    n = 2
    poses = synthetic.orbit_trajectory(max(n, 2))
    cfg = dataclasses.replace(SMALL_TSDF, block_size=8, table_capacity=1728)
    vol = tsdf.allocate(cfg)
    bm = blocks.allocate(cfg)
    for i in range(n):
        f = synthetic.render_frame(poses[i], SMALL_INTR)
        vol = tsdf.integrate(vol, f.depth, f.color, f.T_wc, SMALL_INTR, cfg)
        bm = blocks.integrate(bm, f.depth, f.color, f.T_wc, SMALL_INTR, cfg)
    vd, td = meshing.extract_mesh(vol, cfg)
    vb, tb = meshing.extract_mesh(bm, cfg)
    # Same surface: vertex counts within a few percent, same bounding box.
    assert abs(len(vb) - len(vd)) / len(vd) < 0.05
    np.testing.assert_allclose(vb.mean(0), vd.mean(0), atol=0.05)


def test_per_instance_mesh_extraction():
    """Reference parity: each live instance exports as its own model.

    Fuse the synthetic scene (3 objects, GT ids 1..3) into a block map,
    vote labels, then split the mesh per instance: every exported part
    must be non-trivial and spatially coherent (inside the scene's own
    object bound)."""
    from instancefusion_tpu.ops import labels

    n = 3
    poses = synthetic.orbit_trajectory(n)
    cfg = dataclasses.replace(SMALL_TSDF, block_size=8, table_capacity=1728)
    bm = blocks.allocate(cfg)
    votes = labels.allocate(cfg)
    for i in range(n):
        f = synthetic.render_frame(poses[i], SMALL_INTR)
        bm = blocks.integrate(bm, f.depth, f.color, f.T_wc, SMALL_INTR, cfg)
        votes = labels.fuse(votes, bm, f.instance, f.depth, f.T_wc, SMALL_INTR, cfg)

    parts = meshing.extract_instance_meshes(bm, votes, cfg)
    assert set(parts) & {1, 2, 3}, parts.keys()
    total = sum(len(v) for v, _ in parts.values())
    assert total > 200
    for gid, (v, t) in parts.items():
        assert len(v) >= 8 and len(t) > 0
        assert np.all(t >= 0) and np.all(t < len(v))
        # Objects (ids 1..3) are object-sized; id 0 is the room walls.
        if gid > 0:
            ext = v.max(0) - v.min(0)
            assert np.all(ext < 2.0), (gid, ext)
    # Colored global mesh export works off the same map.
    verts, tris, cols = meshing.extract_mesh(bm, cfg, with_color=True)
    assert cols.shape == (len(verts), 3)
    assert cols.max() > 0.1


def test_offline_render(tmp_path):
    vol, poses = _fused_dense()
    imgs = render.render_view(vol, poses[0], SMALL_INTR, SMALL_TSDF, RC)
    assert imgs["shaded"].shape == (120, 160, 3)
    assert imgs["shaded"].max() > 50  # something visible
    paths = render.render_sequence(
        vol, [poses[0], poses[1]], SMALL_INTR, SMALL_TSDF, RC, str(tmp_path)
    )
    assert len(paths) == 2
    from PIL import Image

    assert Image.open(paths[0]).size == (160, 120)


def test_pipeline_relocalizes_after_blackout():
    """Failure detection + recovery (SURVEY §6): blind the camera for a few
    frames (tracking lost), then return to a known view — the pipeline must
    relocalize via ferns + ICP instead of fusing garbage."""
    from instancefusion_tpu.config import PoseGraphConfig

    cfg = dataclasses.replace(
        SMALL_CFG,
        posegraph=PoseGraphConfig(
            keyframe_every=2, max_keyframes=16, max_edges=64, fern_count=256,
            loop_dist_thresh=0.3, ba_iters=4,
        ),
    )
    n = 16
    # Wide total sweep with gentle per-frame motion: tracking stays
    # accurate, but the held (frame-9) pose is ~1 rad away from frame 0's
    # view, so after the blackout plain ICP cannot re-acquire it — only
    # relocalization can.
    poses = synthetic.orbit_trajectory(n, sweep=2.5)
    frames = [synthetic.render_frame(poses[i], SMALL_INTR) for i in range(n)]

    class F:
        def __init__(self, depth, color):
            self.depth = depth
            self.color = color

    blank = F(jnp.zeros_like(frames[0].depth), jnp.zeros_like(frames[0].color))
    # Sequence: 10 good frames (keyframes 0, 2, ..., 8), 3 blackout, then
    # revisit frame 0's view.
    seq = frames[:10] + [blank] * 3 + [frames[0]] * 2
    metrics = []

    class Writer:
        def write(self, rec):
            metrics.append(rec)

        def close(self):
            pass

    res = pipeline.run(
        cfg, seq, T_init_wc=poses[0], metrics=Writer(), relocalize_after=3
    )
    assert any(m["relocalized"] for m in metrics), metrics
    # Pose after recovery is back at (near) frame 0's ground truth.
    err = np.linalg.norm(res.poses[-1][:3, 3] - np.asarray(poses[0])[:3, 3])
    assert err < 0.05, err
