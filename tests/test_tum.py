"""TUM reader tests against a tiny generated fixture (no dataset on box)."""

import os

import numpy as np
import pytest

from instancefusion_tpu.datasets import tum


@pytest.fixture()
def tum_fixture(tmp_path):
    from PIL import Image

    root = tmp_path / "seq"
    (root / "rgb").mkdir(parents=True)
    (root / "depth").mkdir()
    rng = np.random.default_rng(0)
    with open(root / "rgb.txt", "w") as fr, open(root / "depth.txt", "w") as fd, open(
        root / "groundtruth.txt", "w"
    ) as fg:
        fr.write("# comment\n")
        for i in range(4):
            t = 100.0 + i * 0.033
            rgb = (rng.uniform(0, 255, (24, 32, 3))).astype(np.uint8)
            depth16 = (rng.uniform(0.5, 3.0, (24, 32)) * 5000).astype(np.uint16)
            Image.fromarray(rgb).save(root / "rgb" / f"{i}.png")
            Image.fromarray(depth16).save(root / "depth" / f"{i}.png")
            fr.write(f"{t + 0.004:.6f} rgb/{i}.png\n")  # rgb slightly offset
            fd.write(f"{t:.6f} depth/{i}.png\n")
            fg.write(f"{t + 0.002:.6f} {0.1 * i:.3f} 0.0 0.0 0.0 0.0 0.0 1.0\n")
    return str(root)


def test_association_and_load(tum_fixture):
    seq = tum.TumSequence(tum_fixture)
    assert len(seq) == 4
    frames = list(seq.frames())
    assert frames[0].depth.shape == (24, 32)
    assert frames[0].color.shape == (24, 32, 3)
    assert 0.5 <= frames[0].depth.mean() <= 3.0
    assert 0.0 <= frames[0].color.max() <= 1.0


def test_gt_poses(tum_fixture):
    seq = tum.TumSequence(tum_fixture)
    gt = seq.gt_poses()
    assert gt is not None and gt.shape == (4, 4, 4)
    np.testing.assert_allclose(gt[:, 0, 3], [0.0, 0.1, 0.2, 0.3], atol=1e-6)
    np.testing.assert_allclose(gt[0, :3, :3], np.eye(3), atol=1e-6)


def test_associate_rejects_far_timestamps():
    a = [(0.0, ["x"]), (1.0, ["y"])]
    b = [(0.5, ["z"])]
    assert tum.associate(a, b, max_dt=0.02) == []
    assert tum.associate(a, b, max_dt=0.6) == [(0, 0)]


def test_save_trajectory_roundtrip(tmp_path, tum_fixture):
    seq = tum.TumSequence(tum_fixture)
    gt = seq.gt_poses()
    path = str(tmp_path / "traj.txt")
    tum.save_trajectory_tum(path, [i for i in range(len(gt))], gt)
    rows = [l.split() for l in open(path) if l.strip()]
    assert len(rows) == 4
    t = np.array([[float(x) for x in r[1:4]] for r in rows])
    np.testing.assert_allclose(t[:, 0], [0.0, 0.1, 0.2, 0.3], atol=1e-5)
    q = np.array([[float(x) for x in r[4:8]] for r in rows])
    np.testing.assert_allclose(q, np.tile([0, 0, 0, 1.0], (4, 1)), atol=1e-5)
