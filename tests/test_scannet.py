"""ScanNet reader vs a generated fixture scene."""

import numpy as np
import pytest


def _make_scene(tmp_path, n=4, w=64, h=48):
    from PIL import Image

    for sub in ("color", "depth", "pose", "intrinsic", "instance"):
        (tmp_path / sub).mkdir()
    rng = np.random.default_rng(0)
    K = np.array([[60.0, 0, 31.5, 0], [0, 60.0, 23.5, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]])
    np.savetxt(tmp_path / "intrinsic" / "intrinsic_depth.txt", K)
    truths = []
    for i in range(n):
        d = rng.integers(500, 4000, (h, w)).astype(np.uint16)
        # Smooth gradient survives JPEG; random noise does not.
        yy, xx = np.mgrid[0:h, 0:w]
        c = np.stack(
            [(yy * 255 // h), (xx * 255 // w), np.full((h, w), 30 * i)], -1
        ).astype(np.uint8)
        inst = rng.integers(0, 5, (h, w)).astype(np.uint16)
        T = np.eye(4)
        T[:3, 3] = [0.1 * i, 0, 0]
        Image.fromarray(d, mode="I;16").save(tmp_path / "depth" / f"{i}.png")
        Image.fromarray(c).save(tmp_path / "color" / f"{i}.jpg", quality=98)
        Image.fromarray(inst, mode="I;16").save(tmp_path / "instance" / f"{i}.png")
        np.savetxt(tmp_path / "pose" / f"{i}.txt", T)
        truths.append((d, c, inst, T))
    # One invalid pose (ScanNet marks capture-tracking failures with -inf).
    np.savetxt(tmp_path / "pose" / f"{n-1}.txt", np.full((4, 4), -np.inf))
    return truths


def test_scannet_reader_roundtrip(tmp_path):
    from instancefusion_tpu.datasets import scannet

    truths = _make_scene(tmp_path)
    seq = scannet.ScanNetSequence(str(tmp_path))
    assert len(seq) == 4
    assert seq.intrinsics.fx == pytest.approx(60.0)
    assert seq.intrinsics.width == 64
    frames = list(seq.frames())
    for i, (f, (d, c, inst, T)) in enumerate(zip(frames, truths)):
        np.testing.assert_allclose(f.depth, d.astype(np.float32) / 1000.0,
                                   atol=1e-6)
        assert np.abs(f.color * 255 - c).mean() < 4  # jpeg-lossy
        np.testing.assert_array_equal(f.instance, inst.astype(np.int32))
        if i < 3:
            np.testing.assert_allclose(f.T_wc, T, atol=1e-6)
    # The corrupted-pose frame surfaces None, and gt_poses refuses.
    assert frames[-1].T_wc is None
    assert seq.gt_poses() is None
    assert seq.gt_poses(limit=3) is not None
