"""Native C++ dataloader vs generated TUM/klg fixtures."""

import struct
import zlib

import numpy as np
import pytest

from instancefusion_tpu.datasets import native_loader

pytestmark = pytest.mark.skipif(
    not native_loader.available(), reason="native dataloader not built"
)

W, H = 64, 48


def _make_tum(tmp_path):
    from PIL import Image

    (tmp_path / "depth").mkdir()
    (tmp_path / "rgb").mkdir()
    depth_lines, rgb_lines = [], []
    rng = np.random.default_rng(0)
    truths = []
    for i in range(5):
        ts = 100.0 + i * 0.033
        d = rng.integers(0, 20000, (H, W)).astype(np.uint16)
        c = rng.integers(0, 255, (H, W, 3)).astype(np.uint8)
        Image.fromarray(d, mode="I;16").save(tmp_path / "depth" / f"{ts:.6f}.png")
        Image.fromarray(c).save(tmp_path / "rgb" / f"{ts:.6f}.png")
        depth_lines.append(f"{ts:.6f} depth/{ts:.6f}.png")
        rgb_lines.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        truths.append((d, c, ts))
    (tmp_path / "depth.txt").write_text("# ts file\n" + "\n".join(depth_lines))
    (tmp_path / "rgb.txt").write_text("# ts file\n" + "\n".join(rgb_lines))
    return truths


def test_tum_native_roundtrip(tmp_path):
    truths = _make_tum(tmp_path)
    seq = native_loader.NativeSequence(str(tmp_path), W, H)
    assert len(seq) == 5
    frames = list(seq)
    assert len(frames) == 5
    for (depth, rgb, ts), (d_ref, c_ref, ts_ref) in zip(frames, truths):
        np.testing.assert_allclose(depth, d_ref.astype(np.float32) / 5000.0,
                                   atol=1e-6)
        np.testing.assert_array_equal(rgb, c_ref)
        assert abs(ts - ts_ref) < 1e-6


def test_klg_native_roundtrip(tmp_path):
    import io

    from PIL import Image

    rng = np.random.default_rng(1)
    path = tmp_path / "log.klg"
    n = 3
    truths = []
    with open(path, "wb") as f:
        f.write(struct.pack("<i", n))
        for i in range(n):
            d = rng.integers(0, 5000, (H, W)).astype(np.uint16)
            c = (np.full((H, W, 3), 40 * i + 20)).astype(np.uint8)
            dz = zlib.compress(d.tobytes())
            buf = io.BytesIO()
            Image.fromarray(c).save(buf, format="JPEG", quality=95)
            jp = buf.getvalue()
            f.write(struct.pack("<qii", 1_000_000 * i, len(dz), len(jp)))
            f.write(dz)
            f.write(jp)
            truths.append((d, c, i * 1.0))
    seq = native_loader.NativeSequence(str(path), W, H)
    assert len(seq) == n
    frames = list(seq)
    assert len(frames) == n
    for (depth, rgb, ts), (d_ref, c_ref, ts_ref) in zip(frames, truths):
        np.testing.assert_allclose(depth, d_ref.astype(np.float32) / 1000.0,
                                   atol=1e-6)
        # JPEG is lossy; flat images should survive within a few counts.
        assert np.abs(rgb.astype(int) - c_ref.astype(int)).mean() < 3
        assert abs(ts - ts_ref) < 1e-6
