"""TUM RGB-D dataset reader.

Replaces the reference's log readers (`RawLogReader` for `.klg`,
`LiveLogReader`/OpenNI2, `GroundTruthOdometry` — expected `GUI/src/Tools/`,
SURVEY.md §3 "Input readers") with a reader for the standard *extracted*
TUM RGB-D format:

    sequence_dir/
      rgb.txt        # "timestamp filename"
      depth.txt      # "timestamp filename" (16-bit PNG, depth = px / 5000)
      groundtruth.txt  # "timestamp tx ty tz qx qy qz qw" (optional)
      rgb/*.png  depth/*.png

Association follows the TUM `associate.py` protocol: nearest timestamps
within a window.  Decoding runs on the host (PIL) with an optional
C++-accelerated decode + prefetch path (see `instancefusion_tpu/native`).
No dataset ships in this environment — everything here is exercised by
`tests/test_tum.py` against a tiny generated fixture.
"""

from __future__ import annotations

import os
from typing import Iterator, NamedTuple

import numpy as np

DEPTH_SCALE = 5000.0  # TUM: 16-bit PNG value / 5000 = meters


class TumFrame(NamedTuple):
    depth: np.ndarray  # f32[H,W] meters
    color: np.ndarray  # f32[H,W,3] in [0,1]
    timestamp: float
    T_wc: np.ndarray | None  # f32[4,4] ground truth if available


def _read_list(path: str) -> list[tuple[float, list[str]]]:
    out = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            out.append((float(parts[0]), parts[1:]))
    return out


def associate(
    a: list[tuple[float, list[str]]],
    b: list[tuple[float, list[str]]],
    max_dt: float = 0.02,
) -> list[tuple[int, int]]:
    """TUM associate.py: greedy nearest-timestamp matching within max_dt."""
    pairs = sorted(
        (abs(ta - tb), i, j)
        for i, (ta, _) in enumerate(a)
        for j, (tb, _) in enumerate(b)
        if abs(ta - tb) < max_dt
    )
    used_a, used_b, out = set(), set(), []
    for _, i, j in pairs:
        if i not in used_a and j not in used_b:
            used_a.add(i)
            used_b.add(j)
            out.append((i, j))
    out.sort()
    return out


def quat_to_mat(qx: float, qy: float, qz: float, qw: float) -> np.ndarray:
    n = np.sqrt(qx * qx + qy * qy + qz * qz + qw * qw)
    qx, qy, qz, qw = qx / n, qy / n, qz / n, qw / n
    return np.array(
        [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qz * qw), 2 * (qx * qz + qy * qw)],
            [2 * (qx * qy + qz * qw), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qx * qw)],
            [2 * (qx * qz - qy * qw), 2 * (qy * qz + qx * qw), 1 - 2 * (qx * qx + qy * qy)],
        ],
        dtype=np.float32,
    )


class TumSequence:
    def __init__(self, root: str, intrinsics=None, max_dt: float = 0.02):
        self.root = root
        self.intrinsics = intrinsics
        depth_list = _read_list(os.path.join(root, "depth.txt"))
        rgb_list = _read_list(os.path.join(root, "rgb.txt"))
        pairs = associate(depth_list, rgb_list, max_dt)
        self.items = [
            (depth_list[i][0], depth_list[i][1][0], rgb_list[j][1][0])
            for i, j in pairs
        ]
        gt_path = os.path.join(root, "groundtruth.txt")
        self._gt = None
        if os.path.exists(gt_path):
            gt_raw = _read_list(gt_path)
            gt_ts = [(t, v) for t, v in gt_raw]
            # Associate gt to depth timestamps.
            gpairs = associate(
                [(t, [d, r]) for t, d, r in self.items],
                gt_ts,
                max_dt=0.05,
            )
            gt_map = {}
            for i, j in gpairs:
                t, vals = gt_ts[j]
                tx, ty, tz, qx, qy, qz, qw = map(float, vals[:7])
                T = np.eye(4, dtype=np.float32)
                T[:3, :3] = quat_to_mat(qx, qy, qz, qw)
                T[:3, 3] = (tx, ty, tz)
                gt_map[i] = T
            self._gt = gt_map

    def __len__(self) -> int:
        return len(self.items)

    def _load(self, idx: int) -> TumFrame:
        from PIL import Image

        ts, dpath, rpath = self.items[idx]
        d = np.asarray(
            Image.open(os.path.join(self.root, dpath)), dtype=np.float32
        )
        depth = d / DEPTH_SCALE
        rgb = (
            np.asarray(
                Image.open(os.path.join(self.root, rpath)).convert("RGB"),
                dtype=np.float32,
            )
            / 255.0
        )
        T = self._gt.get(idx) if self._gt else None
        return TumFrame(depth=depth, color=rgb, timestamp=ts, T_wc=T)

    def frames(
        self, limit: int | None = None, prefer_native: bool = True
    ) -> Iterator[TumFrame]:
        """Iterate frames; uses the C++ prefetching decoder when built.

        The native path (native/dataloader.cpp via ctypes) overlaps
        PNG decode with device compute; PIL decode is the fallback.
        """
        n = len(self.items) if limit is None else min(limit, len(self.items))
        if prefer_native and n:
            try:
                from instancefusion_tpu.datasets import native_loader

                if native_loader.available():
                    first = self._load(0)
                    h, w = first.depth.shape
                    seq = native_loader.NativeSequence(self.root, w, h)
                    for i, (depth, rgb, ts) in enumerate(seq):
                        if i >= n:
                            break
                        yield TumFrame(
                            depth=depth,
                            color=rgb.astype(np.float32) / 255.0,
                            timestamp=ts,
                            T_wc=self._gt.get(i) if self._gt else None,
                        )
                    seq.close()
                    return
            except Exception:
                pass  # fall back to PIL below
        for i in range(n):
            yield self._load(i)

    def gt_poses(self, limit: int | None = None) -> np.ndarray | None:
        if not self._gt:
            return None
        n = len(self.items) if limit is None else min(limit, len(self.items))
        if any(i not in self._gt for i in range(n)):
            return None
        return np.stack([self._gt[i] for i in range(n)])


def save_trajectory_tum(path: str, timestamps, poses) -> None:
    """Write poses in TUM `timestamp tx ty tz qx qy qz qw` format for the
    standard evaluation tooling."""
    with open(path, "w") as f:
        for ts, T in zip(timestamps, poses):
            R = np.asarray(T)[:3, :3]
            t = np.asarray(T)[:3, 3]
            # Rotation matrix -> quaternion (w last), Shepperd's method.
            tr = np.trace(R)
            if tr > 0:
                s = np.sqrt(tr + 1.0) * 2
                qw = 0.25 * s
                qx = (R[2, 1] - R[1, 2]) / s
                qy = (R[0, 2] - R[2, 0]) / s
                qz = (R[1, 0] - R[0, 1]) / s
            else:
                i = int(np.argmax(np.diag(R)))
                j, k = (i + 1) % 3, (i + 2) % 3
                s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
                q = [0.0, 0.0, 0.0, 0.0]
                q[i] = 0.25 * s
                q[3] = (R[k, j] - R[j, k]) / s
                q[j] = (R[j, i] + R[i, j]) / s
                q[k] = (R[k, i] + R[i, k]) / s
                qx, qy, qz, qw = q[0], q[1], q[2], q[3]
            f.write(
                f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}\n"
            )
