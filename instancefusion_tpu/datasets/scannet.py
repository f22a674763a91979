"""ScanNet (extracted) sequence reader.

Configs 3 and 5 of the build contract run on ScanNet scenes (SURVEY.md
§0.1).  This reads the standard *extracted* ScanNet scene layout (the
output of the official SensReader):

    scene_dir/
      color/<i>.jpg          # 8-bit RGB
      depth/<i>.png          # 16-bit depth, millimeters
      pose/<i>.txt           # 4x4 camera-to-world (row major), may be inf
      intrinsic/intrinsic_depth.txt  # 4x4 K (fx 0 cx / 0 fy cy)
      (optional) instance/<i>.png    # 16-bit instance ids (for eval)

Frames are ordered by index; invalid poses (inf/nan, tracking failures in
the capture) are surfaced as None.  Decode is PIL with the same interface
as datasets/tum.py, so the CLI/pipeline take either interchangeably.
"""

from __future__ import annotations

import os
from typing import Iterator, NamedTuple

import numpy as np

from instancefusion_tpu.geometry.camera import Intrinsics

DEPTH_SCALE = 1000.0  # ScanNet: 16-bit PNG value / 1000 = meters


class ScanNetFrame(NamedTuple):
    depth: np.ndarray  # f32[H,W] meters
    color: np.ndarray  # f32[H,W,3] in [0,1]
    timestamp: float  # frame index / 30 Hz
    T_wc: np.ndarray | None  # f32[4,4] capture pose if finite
    instance: np.ndarray | None  # i32[H,W] instance ids if exported


def read_intrinsics(scene_dir: str) -> Intrinsics | None:
    path = os.path.join(scene_dir, "intrinsic", "intrinsic_depth.txt")
    if not os.path.exists(path):
        return None
    k = np.loadtxt(path)
    # Probe one depth image for the resolution.
    ddir = os.path.join(scene_dir, "depth")
    first = sorted(os.listdir(ddir), key=lambda s: int(os.path.splitext(s)[0]))[0]
    from PIL import Image

    w, h = Image.open(os.path.join(ddir, first)).size
    return Intrinsics(
        fx=float(k[0, 0]), fy=float(k[1, 1]),
        cx=float(k[0, 2]), cy=float(k[1, 2]),
        width=w, height=h,
    )


class ScanNetSequence:
    def __init__(self, scene_dir: str, intrinsics: Intrinsics | None = None):
        self.root = scene_dir
        self.intrinsics = intrinsics or read_intrinsics(scene_dir)
        ddir = os.path.join(scene_dir, "depth")
        self.indices = sorted(
            int(os.path.splitext(f)[0]) for f in os.listdir(ddir)
            if f.endswith(".png")
        )
        self.has_instances = os.path.isdir(os.path.join(scene_dir, "instance"))

    def __len__(self) -> int:
        return len(self.indices)

    def _load(self, i: int) -> ScanNetFrame:
        from PIL import Image

        idx = self.indices[i]
        d = np.asarray(
            Image.open(os.path.join(self.root, "depth", f"{idx}.png")),
            dtype=np.float32,
        ) / DEPTH_SCALE
        cpath = os.path.join(self.root, "color", f"{idx}.jpg")
        if not os.path.exists(cpath):
            cpath = os.path.join(self.root, "color", f"{idx}.png")
        c = np.asarray(Image.open(cpath).convert("RGB"), dtype=np.float32) / 255.0
        if c.shape[:2] != d.shape:
            ch, cw = c.shape[:2]
            dh, dw = d.shape
            ys = (np.arange(dh) * ch // dh).astype(int)
            xs = (np.arange(dw) * cw // dw).astype(int)
            c = c[ys][:, xs]
        T = None
        ppath = os.path.join(self.root, "pose", f"{idx}.txt")
        if os.path.exists(ppath):
            Tl = np.loadtxt(ppath).astype(np.float32)
            if np.isfinite(Tl).all():
                T = Tl
        inst = None
        ipath = os.path.join(self.root, "instance", f"{idx}.png")
        if self.has_instances and os.path.exists(ipath):
            inst = np.asarray(Image.open(ipath), dtype=np.int32)
        return ScanNetFrame(
            depth=d, color=c, timestamp=idx / 30.0, T_wc=T, instance=inst
        )

    def frames(self, limit: int | None = None) -> Iterator[ScanNetFrame]:
        n = len(self.indices) if limit is None else min(limit, len(self.indices))
        for i in range(n):
            yield self._load(i)

    def gt_poses(self, limit: int | None = None) -> np.ndarray | None:
        n = len(self.indices) if limit is None else min(limit, len(self.indices))
        poses = []
        for i in range(n):
            f = self._load(i)
            if f.T_wc is None:
                return None
            poses.append(f.T_wc)
        return np.stack(poses)
