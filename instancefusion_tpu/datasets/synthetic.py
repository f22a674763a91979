"""Synthetic RGB-D sequence generator (analytic SDF scene + sphere tracing).

The reference validates end-to-end on TUM RGB-D `.klg` logs (SURVEY.md §5);
this box has no datasets and no network, so golden end-to-end tests run on
synthetic sequences rendered from an analytic scene: exact depth (sphere
tracing the analytic SDF), exact trajectory ground truth, and per-object
instance ids for the instance-fusion tests.

The scene: the interior of a room box containing a sphere, a box and a
cylinder (distinct instance ids 1..3; walls id 0).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from instancefusion_tpu.geometry.camera import Intrinsics, ray_directions
from instancefusion_tpu.geometry.se3 import se3_exp


class Frame(NamedTuple):
    depth: jnp.ndarray  # f32[H,W] meters, 0 = invalid
    color: jnp.ndarray  # f32[H,W,3] in [0,1]
    instance: jnp.ndarray  # i32[H,W] ground-truth object id (-1 = none)
    T_wc: jnp.ndarray  # f32[4,4] ground-truth camera-to-world pose


def _sd_sphere(p, center, r):
    return jnp.linalg.norm(p - center, axis=-1) - r


def _sd_box(p, center, half):
    q = jnp.abs(p - center) - half
    return jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1) + jnp.minimum(
        jnp.max(q, axis=-1), 0.0
    )


def _sd_cylinder(p, center, r, h):
    d = p - center
    dxy = jnp.linalg.norm(d[..., :2], axis=-1) - r
    dz = jnp.abs(d[..., 2]) - h
    outside = jnp.linalg.norm(
        jnp.maximum(jnp.stack([dxy, dz], -1), 0.0), axis=-1
    )
    inside = jnp.minimum(jnp.maximum(dxy, dz), 0.0)
    return outside + inside


# Object palette for the synthetic color render.
_COLORS = jnp.array(
    [
        [0.7, 0.7, 0.7],  # walls
        [0.9, 0.3, 0.2],  # sphere
        [0.2, 0.7, 0.3],  # box
        [0.2, 0.4, 0.9],  # cylinder
    ]
)


def scene_sdf(p: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Analytic scene SDF. p: (..., 3) world -> (sdf, object_id).

    Room interior: 2.4 x 2.4 x 2.4 m box centered at (0, 0, 1.2) —
    the SDF of the interior is (distance to walls) negated.
    """
    room_half = jnp.array([1.2, 1.2, 1.2])
    room_center = jnp.array([0.0, 0.0, 1.2])
    walls = -_sd_box(p, room_center, room_half)  # positive inside the room
    sphere = _sd_sphere(p, jnp.array([0.45, 0.10, 1.05]), 0.30)
    box = _sd_box(p, jnp.array([-0.50, 0.35, 1.55]), jnp.array([0.25, 0.22, 0.25]))
    cyl = _sd_cylinder(p, jnp.array([-0.15, -0.55, 0.85]), 0.18, 0.35)
    ds = jnp.stack([walls, sphere, box, cyl], axis=-1)
    obj = jnp.argmin(ds, axis=-1).astype(jnp.int32)
    return jnp.min(ds, axis=-1), obj


@functools.partial(jax.jit, static_argnums=(1,))
def _render_frame_impl(T_wc: jnp.ndarray, intr: Intrinsics, palette: jnp.ndarray) -> Frame:
    """Sphere-trace the analytic SDF to exact depth + flat-shaded color.

    `palette` is a traced argument on purpose: this environment's axon TPU
    runtime permanently degrades to a per-op fallback (~0.5 ms/HLO for all
    later programs) after executing any program whose dot/gather operand is
    an embedded trace-time constant. Keep tables out of closures.
    """
    rays_c = ray_directions(intr)
    ray_norm = jnp.linalg.norm(rays_c, axis=-1)
    R = T_wc[:3, :3]
    o = T_wc[:3, 3]
    dirs = (rays_c.reshape(-1, 3) @ R.T).reshape(rays_c.shape)
    dirs = dirs / ray_norm[..., None]

    def body(_, t):
        p = o + t[..., None] * dirs
        s, _ = scene_sdf(p)
        return t + jnp.clip(s, -0.05, 0.5) * 0.9

    t = jax.lax.fori_loop(0, 96, body, jnp.full(rays_c.shape[:2], 0.05))
    p = o + t[..., None] * dirs
    s, obj = scene_sdf(p)
    hit = (jnp.abs(s) < 5e-3) & (t > 0.05) & (t < 8.0)
    depth = jnp.where(hit, t / ray_norm, 0.0)

    # Normal from analytic gradient for shading.
    eps = 1e-3
    grads = []
    for ax in range(3):
        e = jnp.zeros(3).at[ax].set(eps)
        sp, _ = scene_sdf(p + e)
        sm, _ = scene_sdf(p - e)
        grads.append(sp - sm)
    n = jnp.stack(grads, -1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    light = jnp.array([0.4, -0.3, -0.85])
    light = light / jnp.linalg.norm(light)
    shade = 0.55 + 0.45 * jnp.clip(-jnp.sum(n * light, axis=-1), 0.0, 1.0)
    base = jax.nn.one_hot(obj, palette.shape[0], dtype=jnp.float32) @ palette
    color = jnp.where(hit[..., None], base * shade[..., None], 0.0)
    instance = jnp.where(hit, obj, -1).astype(jnp.int32)
    return Frame(depth=depth, color=color, instance=instance, T_wc=T_wc)


def render_frame(T_wc: jnp.ndarray, intr: Intrinsics) -> Frame:
    return _render_frame_impl(T_wc, intr, _COLORS)


def orbit_trajectory(
    num_frames: int,
    radius: float = 0.45,
    center: jnp.ndarray | None = None,
    sweep: float = 1.2,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Smooth camera trajectory inside the room, looking at the scene.

    Returns (num_frames, 4, 4) camera-to-world poses. The camera starts
    near the -y wall looking at the room center and arcs sideways —
    adjacent poses differ by a few mm / fractions of a degree, mimicking a
    handheld 30 Hz sweep.
    """
    look_at = jnp.array([0.0, 0.0, 1.2]) if center is None else center
    ts = jnp.linspace(0.0, 1.0, num_frames)
    ang = (ts - 0.5) * sweep
    # Camera positions on an arc.
    cx = radius * jnp.sin(ang)
    cy = -0.95 + 0.06 * jnp.sin(ts * 5.0)
    cz = 1.1 + 0.08 * jnp.cos(ts * 3.0)
    eyes = jnp.stack([cx, cy, cz], axis=-1).astype(dtype)

    def pose(eye):
        fwd = look_at - eye
        fwd = fwd / jnp.linalg.norm(fwd)
        up_hint = jnp.array([0.0, 0.0, -1.0], dtype)
        right = jnp.cross(fwd, up_hint)
        right = right / jnp.maximum(jnp.linalg.norm(right), 1e-9)
        down = jnp.cross(fwd, right)  # camera +y points "down" in world
        R = jnp.stack([right, down, fwd], axis=-1)  # columns = cam axes
        T = jnp.eye(4, dtype=dtype)
        T = T.at[:3, :3].set(R).at[:3, 3].set(eye)
        return T

    return jax.vmap(pose)(eyes)


def make_sequence(num_frames: int, intr: Intrinsics):
    """Generator of Frames along the orbit trajectory."""
    poses = orbit_trajectory(num_frames)
    for i in range(num_frames):
        yield render_frame(poses[i], intr)
