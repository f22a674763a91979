import jax
import jax.numpy as jnp
import numpy as np

from instancefusion_tpu.geometry.camera import (
    Intrinsics,
    TUM_FR1,
    backproject,
    project,
    ray_directions,
)


def test_project_backproject_roundtrip():
    intr = Intrinsics(fx=100.0, fy=110.0, cx=31.5, cy=23.5, width=64, height=48)
    depth = jax.random.uniform(jax.random.PRNGKey(0), (48, 64), minval=0.5, maxval=3.0)
    vmap = backproject(intr, depth)
    u, v, z = project(intr, vmap)
    vv, uu = np.meshgrid(np.arange(48), np.arange(64), indexing="ij")
    np.testing.assert_allclose(np.asarray(u), uu, atol=1e-3)
    np.testing.assert_allclose(np.asarray(v), vv, atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth), atol=1e-5)


def test_level_intrinsics_center_alignment():
    intr = TUM_FR1
    l1 = intr.level(1)
    assert l1.width == 320 and l1.height == 240
    # A point projecting to full-res pixel center (u, v) projects to
    # ((u+0.5)/2 - 0.5) at level 1.
    p = jnp.array([[0.3, -0.2, 2.0]])
    u0, v0, _ = project(intr, p)
    u1, v1, _ = project(l1, p)
    np.testing.assert_allclose(np.asarray(u1), (np.asarray(u0) + 0.5) / 2 - 0.5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(v1), (np.asarray(v0) + 0.5) / 2 - 0.5, atol=1e-4)


def test_ray_directions_unit_z():
    intr = Intrinsics(fx=100.0, fy=100.0, cx=15.5, cy=11.5, width=32, height=24)
    rays = ray_directions(intr)
    assert rays.shape == (24, 32, 3)
    np.testing.assert_allclose(np.asarray(rays[..., 2]), 1.0)
    # Backproject of unit depth equals ray directions.
    vm = backproject(intr, jnp.ones((24, 32)))
    np.testing.assert_allclose(np.asarray(rays), np.asarray(vm), atol=1e-5)
