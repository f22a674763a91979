import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instancefusion_tpu.geometry import (
    se3_exp,
    se3_log,
    so3_exp,
    so3_log,
    se3_inverse,
    transform_points,
)


def random_twists(key, n, scale=1.0):
    return jax.random.normal(key, (n, 6)) * scale


def test_so3_exp_orthonormal():
    w = jax.random.normal(jax.random.PRNGKey(0), (32, 3))
    R = so3_exp(w)
    eye = jnp.eye(3)
    err = jnp.max(jnp.abs(R @ jnp.swapaxes(R, -1, -2) - eye))
    assert err < 1e-5
    det = jnp.linalg.det(R)
    np.testing.assert_allclose(det, 1.0, atol=1e-5)


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 0.5, 2.0])
def test_so3_roundtrip(scale):
    w = random_twists(jax.random.PRNGKey(1), 16, scale)[:, 3:]
    # log is only injective for |w| < pi; compare on the group instead.
    R = so3_exp(w)
    R2 = so3_exp(so3_log(R))
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-4)


@pytest.mark.parametrize("scale", [1e-6, 1e-3, 0.5])
def test_se3_roundtrip(scale):
    # Rotation part kept under pi so se3_log is the exact inverse.
    xi = random_twists(jax.random.PRNGKey(2), 16, scale)
    xi2 = se3_log(se3_exp(xi))
    np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=2e-4)


def test_se3_exp_identity():
    T = se3_exp(jnp.zeros(6))
    np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)


def test_se3_inverse():
    xi = random_twists(jax.random.PRNGKey(3), 8, 0.7)
    T = se3_exp(xi)
    TT = T @ se3_inverse(T)
    np.testing.assert_allclose(
        np.asarray(TT), np.broadcast_to(np.eye(4), TT.shape), atol=1e-5
    )


def test_transform_points_matches_matmul():
    xi = random_twists(jax.random.PRNGKey(4), 1, 0.5)[0]
    T = se3_exp(xi)
    p = jax.random.normal(jax.random.PRNGKey(5), (100, 3))
    q = transform_points(T, p)
    ph = jnp.concatenate([p, jnp.ones((100, 1))], axis=-1)
    q2 = (ph @ T.T)[:, :3]
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-5)


def test_se3_exp_composition_small():
    # exp(a)exp(b) ~ exp(a+b) to first order for small twists.
    a = jnp.array([0.001, 0.0, 0.0, 0.0, 0.002, 0.0])
    b = jnp.array([0.0, 0.001, 0.0, 0.001, 0.0, 0.0])
    lhs = se3_exp(a) @ se3_exp(b)
    rhs = se3_exp(a + b)
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-5)
