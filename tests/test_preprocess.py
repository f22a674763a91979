import jax
import jax.numpy as jnp
import numpy as np

from instancefusion_tpu.config import PreprocessConfig
from instancefusion_tpu.ops import preprocess as pp
from tests.helpers import SMALL_INTR


def test_clamp_depth():
    cfg = PreprocessConfig(depth_min=0.5, depth_max=3.0)
    d = jnp.array([[0.0, 0.3, 1.0, 5.0]])
    out = pp.clamp_depth(d, cfg)
    np.testing.assert_array_equal(np.asarray(out), [[0.0, 0.0, 1.0, 0.0]])


def test_bilateral_preserves_constant():
    cfg = PreprocessConfig()
    d = jnp.full((32, 40), 2.0)
    out = pp.bilateral_filter(d, cfg)
    np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-5)


def test_bilateral_preserves_edges_smooths_noise():
    cfg = PreprocessConfig(bilateral_sigma_depth=0.05)
    key = jax.random.PRNGKey(0)
    # Step edge at column 20: 1m | 2m, plus 5mm noise.
    d = jnp.where(jnp.arange(40)[None, :] < 20, 1.0, 2.0)
    d = jnp.broadcast_to(d, (32, 40))
    noise = 0.005 * jax.random.normal(key, d.shape)
    out = pp.bilateral_filter(d + noise, cfg)
    out = np.asarray(out)
    # Noise reduced in the interior...
    assert np.std(out[8:24, 5:15] - 1.0) < np.std(np.asarray(noise)[8:24, 5:15])
    # ...but the edge not smeared: pixels adjacent to the edge stay on-side.
    assert np.all(out[:, 19] < 1.2)
    assert np.all(out[:, 20] > 1.8)


def test_bilateral_ignores_invalid():
    cfg = PreprocessConfig()
    d = jnp.full((16, 16), 1.5).at[8, 8].set(0.0)
    out = np.asarray(pp.bilateral_filter(d, cfg))
    assert out[8, 8] == 0.0  # invalid center stays invalid
    np.testing.assert_allclose(out[7, 8], 1.5, atol=1e-5)  # neighbors unharmed


def test_pyr_down_depth_valid_aware():
    d = jnp.array([[1.0, 0.0], [1.0, 1.0]])
    out = pp.pyr_down_depth(d)
    np.testing.assert_allclose(np.asarray(out), [[1.0]])
    out0 = pp.pyr_down_depth(jnp.zeros((2, 2)))
    np.testing.assert_array_equal(np.asarray(out0), [[0.0]])


def test_normals_of_plane():
    # A fronto-parallel plane at z=2 -> normals (0, 0, -1) (toward camera).
    from instancefusion_tpu.geometry.camera import backproject

    d = jnp.full((SMALL_INTR.height, SMALL_INTR.width), 2.0)
    vmap = backproject(SMALL_INTR, d)
    n, valid = pp.compute_normals(vmap)
    n = np.asarray(n)
    valid = np.asarray(valid)
    assert valid[1:-1, 1:-1].all()
    expected = np.broadcast_to(np.array([0.0, 0.0, -1.0]), n[valid].shape)
    np.testing.assert_allclose(n[valid], expected, atol=1e-4)


def test_pyramid_shapes():
    d = jnp.full((SMALL_INTR.height, SMALL_INTR.width), 2.0)
    pyr = pp.build_frame_pyramid(d, SMALL_INTR, PreprocessConfig(), 3)
    assert pyr[0]["depth"].shape == (120, 160)
    assert pyr[1]["depth"].shape == (60, 80)
    assert pyr[2]["depth"].shape == (30, 40)
    assert pyr[2]["vmap"].shape == (30, 40, 3)
