"""Microbenchmark decimation variants for [480,640,3] f32 maps on TPU."""
import time
import jax
import jax.numpy as jnp
import numpy as np

H, W, C, S = 480, 640, 3, 2
x = jnp.asarray(np.random.rand(H, W, C).astype(np.float32))
x2 = jnp.asarray(np.random.rand(H, W).astype(np.float32))


def timeit(name, fn, *a, n=50):
    f = jax.jit(fn)
    o = f(*a)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(n):
        o = f(*a)
    jax.block_until_ready(o)
    print(f"{name:28s} {(time.perf_counter()-t0)/n*1e3:7.3f} ms  {o.shape}")


def v_stride(x):
    return x[::S, ::S]


def v_reshape(x):
    h, w = x.shape[:2]
    return x.reshape((h // S, S, w // S, S) + x.shape[2:])[:, 0, :, 0]


def _sel(n, s, dtype=jnp.float32):
    r = jax.lax.broadcasted_iota(jnp.int32, (n // s, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n // s, n), 1)
    return (c == r * s).astype(dtype)


def v_matmul(x):
    h, w = x.shape[:2]
    sr = _sel(h, S)
    sc = _sel(w, S)
    prec = jax.lax.Precision.HIGHEST
    y = jax.lax.dot_general(sr, x.reshape(h, -1), (((1,), (0,)), ((), ())),
                            precision=prec)  # (h/S, w*C)
    y = y.reshape(h // S, w, -1)
    z = jax.lax.dot_general(sc, y, (((1,), (1,)), ((), ())), precision=prec)
    # (w/S, h/S, C) -> transpose
    return z.transpose(1, 0, 2)


def v_conv(x):
    k = jnp.eye(C, dtype=x.dtype).reshape(1, 1, C, C)
    return jax.lax.conv_general_dilated(
        x[None], k, window_strides=(S, S), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]


def v_planes(x):
    # per-plane reshape trick
    h, w = x.shape[:2]
    outs = [
        x[..., c].reshape(h // S, S, w // S, S)[:, 0, :, 0] for c in range(C)
    ]
    return jnp.stack(outs, -1)


timeit("stride  [::2,::2] 3ch", v_stride, x)
timeit("reshape trick 3ch", v_reshape, x)
timeit("matmul select 3ch", v_matmul, x)
timeit("conv1x1 stride 3ch", v_conv, x)
timeit("per-plane reshape 3ch", v_planes, x)
timeit("stride 2d", lambda y: y[::S, ::S], x2)
timeit("reshape 2d", lambda y: y.reshape(H // S, S, W // S, S)[:, 0, :, 0], x2)


def v_matmul2(y):
    sr = _sel(H, S)
    sc = _sel(W, S)
    prec = jax.lax.Precision.HIGHEST
    return jax.lax.dot_general(
        jax.lax.dot_general(sr, y, (((1,), (0,)), ((), ())), precision=prec),
        sc, (((1,), (1,)), ((), ())), precision=prec)


timeit("matmul 2d", v_matmul2, x2)


def v_conv2(y):
    k = jnp.ones((1, 1, 1, 1), y.dtype)
    return jax.lax.conv_general_dilated(
        y[None, :, :, None], k, window_strides=(S, S), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


timeit("conv 2d", v_conv2, x2)
