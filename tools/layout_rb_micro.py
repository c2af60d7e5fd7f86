#!/usr/bin/env python
"""Full ResBlock(32, [1,3,15,31]) fwd+bwd in NHWC vs NCHW, scanned on-chip.
Decides whether a channels-first shallow-level path is worth building.
"""

import os
import sys
import time
import functools

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

INNER = 8
N, H, W, C = 16, 256, 256, 32
DILS = (1, 3, 15, 31)


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def bench(fn, *args, iters=4, warmup=2):
    @jax.jit
    def run(*args):
        def body(c, _):
            return fn(*((c,) + args[1:])), ()
        out, _ = jax.lax.scan(body, args[0], jnp.arange(INNER))
        return out
    for _ in range(warmup):
        out = run(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(*args)
    sync(out)
    return (time.perf_counter() - t0) / iters / INNER * 1e3


def bn_relu(x, axes):
    xs = x.astype(jnp.float32)
    m = jnp.mean(xs, axes, keepdims=True)
    v = jnp.mean(xs * xs, axes, keepdims=True) - m * m
    y = (x - m.astype(x.dtype)) * jax.lax.rsqrt(v + 1e-3).astype(x.dtype)
    return jnp.maximum(y, 0)


def make_rb(layout):
    if layout == "NHWC":
        dn = ("NHWC", "HWIO", "NHWC")
        axes = (0, 1, 2)
        shape = (N, H, W, C)
    else:
        dn = ("NCHW", "HWIO", "NCHW")
        axes = (0, 2, 3)
        shape = (N, C, H, W)
    dnums = jax.lax.conv_dimension_numbers(shape, (3, 3, C, C), dn)

    def rb(x, ks):
        out = x
        for i, d in enumerate(DILS):
            b = bn_relu(x, axes)
            b = jax.lax.conv_general_dilated(
                b, ks[2 * i], (1, 1), "SAME", rhs_dilation=(d, d),
                dimension_numbers=dnums).astype(x.dtype)
            b = bn_relu(b, axes)
            b = jax.lax.conv_general_dilated(
                b, ks[2 * i + 1], (1, 1), "SAME", rhs_dilation=(d, d),
                dimension_numbers=dnums).astype(x.dtype)
            out = out + b
        return out

    def fwd_bwd(x, ks):
        def loss(x):
            return jnp.sum(rb(x, ks).astype(jnp.float32) ** 2)
        g = jax.grad(loss)(x)
        return g.astype(x.dtype)

    return rb, fwd_bwd, shape


def main():
    rng = np.random.default_rng(0)
    ks = [jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.05, jnp.bfloat16)
          for _ in range(8)]
    for layout in ("NHWC", "NCHW"):
        rb, fwd_bwd, shape = make_rb(layout)
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        t_f = bench(rb, x, ks)
        t_fb = bench(fwd_bwd, x, ks)
        print(f"{layout}: RB fwd {t_f:.2f} ms, fwd+bwd {t_fb:.2f} ms")


if __name__ == "__main__":
    main()
