#!/usr/bin/env python
"""Layout-tax microbenchmark: is NHWC with C<128 really padding lanes 4x, and
would NCHW (W on lanes) win for the shallow levels? All variants scanned inside
one jit (the axon tunnel has a ~2ms dispatch floor).

Run: python tools/layout_micro.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp

INNER = 16


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[:1])


def bench(step, *args, iters=5, warmup=2):
    @jax.jit
    def run(*args):
        def body(c, _):
            return step(*((c,) + args[1:])), ()
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


def main():
    rng = np.random.default_rng(0)
    N, H, W, C = 16, 256, 256, 32
    nbytes = N * H * W * C * 2

    x_nhwc = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
    x_nchw = jnp.asarray(rng.standard_normal((N, C, H, W)), jnp.bfloat16)

    # elementwise: y = relu(x*a+b) + x  (2 reads-ish, 1 write)
    a4 = jnp.float32(1.01).astype(jnp.bfloat16)

    def ew(c):
        return jnp.maximum(c * a4 + 0.1, 0) - c * 0.5

    t_ew_nhwc = bench(ew, x_nhwc)
    t_ew_nchw = bench(ew, x_nchw)

    # conv 3x3 dilation 15, C=32->32
    k = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.01, jnp.bfloat16)

    dn_nhwc = jax.lax.conv_dimension_numbers((N, H, W, C), (3, 3, C, C),
                                             ("NHWC", "HWIO", "NHWC"))
    dn_nchw = jax.lax.conv_dimension_numbers((N, C, H, W), (3, 3, C, C),
                                             ("NCHW", "HWIO", "NCHW"))

    def conv_nhwc(c):
        y = jax.lax.conv_general_dilated(c, k, (1, 1), "SAME",
                                         rhs_dilation=(15, 15),
                                         dimension_numbers=dn_nhwc,
                                         preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    def conv_nchw(c):
        y = jax.lax.conv_general_dilated(c, k, (1, 1), "SAME",
                                         rhs_dilation=(15, 15),
                                         dimension_numbers=dn_nchw,
                                         preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    t_cv_nhwc = bench(conv_nhwc, x_nhwc)
    t_cv_nchw = bench(conv_nchw, x_nchw)

    # BN-style reduction
    def red_nhwc(c):
        s = jnp.sum(c.astype(jnp.float32), (0, 1, 2))
        s2 = jnp.sum((c.astype(jnp.float32)) ** 2, (0, 1, 2))
        return c + (s[0] * 1e-30 + s2[0] * 1e-30).astype(c.dtype)

    def red_nchw(c):
        s = jnp.sum(c.astype(jnp.float32), (0, 2, 3))
        s2 = jnp.sum((c.astype(jnp.float32)) ** 2, (0, 2, 3))
        return c + (s[0] * 1e-30 + s2[0] * 1e-30).astype(c.dtype)

    t_rd_nhwc = bench(red_nhwc, x_nhwc)
    t_rd_nchw = bench(red_nchw, x_nchw)

    gb = lambda t, m: nbytes * m / t / 1e6
    print(f"(N={N},H={H},W={W},C={C}) {nbytes/1e6:.0f}MB bf16")
    print(f"elementwise  NHWC {t_ew_nhwc:.2f}ms [{gb(t_ew_nhwc,2):.0f}GB/s]  "
          f"NCHW {t_ew_nchw:.2f}ms [{gb(t_ew_nchw,2):.0f}GB/s]")
    print(f"conv d15     NHWC {t_cv_nhwc:.2f}ms  NCHW {t_cv_nchw:.2f}ms")
    print(f"bn-reduce    NHWC {t_rd_nhwc:.2f}ms  NCHW {t_rd_nchw:.2f}ms")

    # and the C=8 PSP shape
    C8 = 8
    x8_nhwc = jnp.asarray(rng.standard_normal((N, H, W, C8)), jnp.bfloat16)
    x8_nchw = jnp.asarray(rng.standard_normal((N, C8, H, W)), jnp.bfloat16)
    t8_nhwc = bench(ew, x8_nhwc)
    t8_nchw = bench(ew, x8_nchw)
    print(f"elementwise C=8: NHWC {t8_nhwc:.2f}ms  NCHW {t8_nchw:.2f}ms")


if __name__ == "__main__":
    main()
