#!/usr/bin/env python
"""Standalone timing of the fused-segment Pallas kernels vs the XLA-op
equivalents at the production shapes — the iteration harness for making the
TRAIN-side segment fusion win (ROADMAP round-3 item).

Run on the TPU: python tools/convseg_micro.py [N H W C ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def sync(x):
    import jax
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf.ravel()[:1])  # axon: block_until_ready doesn't sync


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from resuneta_tpu.ops.pallas import convseg

    shape = tuple(int(v) for v in sys.argv[1:5]) if len(sys.argv) > 4 \
        else (16, 256, 256, 32)
    N, H, W, C = shape
    dil = [int(v) for v in sys.argv[5:]] or [1, 3, 15, 31]
    dt = jnp.bfloat16

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, H, W, C)), dt)
    g = jnp.asarray(rng.standard_normal((N, H, W, C)), dt)
    a = jnp.asarray(rng.standard_normal(C), jnp.float32)
    b = jnp.asarray(rng.standard_normal(C), jnp.float32)
    mean = jnp.asarray(rng.standard_normal(C), jnp.float32)
    invstd = jnp.asarray(1 + 0.1 * rng.standard_normal(C), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, C, C)) * 0.1, dt)
    bias = jnp.asarray(rng.standard_normal(C), jnp.float32)

    print(f"# shape {shape}, dtype {dt.__name__}")
    for d in dil:
        if not convseg.pallas_available(H, W, C, C, d):
            print(f"d={d}: pallas unavailable")
            continue

        fwd = jax.jit(lambda x: convseg.bn_act_conv_pallas(
            x, a, b, w, bias, dilation=d))
        t_fwd = timeit(fwd, x)

        wblk = convseg._block_w(w)
        bwd = jax.jit(lambda x, g: convseg._segment_bwd_pallas(
            x, g, a, b, mean, invstd, wblk, dilation=d, act=True))
        t_bwd = timeit(bwd, x, g)

        # XLA equivalents: BN-affine+relu then conv (fwd); grads via autodiff
        def xla_seg(x):
            z = jnp.maximum(x.astype(jnp.float32) * a + b, 0).astype(dt)
            return jax.lax.conv_general_dilated(
                z, w, (1, 1), "SAME", rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias.astype(dt)

        xf = jax.jit(xla_seg)
        t_xf = timeit(xf, x)

        def xla_loss(x, w_):
            z = jnp.maximum(x.astype(jnp.float32) * a + b, 0).astype(dt)
            y = jax.lax.conv_general_dilated(
                z, w_, (1, 1), "SAME", rhs_dilation=(d, d),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jnp.sum(y.astype(jnp.float32) * g.astype(jnp.float32))

        xb = jax.jit(jax.grad(xla_loss, argnums=(0, 1)))
        t_xb = timeit(xb, x, w)

        print(f"d={d:3d}: pallas fwd {t_fwd:6.2f} ms  bwd {t_bwd:6.2f} ms | "
              f"xla fwd {t_xf:6.2f} ms  bwd {t_xb:6.2f} ms")


if __name__ == "__main__":
    main()
