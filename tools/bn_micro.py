#!/usr/bin/env python
"""Microbenchmarks for the BatchNorm redesign (VERDICT.md round-1 item #2).

The axon tunnel has a ~2ms per-dispatch floor, so each variant is iterated
INSIDE one jitted program with lax.scan and we report per-iteration time.

Questions answered on the real chip:
  1. Do reductions over (M, C) tensors with C < 128 lanes run slower than the
     same bytes shaped (M/k, 128)?  (lane-underutilization / layout-padding)
  2. What does a reshape (M, C) -> (M*C/128, 128) cost?
  3. How expensive is Flax BN (train mode) fwd+bwd vs the data floor?

Run: python tools/bn_micro.py
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

INNER = 20


def sync(x):
    # axon quirk: block_until_ready does not synchronize; force a transfer
    leaves = jax.tree_util.tree_leaves(x)
    np.asarray(leaves[0].ravel()[:1])


def bench_scan(step, x, iters=5, warmup=2):
    """step: (carry_x, i) -> carry-like output. Scanned INNER times inside jit."""

    @jax.jit
    def run(x):
        def body(c, i):
            return step(c, i), ()
        out, _ = jax.lax.scan(body, x, jnp.arange(INNER))
        return out

    for _ in range(warmup):
        out = run(x)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(x)
    sync(out)
    return (time.perf_counter() - t0) / iters / INNER * 1e3  # ms per inner iter


def main():
    dev = jax.devices()[0]
    print(f"# device: {dev}, inner={INNER}", file=sys.stderr)
    rng = np.random.default_rng(0)

    shapes = [
        (16, 256, 256, 8),
        (16, 256, 256, 32),
        (16, 128, 128, 64),
        (16, 64, 64, 128),
    ]

    for (N, H, W, C) in shapes:
        M = N * H * W
        k = max(1, 128 // C)
        nbytes = M * C * 2
        x = jnp.asarray(rng.standard_normal((N, H, W, C)), jnp.bfloat16)
        xf = jnp.asarray(rng.standard_normal((M // k, C * k)), jnp.bfloat16)

        # variants return a same-shape carry so scan keeps the dependency chain
        def stats_nc(c, i):
            xs = c.astype(jnp.float32)
            m = jnp.mean(xs, (0, 1, 2))
            m2 = jnp.mean(xs * xs, (0, 1, 2))
            return c + (m[0] + m2[0]).astype(c.dtype) * 0

        def stats_fold(c, i):
            xs = c.astype(jnp.float32)
            m = jnp.mean(xs, 0)
            m2 = jnp.mean(xs * xs, 0)
            return c + (m[0] + m2[0]).astype(c.dtype) * 0

        def stats_reshape(c, i):
            xs = c.reshape(-1, C * k).astype(jnp.float32)
            m = jnp.mean(xs, 0)
            m2 = jnp.mean(xs * xs, 0)
            return c + (m[0] + m2[0]).astype(c.dtype) * 0

        a_c = jnp.full((C,), 1.0, jnp.bfloat16)
        b_c = jnp.zeros((C,), jnp.bfloat16)
        a_f = jnp.full((C * k,), 1.0, jnp.bfloat16)
        b_f = jnp.zeros((C * k,), jnp.bfloat16)

        def apply_nc(c, i):
            return jnp.maximum(c * a_c + b_c, 0) - c * 0.5

        def apply_fold(c, i):
            return jnp.maximum(c * a_f + b_f, 0) - c * 0.5

        t_nc = bench_scan(stats_nc, x)
        t_fold = bench_scan(stats_fold, xf)
        t_resh = bench_scan(stats_reshape, x)
        t_app_nc = bench_scan(apply_nc, x)
        t_app_f = bench_scan(apply_fold, xf)

        gbps = lambda t: nbytes / t / 1e6
        print(f"({N},{H},{W},{C}) {nbytes/1e6:.0f}MB bf16: "
              f"stats(NC)={t_nc:.2f}ms [{gbps(t_nc):.0f}GB/s] "
              f"stats(fold128)={t_fold:.2f}ms [{gbps(t_fold):.0f}GB/s] "
              f"stats(reshape+fold)={t_resh:.2f}ms "
              f"apply(NC)={t_app_nc:.2f}ms [{gbps(t_app_nc)*3:.0f}] "
              f"apply(fold)={t_app_f:.2f}ms [{gbps(t_app_f)*3:.0f}]")

        # Full Flax BN train-mode fwd+bwd at this shape, scanned
        bn = nn.BatchNorm(use_running_average=False, momentum=0.99, epsilon=1e-3,
                          dtype=jnp.bfloat16)
        variables = bn.init(jax.random.PRNGKey(0), x)
        params = variables["params"]
        stats = variables["batch_stats"]

        def bn_step(c, i):
            def loss(x):
                y, _ = bn.apply({"params": params, "batch_stats": stats},
                                x, mutable=["batch_stats"])
                return jnp.sum(jnp.maximum(y, 0).astype(jnp.float32))
            l, g = jax.value_and_grad(loss)(c)
            return g.astype(c.dtype)

        t_bn = bench_scan(bn_step, x)
        print(f"    flax BN+relu fwd+bwd(dx): {t_bn:.2f}ms "
              f"[{5*nbytes/t_bn/1e6:.0f}GB/s equiv @5x traffic]")


if __name__ == "__main__":
    main()
