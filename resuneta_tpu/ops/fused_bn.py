"""Hand-scheduled BatchNorm training path (custom VJP).

The reference spends its normalization time inside Keras BatchNormalization
(ResUnet_a/model2.py:17-24 — BN->ReLU->conv twice per residual branch, ~45 BN
layers). Autodiff of the textbook BN expression produces a tangle of reductions
and broadcasts per layer; round-1 profiling measured those BN-statistics
reductions at 27% of the train step (BENCH_NOTES.md). This module replaces the
autodiff backward with the closed-form BN gradient, which needs exactly

  forward : one fused (sum, sum-of-squares) pass  +  one elementwise apply pass
  backward: one fused (dbeta, dgamma) reduction pass  +  one elementwise dx pass

and optionally folds the following ReLU into the apply (the ResBlock branches
are always BN->ReLU, so the activation costs no extra memory pass and its mask
is recomputed, not stored).

Everything is jnp: under a GSPMD mesh the reductions become compiler-inserted
cross-device psums, so sync-BN semantics (global-batch statistics, identical to
single-device numerics) are preserved on any dp / dp x sp mesh. Statistics are
accumulated in float32 regardless of the bfloat16 compute dtype, matching
flax.linen.BatchNorm's fast-variance formulation (var = E[x^2] - E[x]^2).
"""

import functools
import os

import jax
import jax.numpy as jnp


def bn_stats(x):
    """Batch statistics over all axes but the channel axis, float32.

    Returns (mean, var) with var = E[x^2] - E[x]^2 (fast variance — the same
    formulation flax.linen.BatchNorm uses, so numerics line up). Plain jnp on
    purpose: one producer-fused pass, and autodiff through it is the cheap
    broadcast-divide. Call once and fan out to the four dilation branches of a
    ResBlock — their first BNs share the same input statistics.
    """
    axes = tuple(range(x.ndim - 1))
    xs = x.astype(jnp.float32)
    mean = jnp.mean(xs, axes)
    msq = jnp.mean(xs * xs, axes)
    # under a shard_map'ed train step the batch axis is LOCAL — pmean the raw
    # moments across the data axis so statistics stay global-batch (sync-BN,
    # identical numerics to the single-device / GSPMD program). Identity when
    # no data axis is mapped.
    from ..parallel.axis import pmean as _axis_pmean
    mean, msq = _axis_pmean((mean, msq))
    # tagged as remat save points: (C,)-sized, and recomputing them in the
    # backward would cost a full extra pass over x (train/steps.py SAVE_CONVS)
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(mean, "save"), checkpoint_name(msq - mean * mean, "save")


def bn_stats_dense(xd, C):
    """bn_stats on the dense (N, H, W*C) view (the ResBlock fast path,
    models/resuneta.py): the big reduction runs over rows of a fully
    lane-packed array — full lane utilization and 128/C-fold fewer physical
    HBM bytes than reducing the lane-padded NHWC layout — and only the tiny
    (W, C) tail is folded per channel."""
    xs = xd.astype(jnp.float32)
    n = xd.shape[0] * xd.shape[1] * (xd.shape[2] // C)
    s = jnp.sum(xs, (0, 1)).reshape(-1, C).sum(0)
    s2 = jnp.sum(xs * xs, (0, 1)).reshape(-1, C).sum(0)
    mean = s / n
    msq = s2 / n
    # sync-BN across a shard_map'ed data axis (see bn_stats)
    from ..parallel.axis import pmean as _axis_pmean
    mean, msq = _axis_pmean((mean, msq))
    var = msq - mean * mean
    from jax.ad_checkpoint import checkpoint_name
    return checkpoint_name(mean, "save"), checkpoint_name(var, "save")


def _apply_expr(relu, eps, x, gamma, beta, mean, var):
    invstd = jax.lax.rsqrt(var + eps)
    a = (gamma * invstd).astype(x.dtype)
    b = (beta - mean * gamma * invstd).astype(x.dtype)
    y = x * a + b
    if relu:
        y = jnp.maximum(y, 0)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def bn_apply(relu, eps, x, gamma, beta, mean, var):
    """y = relu?((x - mean) * rsqrt(var+eps) * gamma + beta), closed-form VJP.

    gamma/beta/mean/var are (C,) float32; x is NHWC in the compute dtype. The
    scale/offset are folded to a single fused multiply-add in x.dtype (the
    float32 folding happens on (C,) vectors, so per-element precision is at
    least flax.linen.BatchNorm's).
    """
    return _apply_expr(relu, eps, x, gamma, beta, mean, var)


def _bn_apply_fwd(relu, eps, x, gamma, beta, mean, var):
    y = _apply_expr(relu, eps, x, gamma, beta, mean, var)
    return y, (x, gamma, beta, mean, var)


def _bn_apply_bwd(relu, eps, res, g):
    x, gamma, beta, mean, var = res
    axes = tuple(range(x.ndim - 1))

    invstd = jax.lax.rsqrt(var + eps)
    if relu:
        # recompute the activation mask (same expression/dtype as forward)
        a = (gamma * invstd).astype(x.dtype)
        b = (beta - mean * gamma * invstd).astype(x.dtype)
        g = jnp.where(x * a + b > 0, g, jnp.zeros((), g.dtype))

    gf = g.astype(jnp.float32)
    xhat = (x.astype(jnp.float32) - mean) * invstd

    # one fused reduction pass over (g, x)
    dbeta = jnp.sum(gf, axes)
    dgamma = jnp.sum(gf * xhat, axes)

    # chain terms for the statistics — (C,)-vector algebra, no extra passes
    dmean = -gamma * invstd * dbeta
    dvar = -0.5 * gamma * invstd * invstd * dgamma

    # one elementwise pass for dx
    dx = (g * (gamma * invstd).astype(g.dtype)).astype(x.dtype)
    return dx, dgamma, dbeta, dmean, dvar


bn_apply.defvjp(_bn_apply_fwd, _bn_apply_bwd)


_PLAIN_BN = bool(os.environ.get("RESUNETA_PLAIN_BN"))


def batch_norm_act(x, gamma, beta, mean, var, *, eps=1e-3, relu=False):
    """Functional fused BN(+ReLU). See BatchNorm in models/norm.py for the
    Flax module wrapper with running-statistics bookkeeping.
    RESUNETA_PLAIN_BN=1 switches to the plain autodiff expression (A/B lever
    for interactions with rematerialization policies)."""
    if _PLAIN_BN:
        return _apply_expr(relu, eps, x, gamma, beta, mean, var)
    return bn_apply(relu, eps, x, gamma, beta, mean, var)
