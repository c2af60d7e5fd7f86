"""Pallas TPU kernel: fused k x k max-pool -> 1x1 conv on dense (N, H, W*C) views.

PSPPooling's levels (reference ResUnet_a/model2.py:41-60) max-pool the
FULL-RESOLUTION input at k in {2, 4, 8} and feed a quarter-channel 1x1
ConvBN. On the dense lane-packed view the pool itself is the problem: XLA
expresses it as a reshape to (N, H/k, k, W/k, k, C) + reduce_max, and both
the forward reshape and the backward's two broadcasts back to the 6-D shape
are physical retiles of the full-resolution tensor — profiled at ~8.6 ms of
the 256px step, the largest single slice of the round-4 relayout tax
(BENCH_NOTES.md).

This kernel runs pool + conv as one layout-pinned pass with NO materialized
intermediate:

  * row max: the (tile, W*C) block viewed as super-rows (tile/k, k*W*C) —
    a row-major-preserving shape cast — maxes its k static lane slices;
  * column max: log2(k) lane rolls + max (the convseg roll trick) give every
    pixel the max over [j, j+k); only the k-aligned base pixels are read.
    No wrap mask is needed: base pixels j <= W-k only ever read lanes < W;
  * base-pixel selection + conv: folded into the matmul — the weight is the
    selection-kron M[(b*C+c), (b'*cout+j)] = W[c, j] iff b == b'*k, so the
    (Mg, G*C) x M product applies the conv to the pooled base pixels and
    drops the rest (the downsample2_conv1x1 trick, generalized).

The custom-VJP backward recomputes the pooled values in VMEM, propagates the
base value and incoming gradient across each group with log2(k) bit-fill
rolls, counts ties with a log2(k)-step intra-group hypercube sum, and emits
dx = (x == pooled) * dz / ties — exactly jnp.max's VJP semantics (gradient
split equally among ties), which keeps the kernel a drop-in for the jnp
fallback path. dW and dbias accumulate across the grid like densemm's.
"""

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

import os as _os

# Round 5: 12e6 (from 11e6) admits the 512px k=4 PSP level at tile=32
# (11.60 MB) and the 256px k=8 level at tile=64 — their reshape-max
# fallbacks were ~8 ms of T(4,128) retiles in the 512px profile
# (BENCH_NOTES round 5). Hardware-verified to compile under the 16 MB
# scoped-VMEM limit.
_VMEM_BUDGET = int(_os.environ.get("RESUNETA_POOLCONV_VMEM_BUDGET", int(12e6)))


def _group(C, cout, k):
    """Output-pixel group size: smallest power of two with k | G and both the
    contraction (G*C) and output ((G/k)*cout) widths >= 128."""
    G = k
    while G * C < 128 or (G // k) * cout < 128:
        G *= 2
    return G


def _plan_tile(H, W, C, cout, k, itemsize):
    G = _group(C, cout, k)
    WC = W * C
    tile = min(128, H)
    while tile >= 8 * k:
        if H % tile == 0 and tile % (8 * k) == 0:
            rows = tile // k
            Mg = rows * W // G
            need = 2 * 2 * tile * WC * itemsize            # x in + dx out dbuf
            need += tile * WC * 4                          # s (f32 super view)
            need += 6 * rows * WC * 4                      # z/m/dz/cnt/mask
            need += G * C * (G // k) * cout * (itemsize + 4)   # M + dM
            need += Mg * G * C * 4                         # zg / dzg transient
            need += 2 * 2 * rows * (W // k) * cout * itemsize  # g in + y out
            if need <= _VMEM_BUDGET:
                return tile
        tile //= 2
    return None


def available(H, W, C, cout, k, *, interpret=False):
    from . import convseg
    if convseg._DISABLED_DEPTH or _os.environ.get("RESUNETA_NO_PALLAS") or \
            _os.environ.get("RESUNETA_NO_PALLAS_POOLCONV"):
        return False
    interpret = interpret or bool(
        _os.environ.get("RESUNETA_DENSEMM_INTERPRET"))
    if not _PALLAS_OK or (not interpret and jax.default_backend() != "tpu"):
        return False
    if k < 2 or k & (k - 1) or H % k or W % k:
        return False
    G = _group(C, cout, k)
    if G > 128 or W % G:
        return False
    if (W * C) % 128 or ((W // k) * cout) % 128 or (G * C) % 128 \
            or ((G // k) * cout) % 128:
        return False
    return _plan_tile(H, W, C, cout, k, 2) is not None


def _roll(arr, sh):
    """Rotate lanes so lane j reads lane j+sh (sh may be negative)."""
    lanes = arr.shape[-1]
    return pltpu.roll(arr, (-sh) % lanes, axis=1)


def _pool(x, k, C, W, rows):
    """(tile, W*C) block -> f32 row-maxed, column-sliding-maxed (rows, W*C):
    valid pooled values at the k-aligned base pixels."""
    WC = W * C
    s = x.reshape(rows, k * WC).astype(jnp.float32)
    r = s[:, :WC]
    for j in range(1, k):
        r = jnp.maximum(r, s[:, j * WC:(j + 1) * WC])
    z = r
    sh = C
    while sh < k * C:
        z = jnp.maximum(z, _roll(z, sh))
        sh *= 2
    return s, z


def _fwd_kernel(x_ref, w_ref, b_ref, o_ref, *, k, C, W, cout, tile, G, cd):
    rows = tile // k
    _, z = _pool(x_ref[0], k, C, W, rows)
    Mg = rows * W // G
    zg = z.reshape(Mg, G * C).astype(cd)
    y = jax.lax.dot_general(zg, w_ref[...],
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    y = y + b_ref[...]
    o_ref[0] = y.reshape(rows, (W // k) * cout).astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, w_ref, dx_ref, dw_ref, db_ref,
                *, k, C, W, cout, tile, G, cd):
    rows = tile // k
    WC = W * C
    Mg = rows * W // G
    L = k.bit_length() - 1

    i = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((i == 0) & (t == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    s, z = _pool(x_ref[0], k, C, W, rows)
    zg = z.reshape(Mg, G * C).astype(cd)
    gg_f = g_ref[0].reshape(Mg, (G // k) * cout).astype(jnp.float32)
    db_ref[...] += jnp.sum(gg_f, axis=0, keepdims=True)
    gg = gg_f.astype(cd)
    dw_ref[...] += jax.lax.dot_general(
        zg.T, gg, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dzg = jax.lax.dot_general(
        gg, w_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dz = dzg.reshape(rows, WC)   # nonzero only at base pixels (M's zeros)

    # propagate the pooled value and dz from each group's base pixel to the
    # whole group (bit-fill: after step i, lane j holds the value of lane
    # j - (j mod 2^(i+1)))
    jj = jax.lax.broadcasted_iota(jnp.int32, (rows, WC), 1) // C
    m = z
    for i2 in range(L):
        sh = C * (1 << i2)
        bit = (jj >> i2) & 1
        m = jnp.where(bit == 1, _roll(m, -sh), m)
        dz = jnp.where(bit == 1, _roll(dz, -sh), dz)

    # tie count per k x k window: row-sum the k sub-row masks, then an
    # intra-group hypercube sum over pixels (each select keeps the in-group
    # partner, so roll wrap-around never leaks across groups)
    m_sup = jnp.concatenate([m] * k, axis=1)
    mask = (s == m_sup).astype(jnp.float32)
    cnt = mask[:, :WC]
    for j in range(1, k):
        cnt = cnt + mask[:, j * WC:(j + 1) * WC]
    for i2 in range(L):
        sh = C * (1 << i2)
        bit = (jj >> i2) & 1
        cnt = cnt + jnp.where(bit == 1, _roll(cnt, -sh), _roll(cnt, sh))

    dpix = dz / cnt
    dx = mask * jnp.concatenate([dpix] * k, axis=1)
    dx_ref[0] = dx.reshape(tile, WC).astype(dx_ref.dtype)


def _sel_kron(w, G, k, cd):
    """(C, cout) -> (G*C, (G/k)*cout) selection kron: output group-pixel b'
    applies w to input pixel b'*k and ignores the rest (zero blocks)."""
    C, cout = w.shape
    P = jnp.eye(G, dtype=jnp.float32)[:, ::k]      # (G, G/k)
    return jnp.einsum("ab,cd->acbd", P, w.astype(jnp.float32)).reshape(
        G * C, (G // k) * cout).astype(cd)


def _geom(spec, x):
    W, C, cout, k = spec
    N, H, L = x.shape
    assert L == W * C, (L, W, C)
    G = _group(C, cout, k)
    cd = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    tile = _plan_tile(H, W, C, cout, k, x.dtype.itemsize)
    if tile is None:
        raise ValueError(f"no pool_conv tile plan for H={H} W={W} C={C} "
                         f"cout={cout} k={k}; guard with available()")
    return N, H, G, cd, tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def pool_conv(spec, interpret, x, w, bias):
    """maxpool_k(x) @ W + bias on the dense view, layouts pinned.

    spec = (W, C, cout, k) static, W the INPUT width; x: (N, H, W*C) dense
    view; w: (C, cout) float32; bias: (cout,) float32. Returns
    (N, H/k, (W/k)*cout) in x.dtype.
    """
    W, C, cout, k = spec
    interpret = interpret or bool(
        _os.environ.get("RESUNETA_DENSEMM_INTERPRET"))
    N, H, G, cd, tile = _geom(spec, x)
    wblk = _sel_kron(w, G, k, cd)
    bias_t = jnp.tile(bias.astype(jnp.float32), G // k).reshape(
        1, (G // k) * cout)
    kernel = functools.partial(_fwd_kernel, k=k, C=C, W=W, cout=cout,
                               tile=tile, G=G, cd=cd)
    T = H // tile
    rep = lambda shape: pl.BlockSpec(shape, lambda i, t: (0,) * len(shape))
    return pl.pallas_call(
        kernel,
        grid=(N, T),
        in_specs=[pl.BlockSpec((1, tile, W * C), lambda i, t: (i, t, 0)),
                  rep(wblk.shape), rep(bias_t.shape)],
        out_specs=pl.BlockSpec((1, tile // k, (W // k) * cout),
                               lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H // k, (W // k) * cout), x.dtype),
        interpret=interpret,
    )(x, wblk, bias_t)


def _pool_conv_fwd(spec, interpret, x, w, bias):
    return pool_conv(spec, interpret, x, w, bias), (x, w)


def _pool_conv_bwd(spec, interpret, res, g):
    x, w = res
    W, C, cout, k = spec
    interpret = interpret or bool(
        _os.environ.get("RESUNETA_DENSEMM_INTERPRET"))
    N, H, G, cd, tile = _geom(spec, x)
    wblk = _sel_kron(w, G, k, cd)
    kernel = functools.partial(_bwd_kernel, k=k, C=C, W=W, cout=cout,
                               tile=tile, G=G, cd=cd)
    T = H // tile
    rep = lambda shape: pl.BlockSpec(shape, lambda i, t: (0,) * len(shape))
    dx, dM, dvec = pl.pallas_call(
        kernel,
        grid=(N, T),
        in_specs=[pl.BlockSpec((1, tile, W * C), lambda i, t: (i, t, 0)),
                  pl.BlockSpec((1, tile // k, (W // k) * cout),
                               lambda i, t: (i, t, 0)),
                  rep(wblk.shape)],
        out_specs=(pl.BlockSpec((1, tile, W * C), lambda i, t: (i, t, 0)),
                   rep(wblk.shape), rep((1, (G // k) * cout))),
        out_shape=(jax.ShapeDtypeStruct((N, H, W * C), x.dtype),
                   jax.ShapeDtypeStruct(wblk.shape, jnp.float32),
                   jax.ShapeDtypeStruct((1, (G // k) * cout), jnp.float32)),
        interpret=interpret,
    )(x, g.astype(x.dtype), wblk)
    # fold: true dW = the (b = b'*k, c, b', j) blocks of the selection kron
    dw = jnp.einsum("acad->cd",
                    dM.reshape(G // k, k, C, G // k, cout)[:, 0]).astype(
                        w.dtype)
    dbias = dvec.reshape(G // k, cout).sum(0)
    return dx, dw, dbias


pool_conv.defvjp(_pool_conv_fwd, _pool_conv_bwd)
