"""Pallas TPU kernel: layout-pinned 1x1 convolutions on dense (N, H, W*C) views.

The dense decoder tail (models/resuneta.py _dense_tail) runs every 1x1
convolution as a block-diagonal kron matmul (ops/dense.py conv1x1). Expressed
as plain jnp dot_general, the matmuls are CORRECT but XLA's layout assignment
is free to place the (M, 128) dot outputs column-major ({0,1}) and then
physically transpose them back for the row-major consumers — profiled at
+38 ms/step of relayout-reshapes at 256px, which is what made the first dense
tail net-negative (BENCH_NOTES.md round 3). Pallas calls pin default row-major
layouts on every operand and result, so running the same matmuls as kernels
removes XLA's freedom to relayout: dense-view producers/consumers chain with
zero copies.

One kernel evaluates the general fused form used by the tail's glue

    y = sum_p  act_p?(x_p) @ kron(I_G, W_p)  + bias

over P dense input parts — which makes channel-concat -> 1x1 conv (Combine,
PSPPooling's final projection; reference ResUnet_a/model2.py:81-87, 41-79)
a SINGLE kernel with no concat ever materialized, and fuses the reference's
relu(dec) into the Combine matmul. The custom VJP backward is again one
kernel per call: all dx_p, all weight-gradient blocks, and the bias gradient
in a single pass over (x, g), with the block-diagonal tap gradients folded to
true (cin, cout) gradients on the host side (same trick as convseg's wgrad).

Group size G: each matmul group packs G consecutive pixels; G is chosen so the
contraction (G*cin) and output (G*cout) widths both reach the 128-lane MXU
width. The kron weights spend G-fold redundant FLOPs — by construction <= a
few ms of MXU time for these tiny 1x1 convs, bought back many times over by
full-width lane utilization and zero relayouts.
"""

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu  # noqa: F401

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

import os as _os

# Default measured on v5e (BENCH_NOTES.md round 4): 11e6 plans tile=32 at the
# 256px levels (148.97 ms/step vs 149.94 at the old 5e6's tile=8) and — the
# real win — unlocks the dense trunk at 512px (tile=16: 359.9 ms/step vs 388.3
# NHWC; tile=8 at 6e6 gave 365.9) and plans 1024px at tile=8. The estimator
# tracks the BACKWARD working set below; actual scoped VMEM stays under the
# 16 MB/core limit at every plan this admits (compiler-verified on hardware).
_VMEM_BUDGET = int(_os.environ.get("RESUNETA_DENSEMM_VMEM_BUDGET", int(11e6)))


def _group(cins, cout):
    """Pixels per matmul group: smallest power of two making every
    contraction width (G*cin_p) and the output width (G*cout) >= 128."""
    G = 1
    while any(G * c < 128 for c in cins) or G * cout < 128:
        G *= 2
    return G


def _plan_tile(H, W, cins, cout, itemsize):
    """Largest row-tile height (<= 128, divides H) whose BACKWARD working set
    fits the VMEM budget (the backward is strictly larger than the forward:
    it adds dx blocks, f32 dw accumulators and the zT transposes)."""
    G = _group(cins, cout)
    Nout = G * cout
    lanes_out = W * cout
    tile = min(128, H)
    while tile >= 8:
        if H % tile == 0:
            Mg = tile * W // G
            need = 0
            for c in cins:
                K = G * c
                need += 2 * 2 * tile * W * c * itemsize  # x in + dx out (dbuf)
                need += K * Nout * (itemsize + 4)        # w (cd) + dw (f32)
                need += Mg * K * 4                       # dxg / zT transient
            need += 2 * 2 * tile * lanes_out * itemsize  # g in + y out (dbuf)
            need += 2 * Mg * Nout * 4                    # acc + gg f32
            if need <= _VMEM_BUDGET:
                return tile
        tile //= 2
    return None


def available(H, W, cins, cout, *, interpret=False):
    """Can dense_mm run on (N, H, W*cin) views with these channel counts?"""
    from . import convseg
    if convseg._DISABLED_DEPTH or _os.environ.get("RESUNETA_NO_PALLAS") or \
            _os.environ.get("RESUNETA_NO_PALLAS_DENSEMM"):
        return False
    if not _PALLAS_OK or (not interpret and jax.default_backend() != "tpu"):
        return False
    G = _group(cins, cout)
    if G > 128 or W % G != 0:
        return False
    if any((W * c) % 128 != 0 for c in cins) or (W * cout) % 128 != 0:
        return False
    if (G * cout) % 128 != 0:
        # the kernel's (Mg, G*cout) dot output must be lane-aligned for the
        # final reshape to (tile, W*cout) — Mosaic rejects ragged-lane shape
        # casts ("infer-vector-layout: unsupported shape cast"). cout in
        # {8,16,32,64,128} passes; the narrow head logits (5/3/1) fall back.
        return False
    return _plan_tile(H, W, cins, cout, 2) is not None


def _fwd_kernel(*refs, P, acts, Ks, Nout, tile, lanes_out, Mg, cd):
    xs = refs[:P]
    ws = refs[P:2 * P]
    b_ref = refs[2 * P]
    o_ref = refs[2 * P + 1]
    acc = None
    for p in range(P):
        x = xs[p][0]
        if acts[p]:
            x = jnp.maximum(x, jnp.zeros((), x.dtype))
        xg = x.reshape(Mg, Ks[p]).astype(cd)
        y = jax.lax.dot_general(
            xg, ws[p][...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = y if acc is None else acc + y
    acc = acc + b_ref[...]
    o_ref[0] = acc.reshape(tile, lanes_out).astype(o_ref.dtype)


def _bwd_kernel(*refs, P, acts, Ks, Nout, tile, lanes_out, Mg, cd):
    # inputs: x_0..x_{P-1}, g, w_0..w_{P-1}; outputs: dx_0.., dw_0.., dvec
    xs = refs[:P]
    g_ref = refs[P]
    ws = refs[P + 1:2 * P + 1]
    dxs = refs[2 * P + 1:3 * P + 1]
    dws = refs[3 * P + 1:4 * P + 1]
    dvec_ref = refs[4 * P + 1]

    i = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((i == 0) & (t == 0))
    def _init():
        for p in range(P):
            dws[p][...] = jnp.zeros_like(dws[p])
        dvec_ref[...] = jnp.zeros_like(dvec_ref)

    gg_f = g_ref[0].reshape(Mg, Nout).astype(jnp.float32)
    dvec_ref[...] += jnp.sum(gg_f, axis=0, keepdims=True)
    gg = gg_f.astype(cd)
    for p in range(P):
        x = xs[p][0]
        z = jnp.maximum(x, jnp.zeros((), x.dtype)) if acts[p] else x
        zg = z.reshape(Mg, Ks[p]).astype(cd)
        # ONE explicit transpose so the weight-gradient tap contracts over
        # lanes as a native (K, Mg) @ (Mg, Nout) MXU matmul (same trick as
        # convseg's backward).
        dws[p][...] += jax.lax.dot_general(
            zg.T, gg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxg = jax.lax.dot_general(
            gg, ws[p][...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx = dxg.reshape(tile, x.shape[-1])
        if acts[p]:
            # compare in f32: Mosaic rejects cmpf on packed bf16 vectors
            # ("Target does not support this comparison" on v5e)
            dx = jnp.where(x.astype(jnp.float32) > 0, dx, 0.0)
        dxs[p][0] = dx.astype(dxs[p].dtype)


def _kron(w, G, cd):
    """(cin, cout) -> (G*cin, G*cout) block-diagonal kron(I_G, w)."""
    cin, cout = w.shape
    if G == 1:
        return w.astype(cd)
    eye = jnp.eye(G, dtype=jnp.float32)
    return jnp.einsum("ab,cd->acbd", eye, w.astype(jnp.float32)).reshape(
        G * cin, G * cout).astype(cd)


def _geom(spec, xs):
    W, cins, cout, acts = spec
    N, H, _ = xs[0].shape
    G = _group(cins, cout)
    cd = jnp.bfloat16 if xs[0].dtype == jnp.bfloat16 else jnp.float32
    tile = _plan_tile(H, W, cins, cout, xs[0].dtype.itemsize)
    if tile is None:
        raise ValueError(f"no dense_mm tile plan for H={H} W={W} cins={cins} "
                         "cout={cout}; guard with densemm.available()")
    return N, H, G, cd, tile


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def dense_mm(spec, interpret, xs, ws, bias):
    """y = sum_p act_p?(xs[p]) @ kron(I_G, ws[p]) + bias, layouts pinned.

    spec = (W, cins, cout, acts) static; xs: tuple of (N, H, W*cin_p) dense
    views (uniform dtype); ws: tuple of (cin_p, cout) float32 kernels; bias:
    (cout,) float32. Returns (N, H, W*cout) in xs[0].dtype.
    """
    W, cins, cout, acts = spec
    N, H, G, cd, tile = _geom(spec, xs)
    P = len(xs)
    Nout = G * cout
    lanes_out = W * cout
    Ks = tuple(G * c for c in cins)
    Mg = tile * W // G

    wblks = [_kron(w, G, cd) for w in ws]
    bias_t = jnp.tile(bias.astype(jnp.float32), G).reshape(1, Nout)

    kernel = functools.partial(_fwd_kernel, P=P, acts=acts, Ks=Ks, Nout=Nout,
                               tile=tile, lanes_out=lanes_out, Mg=Mg, cd=cd)
    T = H // tile
    rep = lambda shape: pl.BlockSpec(shape, lambda i, t: (0,) * len(shape))
    xspec = lambda c: pl.BlockSpec((1, tile, W * c), lambda i, t: (i, t, 0))
    return pl.pallas_call(
        kernel,
        grid=(N, T),
        in_specs=[xspec(c) for c in cins]
        + [rep((Ks[p], Nout)) for p in range(P)]
        + [rep((1, Nout))],
        out_specs=pl.BlockSpec((1, tile, lanes_out), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, lanes_out), xs[0].dtype),
        interpret=interpret,
    )(*xs, *wblks, bias_t)


def _dense_mm_fwd(spec, interpret, xs, ws, bias):
    y = dense_mm(spec, interpret, xs, ws, bias)
    return y, (xs, ws)


def _dense_mm_bwd(spec, interpret, res, g):
    xs, ws = res
    W, cins, cout, acts = spec
    N, H, G, cd, tile = _geom(spec, xs)
    P = len(xs)
    Nout = G * cout
    lanes_out = W * cout
    Ks = tuple(G * c for c in cins)
    Mg = tile * W // G

    wblks = [_kron(w, G, cd) for w in ws]

    kernel = functools.partial(_bwd_kernel, P=P, acts=acts, Ks=Ks, Nout=Nout,
                               tile=tile, lanes_out=lanes_out, Mg=Mg, cd=cd)
    T = H // tile
    rep = lambda shape: pl.BlockSpec(shape, lambda i, t: (0,) * len(shape))
    xspec = lambda c: pl.BlockSpec((1, tile, W * c), lambda i, t: (i, t, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(N, T),
        in_specs=[xspec(c) for c in cins]
        + [pl.BlockSpec((1, tile, lanes_out), lambda i, t: (i, t, 0))]
        + [rep((Ks[p], Nout)) for p in range(P)],
        out_specs=tuple(
            [pl.BlockSpec((1, tile, W * c), lambda i, t: (i, t, 0))
             for c in cins]
            + [rep((Ks[p], Nout)) for p in range(P)]
            + [rep((1, Nout))]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((N, H, W * c), xs[0].dtype) for c in cins]
            + [jax.ShapeDtypeStruct((Ks[p], Nout), jnp.float32)
               for p in range(P)]
            + [jax.ShapeDtypeStruct((1, Nout), jnp.float32)]),
        interpret=interpret,
    )(*xs, g.astype(xs[0].dtype), *wblks)

    dxs = tuple(outs[:P])
    dwblks = outs[P:2 * P]
    dvec = outs[2 * P]
    # fold the block-diagonal weight gradients: true dW = sum of the G
    # diagonal (cin, cout) blocks of the (G, cin, G, cout) view
    dws = tuple(
        jnp.einsum("acad->cd", dwblks[p].reshape(G, cins[p], G, cout)).astype(
            ws[p].dtype)
        for p in range(P))
    dbias = dvec.reshape(G, cout).sum(0)
    return dxs, dws, dbias


dense_mm.defvjp(_dense_mm_fwd, _dense_mm_bwd)
