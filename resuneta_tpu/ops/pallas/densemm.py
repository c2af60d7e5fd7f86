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

    y = sum_p  upsample_{k_p}( act_p?(x_p) ) @ kron(I_G, W_p)  + bias

over P dense input parts — which makes channel-concat -> 1x1 conv (Combine,
PSPPooling's final projection; reference ResUnet_a/model2.py:81-87, 41-79)
a SINGLE kernel with no concat ever materialized, fuses the reference's
relu(dec) into the Combine matmul, and (ups, round 4) folds the nearest x k
upsample of a part into the SAME matmul: the column expansion rides a
replication-kron weight kron(P_k, W) (k-fold FEWER flops than upsampling
first), the row expansion is a lane-space tile-repeat on the super-row
accumulator view — the materialized (N, Hp, k, Wp, k, C) broadcast/reshape
retiles that upsample costs in XLA (the profiled round-4 relayout tax at
UpSampleConv/PSP, BENCH_NOTES.md) never exist. The custom VJP backward is
again one kernel per call: all dx_p, all weight-gradient blocks, and the bias
gradient in a single pass over (x, g), with the block-diagonal tap gradients
folded to true (cin, cout) gradients on the host side (same trick as
convseg's wgrad); upsampled parts sum their k x k replica gradients as static
lane slices — exactly the VJP of nearest upsampling.

Group size G_p (per part): each matmul group covers G_p consecutive OUTPUT
pixels (G_p/k_p input pixels for an upsampled part); G_p is chosen so the
contraction (G_p/k_p * cin_p) and output (G_p * cout) widths are both 128-lane
aligned. The kron weights spend redundant FLOPs — by construction <= a few ms
of MXU time for these tiny 1x1 convs, bought back many times over by full
lane utilization and zero relayouts.
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
# NHWC; tile=8 at 6e6 gave 365.9) and plans 1024px at tile=8. Round 5 raises
# it to 12e6: the 512px PSP projection with the downgraded (1,2,2,2,1)
# upsample-fold set needs 11.57 MB at tile=16 (keeping all full-res PSP
# upsamples inside the matmul kernel instead of ~18 ms of materialized
# reshape retiles). The estimator tracks the BACKWARD working set below;
# actual scoped VMEM stays under the 16 MB/core limit at every plan this
# admits (compiler-verified on hardware).
_VMEM_BUDGET = int(_os.environ.get("RESUNETA_DENSEMM_VMEM_BUDGET", int(12e6)))


def _norm_spec(spec):
    """(W, cins, cout, acts[, ups]) -> (W, cins, cout, acts, ups)."""
    if len(spec) == 4:
        W, cins, cout, acts = spec
        return W, cins, cout, acts, (1,) * len(cins)
    return spec


def _group(cins, cout, ups=None):
    """Per-part output-pixel group sizes: smallest powers of two making the
    contraction width ((G_p/k_p)*cin_p) and the output width (G_p*cout) both
    >= 128 (for power-of-two channel counts that also means 128-aligned,
    which the Mosaic shape casts require — available() rejects the rest)."""
    ups = ups or (1,) * len(cins)
    out = []
    for c, k in zip(cins, ups):
        G = k
        while (G // k) * c < 128 or G * cout < 128:
            G *= 2
        out.append(G)
    return tuple(out)


def _plan_tile(H, W, cins, cout, itemsize, ups=None):
    """Largest row-tile height (<= 128, divides H) whose BACKWARD working set
    fits the VMEM budget (the backward is strictly larger than the forward:
    it adds dx blocks, f32 dw accumulators and the zT transposes)."""
    ups = ups or (1,) * len(cins)
    Gs = _group(cins, cout, ups)
    kbar = max(ups)
    lanes_out = W * cout
    tile = min(128, H)
    while tile >= 8 * kbar:
        if H % tile == 0 and tile % (8 * kbar) == 0:
            need = 0
            for c, k, G in zip(cins, ups, Gs):
                K = (G // k) * c
                Nout = G * cout
                Mg = (tile // k) * (W // k) * c // K
                need += 2 * 2 * (tile // k) * (W // k) * c * itemsize  # x+dx
                need += K * Nout * (itemsize + 4)        # w (cd) + dw (f32)
                need += Mg * K * 4                       # dxg / zT transient
            need += 2 * 2 * tile * lanes_out * itemsize  # g in + y out (dbuf)
            need += 2 * tile * lanes_out * 4             # acc + g_super f32
            if need <= _VMEM_BUDGET:
                return tile
        tile //= 2
    return None


def available(H, W, cins, cout, ups=None, *, interpret=False, itemsize=2):
    """Can dense_mm run on (N, H, W*cin) views with these channel counts (and
    optional per-part nearest-upsample factors, given in OUTPUT geometry
    H x W)? `itemsize` must match the operand dtype dense_mm will see (2 for
    the production bf16 path): the VMEM plan scales with it, and a gate probed
    at bf16 can admit an f32 spec that dense_mm then rejects at trace time
    (the CPU/f32 parity-test path)."""
    from . import convseg
    if convseg._DISABLED_DEPTH or _os.environ.get("RESUNETA_NO_PALLAS") or \
            _os.environ.get("RESUNETA_NO_PALLAS_DENSEMM"):
        return False
    interpret = interpret or bool(_os.environ.get("RESUNETA_DENSEMM_INTERPRET"))
    if not _PALLAS_OK or (not interpret and jax.default_backend() != "tpu"):
        return False
    ups = tuple(ups) if ups else (1,) * len(cins)
    # RESUNETA_DENSEMM_UPS=0: A/B lever for the folded-nearest-upsample tier
    # (Combine/PSP then materialize upsampled tensors and run plain parts)
    if any(k > 1 for k in ups) and \
            _os.environ.get("RESUNETA_DENSEMM_UPS") == "0":
        return False
    if any(k & (k - 1) or k < 1 for k in ups):
        return False
    if any(H % k or W % k for k in ups):
        return False
    Gs = _group(cins, cout, ups)
    for c, k, G in zip(cins, ups, Gs):
        if G > 128 or W % G != 0:
            return False
        if ((W // k) * c) % 128 != 0 or ((G // k) * c) % 128 != 0:
            return False
        if (G * cout) % 128 != 0:
            # every intermediate lane width must be 128-aligned — Mosaic
            # rejects ragged-lane shape casts ("infer-vector-layout:
            # unsupported shape cast"). cout in {8,16,32,64,128} passes; the
            # narrow head logits (5/3/1) fall back to the jnp kron path.
            return False
    if (W * cout) % 128 != 0:
        return False
    return _plan_tile(H, W, cins, cout, itemsize, ups) is not None


def _to_super(y, k, kbar, tile, Wc):
    """Part contribution (Mg_p, Nout_p) -> the common super-row accumulator
    form (tile/kbar, kbar*Wc), replicating each computed row k times (the
    vertical half of nearest-x-k upsampling) as static 128-aligned lane
    slices. All shape casts merge rows into lanes (row-major-preserving),
    the class this kernel already relies on."""
    if k == 1:
        return y.reshape(tile // kbar, kbar * Wc)
    y2 = y.reshape(tile // kbar, (kbar // k) * Wc)
    pieces = [y2[:, b * Wc:(b + 1) * Wc] for b in range(kbar // k)]
    return jnp.concatenate(
        [pieces[b] for b in range(kbar // k) for _ in range(k)], axis=1)


def _from_super(g_super, k, kbar, tile, Wc):
    """Inverse of _to_super for gradients: sum the k row-replica lane slices
    (the VJP of nearest upsampling) and return (tile/k, Wc)-worth of data in
    merged form (tile/kbar, (kbar/k)*Wc)."""
    if k == 1:
        return g_super
    pieces = []
    for b in range(kbar // k):
        s = g_super[:, (b * k) * Wc:(b * k + 1) * Wc]
        for r in range(1, k):
            s = s + g_super[:, (b * k + r) * Wc:(b * k + r + 1) * Wc]
        pieces.append(s)
    return pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces, axis=1)


def _fwd_kernel(*refs, P, acts, ups, Gs, cins, cout, tile, W, Mgs, cd):
    xs = refs[:P]
    ws = refs[P:2 * P]
    b_ref = refs[2 * P]
    o_ref = refs[2 * P + 1]
    kbar = max(ups)
    Wc = W * cout
    acc = None
    for p in range(P):
        k, G = ups[p], Gs[p]
        x = xs[p][0]
        if acts[p]:
            x = jnp.maximum(x, jnp.zeros((), x.dtype))
        xg = x.reshape(Mgs[p], (G // k) * cins[p]).astype(cd)
        y = jax.lax.dot_general(
            xg, ws[p][...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = _to_super(y, k, kbar, tile, Wc)
        acc = y if acc is None else acc + y
    bias = b_ref[...]
    if kbar > 1:
        bias = jnp.concatenate([bias] * kbar, axis=1)
    acc = acc + bias
    o_ref[0] = acc.reshape(tile, Wc).astype(o_ref.dtype)


def _bwd_kernel(*refs, P, acts, ups, Gs, cins, cout, tile, W, Mgs, cd):
    # inputs: x_0..x_{P-1}, g, w_0..w_{P-1}; outputs: dx_0.., dw_0.., dvec
    xs = refs[:P]
    g_ref = refs[P]
    ws = refs[P + 1:2 * P + 1]
    dxs = refs[2 * P + 1:3 * P + 1]
    dws = refs[3 * P + 1:4 * P + 1]
    dvec_ref = refs[4 * P + 1]
    kbar = max(ups)
    Wc = W * cout

    i = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when((i == 0) & (t == 0))
    def _init():
        for p in range(P):
            dws[p][...] = jnp.zeros_like(dws[p])
        dvec_ref[...] = jnp.zeros_like(dvec_ref)

    g_rows = g_ref[0].astype(jnp.float32)            # (tile, Wc)
    dvec_ref[...] += jnp.sum(g_rows, axis=0, keepdims=True)
    g_super = g_rows.reshape(tile // kbar, kbar * Wc) if kbar > 1 else g_rows
    for p in range(P):
        k, G = ups[p], Gs[p]
        Nout = G * cout
        gg = _from_super(g_super, k, kbar, tile, Wc).reshape(
            Mgs[p], Nout).astype(cd) if kbar > 1 else \
            g_super.reshape(Mgs[p], Nout).astype(cd)
        x = xs[p][0]
        z = jnp.maximum(x, jnp.zeros((), x.dtype)) if acts[p] else x
        zg = z.reshape(Mgs[p], (G // k) * cins[p]).astype(cd)
        # ONE explicit transpose so the weight-gradient tap contracts over
        # lanes as a native (K, Mg) @ (Mg, Nout) MXU matmul (same trick as
        # convseg's backward).
        dws[p][...] += jax.lax.dot_general(
            zg.T, gg, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dxg = jax.lax.dot_general(
            gg, ws[p][...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx = dxg.reshape(tile // k, (W // k) * cins[p])
        if acts[p]:
            # compare in f32: Mosaic rejects cmpf on packed bf16 vectors
            # ("Target does not support this comparison" on v5e)
            dx = jnp.where(x.astype(jnp.float32) > 0, dx, 0.0)
        dxs[p][0] = dx.astype(dxs[p].dtype)


def _kron(w, G, k, cd):
    """(cin, cout) -> ((G/k)*cin, G*cout) block kron: for k == 1 this is the
    block-diagonal kron(I_G, w); for an upsampled part it is kron(P, w) with
    P the (G/k, G) replication matrix P[a, b] = (b // k == a) — output pixel
    b of a group reads input pixel b // k, the horizontal half of nearest-x-k
    upsampling folded into the matmul (k-fold fewer FLOPs than upsampling
    first)."""
    cin, cout = w.shape
    if G == 1:
        return w.astype(cd)
    eye = jnp.eye(G // k, dtype=jnp.float32)
    P = jnp.repeat(eye, k, axis=1) if k > 1 else eye
    return jnp.einsum("ab,cd->acbd", P, w.astype(jnp.float32)).reshape(
        (G // k) * cin, G * cout).astype(cd)


def _geom(spec, xs):
    W, cins, cout, acts, ups = _norm_spec(spec)
    N = xs[0].shape[0]
    H = xs[0].shape[1] * ups[0]
    Gs = _group(cins, cout, ups)
    cd = jnp.bfloat16 if xs[0].dtype == jnp.bfloat16 else jnp.float32
    tile = _plan_tile(H, W, cins, cout, xs[0].dtype.itemsize, ups)
    if tile is None:
        raise ValueError(f"no dense_mm tile plan for H={H} W={W} cins={cins} "
                         "cout={cout}; guard with densemm.available()")
    Mgs = tuple((tile // k) * (W // k) * c // ((G // k) * c)
                for c, k, G in zip(cins, ups, Gs))
    return N, H, Gs, cd, tile, Mgs, ups


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def dense_mm(spec, interpret, xs, ws, bias):
    """y = sum_p ups_p(act_p?(xs[p])) @ kron(I_G, ws[p]) + bias, layouts pinned.

    spec = (W, cins, cout, acts[, ups]) static, in OUTPUT geometry; xs: tuple
    of (N, H/ups_p, (W/ups_p)*cin_p) dense views (uniform dtype); ws: tuple of
    (cin_p, cout) float32 kernels; bias: (cout,) float32. Returns
    (N, H, W*cout) in xs[0].dtype.
    """
    W, cins, cout, acts, ups = _norm_spec(spec)
    interpret = interpret or bool(_os.environ.get("RESUNETA_DENSEMM_INTERPRET"))
    N, H, Gs, cd, tile, Mgs, ups = _geom(spec, xs)
    P = len(xs)
    lanes_out = W * cout

    wblks = [_kron(w, G, k, cd) for w, G, k in zip(ws, Gs, ups)]
    bias_t = jnp.tile(bias.astype(jnp.float32), W).reshape(1, lanes_out)

    kernel = functools.partial(_fwd_kernel, P=P, acts=acts, ups=ups, Gs=Gs,
                               cins=cins, cout=cout, tile=tile, W=W, Mgs=Mgs,
                               cd=cd)
    T = H // tile
    rep = lambda shape: pl.BlockSpec(shape, lambda i, t: (0,) * len(shape))
    xspec = lambda c, k: pl.BlockSpec((1, tile // k, (W // k) * c),
                                      lambda i, t: (i, t, 0))
    return pl.pallas_call(
        kernel,
        grid=(N, T),
        in_specs=[xspec(c, k) for c, k in zip(cins, ups)]
        + [rep(wblks[p].shape) for p in range(P)]
        + [rep((1, lanes_out))],
        out_specs=pl.BlockSpec((1, tile, lanes_out), lambda i, t: (i, t, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, lanes_out), xs[0].dtype),
        interpret=interpret,
    )(*xs, *wblks, bias_t)


def _dense_mm_fwd(spec, interpret, xs, ws, bias):
    y = dense_mm(spec, interpret, xs, ws, bias)
    return y, (xs, ws)


def _dense_mm_bwd(spec, interpret, res, g):
    xs, ws = res
    W, cins, cout, acts, ups = _norm_spec(spec)
    interpret = interpret or bool(_os.environ.get("RESUNETA_DENSEMM_INTERPRET"))
    N, H, Gs, cd, tile, Mgs, ups = _geom(spec, xs)
    P = len(xs)
    lanes_out = W * cout

    wblks = [_kron(w, G, k, cd) for w, G, k in zip(ws, Gs, ups)]

    kernel = functools.partial(_bwd_kernel, P=P, acts=acts, ups=ups, Gs=Gs,
                               cins=cins, cout=cout, tile=tile, W=W, Mgs=Mgs,
                               cd=cd)
    T = H // tile
    rep = lambda shape: pl.BlockSpec(shape, lambda i, t: (0,) * len(shape))
    xspec = lambda c, k: pl.BlockSpec((1, tile // k, (W // k) * c),
                                      lambda i, t: (i, t, 0))
    outs = pl.pallas_call(
        kernel,
        grid=(N, T),
        in_specs=[xspec(c, k) for c, k in zip(cins, ups)]
        + [pl.BlockSpec((1, tile, lanes_out), lambda i, t: (i, t, 0))]
        + [rep(wblks[p].shape) for p in range(P)],
        out_specs=tuple(
            [xspec(c, k) for c, k in zip(cins, ups)]
            + [rep(wblks[p].shape) for p in range(P)]
            + [rep((1, lanes_out))]),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((N, H // k, (W // k) * c), xs[0].dtype)
             for c, k in zip(cins, ups)]
            + [jax.ShapeDtypeStruct(wblks[p].shape, jnp.float32)
               for p in range(P)]
            + [jax.ShapeDtypeStruct((1, lanes_out), jnp.float32)]),
        interpret=interpret,
    )(*xs, g.astype(xs[0].dtype), *wblks)

    dxs = tuple(outs[:P])
    dwblks = outs[P:2 * P]
    dvec = outs[2 * P]
    # fold the block weight gradients: true dW = sum of the (a, b) blocks the
    # kron placed w at — the G diagonal blocks of the (G, cin, G, cout) view
    # for k == 1, the (a, b: b//k == a) blocks of (G/k, cin, G/k, k, cout)
    # for an upsampled part
    dws = []
    for p in range(P):
        G, k, c = Gs[p], ups[p], cins[p]
        if k == 1:
            dw = jnp.einsum("acad->cd",
                            dwblks[p].reshape(G, c, G, cout))
        else:
            dw = jnp.einsum("acakd->cd",
                            dwblks[p].reshape(G // k, c, G // k, k, cout))
        dws.append(dw.astype(ws[p].dtype))
    dbias = dvec.reshape(W, cout).sum(0)
    return tuple(dxs), tuple(dws), dbias


dense_mm.defvjp(_dense_mm_fwd, _dense_mm_bwd)
