"""Dense-layout (lane-packed) glue ops for the inter-block graph.

The ResBlock interiors already run on the dense (N, H, W*C) row-major view
(models/resuneta.py + ops/pallas/convseg.py): at C < 128 the NHWC layout XLA
picks puts C on the 128-wide lane dimension, so every elementwise / reduce /
1x1-matmul pass runs at C/128 lane utilization and 128/C-fold physical HBM
bytes. These helpers extend the dense region to the glue BETWEEN blocks —
1x1 convolutions (as block-diagonal kron matmuls, the convseg trick), channel
concat feeding a 1x1 conv (as a sum of matmuls — the concat vanishes), max
pooling / nearest upsampling / stride-2 downsampling (as free row-major
reshapes + elementwise) and BatchNorm application — so whole subgraphs
(decoder tail -> combine -> PSP -> heads) never materialize an NHWC tensor.

Everything here is plain jnp: XLA fuses these with neighbors; no Pallas needed
(the only op that needs halos — the 3x3 dilated conv — stays in convseg).

Reference parity: these compute exactly the reference graph's ops
(ResUnet_a/model2.py:33-94) in a different layout.
"""

import jax
import jax.numpy as jnp


def kron_block(kernel, cin, cout):
    """(1,1,cin,cout) or (cin,cout) kernel -> (128, g*cout) block-diagonal
    kron(I_g, W), g = 128//cin: one MXU matmul applies the 1x1 conv to g
    consecutive pixels of a dense row at full lane utilization."""
    w = kernel.reshape(cin, cout)
    g = 128 // cin
    if g == 1:
        return w
    eye = jnp.eye(g, dtype=w.dtype)
    return jnp.einsum("ab,cd->acbd", eye, w).reshape(128, g * cout)


def conv1x1(xd, kernel, bias, *, cin, cout, dtype, act_in=False):
    """1x1 conv on the dense view: (N, H, W*cin) -> (N, H, W*cout), with an
    optional input ReLU fused in (act_in).

    cin must divide 128 (the model family's shallow channels: 8/16/32/64/128)
    or be a multiple of 128 (deep levels / pixel-pair downsampling, which need
    no kron grouping); W*cin must be a multiple of 128. On TPU the op runs as
    a layout-pinned Pallas kernel (ops/pallas/densemm.py) — expressed as a
    plain dot_general, XLA's layout assignment places the (M, 128) dot outputs
    column-major and physically transposes them back, the relayout tax that
    made the first dense tail net-negative (BENCH_NOTES.md round 3)."""
    N, H, L = xd.shape
    assert L % cin == 0 and L % 128 == 0 and \
        (128 % cin == 0 or cin % 128 == 0), (L, cin)
    W = L // cin
    from .pallas import densemm
    if densemm.available(H, W, (cin,), cout,
                         itemsize=xd.dtype.itemsize):
        b = bias if bias is not None else jnp.zeros((cout,), jnp.float32)
        return densemm.dense_mm((W, (cin,), cout, (bool(act_in),)), False,
                                (xd,), (kernel.reshape(cin, cout),), b)
    if act_in:
        xd = jnp.maximum(xd, 0)
    if cin % 128 == 0:
        # contraction width already lane-aligned: plain flat matmul, no kron
        y = jax.lax.dot_general(
            xd.astype(dtype).reshape(N * H * W, cin),
            kernel.reshape(cin, cout).astype(dtype),
            dimension_numbers=(((1,), (0,)), ((), ())))
        y = y.reshape(N, H, W * cout)
        if bias is not None:
            y = y + jnp.tile(bias.astype(dtype), W)
        return y
    wblk = kron_block(kernel, cin, cout).astype(dtype)
    g = 128 // cin
    y = jax.lax.dot_general(
        xd.astype(dtype).reshape(N * H * L // 128, 128), wblk,
        dimension_numbers=(((1,), (0,)), ((), ())))
    y = y.reshape(N, H, (L // cin) * cout)
    if bias is not None:
        Wd = L // cin
        y = y + jnp.tile(bias.astype(dtype), Wd)
    return y


def downsample2_ok(H, W, cin, cout, force=False):
    """Geometry/plan gate for downsample2_conv1x1 (force skips the TPU plan
    check — CPU parity tests run the jnp fallback)."""
    if H % 2 or W % 2 or (W * cin) % 128 or ((W // 2) * cout) % 128:
        return False
    if force:
        return True
    from .pallas import densemm
    return densemm.available(H // 2, W, (2 * cin,), cout)


def downsample2_conv1x1(xd, kernel, bias, *, cin, cout, dtype):
    """Stride-2 1x1 convolution on the dense view: (N, H, W*cin) ->
    (N, H/2, (W/2)*cout) — the reference's encoder downsample convs
    (ResUnet_a/model2.py:103-111) without ever leaving the lane-packed layout.

    The even-ROW selection folds into a free row-major reshape
    (N, H, W*cin) -> (N, H/2, 2*W*cin): each double-row is [row 2r ++ row
    2r+1], and pixel pairs (2j, 2j+1) with j < W/2 land entirely in row 2r.
    The even-COLUMN selection folds into the matmul: contracting pixel PAIRS
    (cin' = 2*cin) against [[W],[0]] applies W to the even pixel and drops the
    odd one. Outputs for j >= W/2 (= row 2r+1) are computed and sliced off —
    2x redundant FLOPs on a tiny 1x1 matmul, the price of zero gathers and a
    fully lane-packed, layout-pinned op chain."""
    N, H, L = xd.shape
    W = L // cin
    x2 = xd.reshape(N, H // 2, 2 * L)
    w = kernel.reshape(cin, cout)
    w2 = jnp.concatenate([w, jnp.zeros_like(w)], axis=0)
    y = conv1x1(x2, w2, bias, cin=2 * cin, cout=cout, dtype=dtype)
    return y[:, :, :(W // 2) * cout]


def concat_conv1x1(parts, kernel, bias, *, cout, dtype):
    """1x1 conv over the channel-concat of dense views WITHOUT materializing
    the concat: conv1x1(concat([x1..xk], ch), W) == sum_i conv1x1(xi, W_i)
    where W_i is the matching input-channel slice of W.

    parts: list of (xd_i, cin_i[, act_i[, ups_i]]) — act_i=True fuses a ReLU
    on that part's input (the reference Combine's relu(dec),
    ResUnet_a/model2.py:81-87); ups_i > 1 hands the part PRE-upsample: the
    nearest-x-ups expansion folds into the matmul (kron(P, W) columns + a
    lane-space row repeat — ups-fold FEWER flops than upsampling first, and
    none of the broadcast/reshape retiles a materialized upsample costs);
    kernel: (1, 1, sum cin_i, cout). On TPU the whole sum runs as ONE
    layout-pinned Pallas kernel (ops/pallas/densemm.py)."""
    parts = [tuple(p) + (False, 1)[len(p) - 2:] for p in parts]
    w = kernel.reshape(-1, cout)
    cins = tuple(c for _, c, _, _ in parts)
    acts = tuple(bool(a) for _, _, a, _ in parts)
    ups = tuple(int(k) for _, _, _, k in parts)
    Wd = parts[0][0].shape[2] // parts[0][1] * ups[0]
    Hd = parts[0][0].shape[1] * ups[0]
    assert all(p[0].shape[1] * k == Hd and p[0].shape[2] // c * k == Wd
               for p, c, k in zip(parts, cins, ups)), \
        [(p[0].shape, c, k) for p, c, k in zip(parts, cins, ups)]
    from .pallas import densemm
    if densemm.available(Hd, Wd, cins, cout, ups,
                         itemsize=parts[0][0].dtype.itemsize):
        offs = [0]
        for c in cins:
            offs.append(offs[-1] + c)
        assert offs[-1] == w.shape[0], (offs, w.shape)
        b = bias if bias is not None else jnp.zeros((cout,), jnp.float32)
        return densemm.dense_mm(
            (Wd, cins, cout, acts, ups), False,
            tuple(xd for xd, _, _, _ in parts),
            tuple(w[offs[i]:offs[i + 1]] for i in range(len(parts))), b)
    off = 0
    acc = None
    for xd, cin, act, k in parts:
        if k > 1:
            xd = upsample_nearest(xd, width=Wd // k, channels=cin, k=k)
        y = conv1x1(xd, w[off:off + cin], None, cin=cin, cout=cout,
                    dtype=dtype, act_in=act)
        acc = y if acc is None else acc + y
        off += cin
    assert off == w.shape[0], (off, w.shape)
    if bias is not None:
        acc = acc + jnp.tile(bias.astype(dtype), Wd)
    return acc


def pool_conv1x1(xd, kernel, bias, *, cin, cout, k, dtype):
    """k x k max pool -> 1x1 conv on the dense view: (N, H, W*cin) ->
    (N, H/k, (W/k)*cout) — PSPPooling's level ops (ResUnet_a/model2.py:54-60)
    as ONE fused Pallas kernel (ops/pallas/poolconv.py): the pool never
    materializes, killing the full-resolution 6-D reshape/broadcast retiles
    XLA's pool fwd/bwd cost on the dense view (BENCH_NOTES.md round 4)."""
    N, H, L = xd.shape
    W = L // cin
    from .pallas import poolconv
    if k > 1 and poolconv.available(H, W, cin, cout, k):
        b = bias if bias is not None else jnp.zeros((cout,), jnp.float32)
        return poolconv.pool_conv((W, cin, cout, k), False, xd,
                                  kernel.reshape(cin, cout), b)
    from jax.ad_checkpoint import checkpoint_name
    p = xd if k == 1 else checkpoint_name(
        max_pool(xd, width=W, channels=cin, k=k), "save")
    return conv1x1(p, kernel, bias, cin=cin, cout=cout, dtype=dtype)


def max_pool(xd, *, width, channels, k):
    """k x k / stride-k max pool on the dense view: (N, H, W*C) ->
    (N, H/k, (W/k)*C). Row-major reshapes are free; the max runs fully
    lane-packed (vs select_and_scatter-backed NHWC pooling at C/128 lanes)."""
    if k == 1:
        return xd
    N, H, L = xd.shape
    x = xd.reshape(N, H // k, k, width // k, k, channels)
    return jnp.max(x, axis=(2, 4)).reshape(N, H // k, (width // k) * channels)


def upsample_nearest(xd, *, width, channels, k):
    """Nearest-neighbor x k on the dense view: (N, Hp, Wp*C) ->
    (N, Hp*k, Wp*k*C)."""
    if k == 1:
        return xd
    N, Hp, L = xd.shape
    x = xd.reshape(N, Hp, 1, width, 1, channels)
    x = jnp.broadcast_to(x, (N, Hp, k, width, k, channels))
    return x.reshape(N, Hp * k, width * k * channels)


def downsample2(xd, *, width, channels):
    """Stride-2 pixel subsampling (even rows/cols): (N, H, W*C) ->
    (N, H/2, (W/2)*C) — the spatial part of the reference's stride-2 1x1
    downsample convs (1x1 kernels see exactly the kept pixels)."""
    N, H, L = xd.shape
    x = xd[:, ::2].reshape(N, H // 2, width // 2, 2, channels)[:, :, :, 0]
    return x.reshape(N, H // 2, (width // 2) * channels)


def bn_apply(xd, *, channels, gamma, beta, mean, var, eps, relu=False):
    """BatchNorm affine application (+ optional fused ReLU) on the dense view."""
    invstd = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    a = gamma * invstd
    b = beta - mean * a
    Wd = xd.shape[2] // channels
    y = xd * jnp.tile(a.astype(xd.dtype), Wd) \
        + jnp.tile(b.astype(xd.dtype), Wd)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def to_dense(x):
    """(N, H, W, C) -> (N, H, W*C). A free reshape when x is already row-major;
    one relayout copy otherwise (the boundary cost the dense region amortizes)."""
    N, H, W, C = x.shape
    return x.reshape(N, H, W * C)


def to_nhwc(xd, *, width, channels):
    N, H, L = xd.shape
    return xd.reshape(N, H, width, channels)
