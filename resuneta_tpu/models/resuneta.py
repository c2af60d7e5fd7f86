"""ResUnet-a d6 multitask model — Flax, NHWC, TPU-first.

Topology is a faithful re-derivation of the reference Keras graph
(ResUnet_a/model2.py:14-193, surveyed in SURVEY.md §3.5):

  stem 1x1 conv 32
  encoder: ResBlock(32,[1,3,15,31]) -> s2 1x1 64  -> RB(64,[1,3,15,31])
           -> s2 128 -> RB(128,[1,3,15]) -> s2 256 -> RB(256,[1,3,15])
           -> s2 512 -> RB(512,[1])      -> s2 1024 -> RB(1024,[1])   (H/32)
  mid:     PSPPooling(1024) + ReLU
  decoder: 5 x { nearest-up x2 + 1x1 conv + BN -> combine(skip) -> ResBlock }
           with up-filters 256,128,64,32,16 and RB filters 512,256,128,64,32
  final:   combine(stem) -> PSPPooling(32) -> ReLU -> 4 heads
           seg   : 3x3 relu conv 32 x2 -> 1x1 num_classes -> softmax   (from x_psp)
           bound : 3x3 relu conv 32    -> 1x1 num_classes -> sigmoid   (from x_psp)
           dist  : 3x3 relu conv 32 x2 -> 1x1 num_classes -> softmax   (from x_comb, pre-PSP)
           color : 1x1 conv 3 -> sigmoid                               (from x_comb)

Each ResBlock branch is pre-activation BN->ReLU->Conv(d)->BN->ReLU->Conv(d) and the
block output is identity + SUM of all dilation branches (model2.py:27-31) — sum, not
concat. PSP pool levels are gated on the BUILD-TIME input width (model2.py:49-52):
width >= 256 -> pools {1,2,4,8}; >=128 -> {1,2,4}; else {1,2}.

Keras-parity choices: glorot-uniform conv init, zero bias, BatchNorm(momentum=0.99,
eps=1e-3). Compute dtype is configurable (bfloat16 recommended on TPU); params and
BN statistics stay float32.
"""

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..ops.fused_bn import bn_stats
from .norm import BatchNorm

Dtype = Any

_conv_init = nn.initializers.glorot_uniform()


def _save(x):
    """Tag a tensor as a rematerialization boundary. Under the train step's
    remat policy (train/steps.py SAVE_CONVS), only tagged tensors (conv/pool
    outputs and BN statistics) are kept for the backward pass; every
    elementwise segment between them (BN apply, ReLU, residual adds, masks) is
    recomputed fused into its consumer instead of being written to and re-read
    from HBM — a pure win on a bandwidth-bound chip. A no-op outside remat."""
    return checkpoint_name(x, "save")


class Conv(nn.Module):
    """nn.Conv-compatible convolution (same parameter names/shapes/init, same
    Flax auto-naming, so checkpoints and the Keras importer are unaffected)
    with fusion hooks for the eval path:

    * prologue=(a, b): the preceding BatchNorm's affine — the whole
      act(x*a+b) -> dilated-conv segment runs as one Pallas kernel
      (ops/pallas/convseg.py) instead of materializing the activation;
    * epilogue=(a, b): a FOLLOWING BatchNorm's affine (the reference's Conv2DN
      pattern, model2.py:36-39) folded algebraically into the weights —
      conv(x) * a + b == x @ (W * a) + (bias * a + b) — so eval-mode
      conv->BN costs zero extra passes;
    * bn_raw: training-mode statistics for the custom-VJP fused segment."""
    features: int
    kernel_size: tuple = (3, 3)
    kernel_dilation: int = 1
    strides: tuple = (1, 1)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, prologue=None, bn_raw=None, epilogue=None,
                 act: bool = True, dense_width: int = None,
                 dense_parts=None, act_in: bool = False,
                 dense_pool: int = None):
        # dense_width set => x is the dense (N, H, W*C) view (ResBlockA's
        # fast path, the dense decoder tail); the op runs in the lane-packed
        # layout and the result stays dense. dense_parts=[(xd, cin[, act]), ..]
        # is a channel-concat input — the 1x1 conv runs as a sum of kron
        # matmuls and the concat never materializes (ops/dense.py); act=True
        # fuses a ReLU on that part's input. dense_pool=k prepends a k x k
        # max pool fused into the same kernel (PSP levels; dense_width is the
        # POOLED width, x arrives at full resolution).
        if dense_parts is not None:
            C = sum(p[1] for p in dense_parts)
        elif dense_width is not None:
            C = x.shape[-1] // (dense_width * (dense_pool or 1))
        else:
            C = x.shape[-1]
        kernel = self.param("kernel", _conv_init,
                            self.kernel_size + (C, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        d = self.kernel_dilation

        if dense_parts is not None:
            from ..ops import dense as dops
            assert self.kernel_size == (1, 1) and self.strides == (1, 1)
            return dops.concat_conv1x1(dense_parts, kernel, bias,
                                       cout=self.features, dtype=self.dtype)

        if dense_width is not None:
            if self.kernel_size == (1, 1):
                from ..ops import dense as dops
                if dense_pool and dense_pool > 1:
                    # fused max-pool -> 1x1 conv (PSP levels)
                    assert self.strides == (1, 1)
                    return dops.pool_conv1x1(
                        x, kernel, bias, cin=C, cout=self.features,
                        k=dense_pool, dtype=self.dtype)
                if self.strides == (2, 2):
                    # encoder downsample conv on the dense view — the even-row
                    # selection is a free reshape, the even-column selection
                    # folds into the matmul (ops/dense.downsample2_conv1x1)
                    return dops.downsample2_conv1x1(
                        x, kernel, bias, cin=C, cout=self.features,
                        dtype=self.dtype)
                assert self.strides == (1, 1)
                return dops.conv1x1(x, kernel, bias, cin=C,
                                    cout=self.features, dtype=self.dtype,
                                    act_in=act_in)
            from ..ops.pallas import convseg
            if bn_raw is None:
                # identity affine: the fused segment computes act?(x)->conv3x3
                # (head convs in the dense tail; gamma=1, var=1-eps =>
                # a = rsqrt(1) = 1 exactly at eps=1e-3)
                ones = jnp.ones((C,), jnp.float32)
                zeros = jnp.zeros((C,), jnp.float32)
                bn_raw = (ones, zeros, zeros, ones - 1e-3)
            scale, offset, mean, var = bn_raw
            return convseg.fused_segment_dense(
                dense_width, d, 1e-3, act, False, x, scale, offset, mean, var,
                kernel, bias)

        if bn_raw is not None and self.kernel_size == (3, 3):
            # training path: (scale, bias, mean, var) from BatchNorm — run the
            # whole BN->ReLU->conv segment through the custom-VJP fused kernel
            # (one forward pass; one backward kernel emitting dx + weight-grad
            # taps + BN sums with the activation recomputed only in VMEM).
            # Mode "2": XLA forward + Pallas one-pass backward (hybrid).
            import os
            from ..ops.pallas import convseg
            scale, offset, mean, var = bn_raw
            if convseg.pallas_available(x.shape[1], x.shape[2], C,
                                        self.features, d):
                seg = convseg.fused_segment_bwdonly \
                    if os.environ.get("RESUNETA_FUSED_TRAIN_SEGMENT") == "2" \
                    else convseg.fused_segment
                return seg(d, 1e-3, act, False, x, scale,
                           offset, mean, var, kernel, bias)
            from ..ops.fused_bn import batch_norm_act
            x = batch_norm_act(x, scale, offset, mean, var, eps=1e-3,
                               relu=act)

        if prologue is not None and self.kernel_size == (3, 3):
            from ..ops.pallas import convseg
            a, b = prologue
            # bwd=False: the eval path needs no backward kernel, which
            # additionally enables the C % 128 == 0 blocks (RB(256) at 32x32)
            if convseg.pallas_available(x.shape[1], x.shape[2], C,
                                        self.features, d, bwd=False):
                return convseg.bn_act_conv_pallas(
                    x, a, b, kernel, bias, dilation=d, act=act)
            x = x * a.astype(x.dtype) + b.astype(x.dtype)
            if act:
                x = nn.relu(x)

        if epilogue is not None:
            # fold the following BN's affine into the weights (tiny per-channel
            # algebra on the kernel; conv output needs no extra pass)
            a, b = epilogue
            kernel = kernel * a
            bias = bias * a + b

        # match nn.Conv's dtype semantics: compute-dtype conv output (f32
        # accumulation stays internal to the MXU), compute-dtype bias add —
        # a float32 preferred_element_type here would double the write traffic
        # of every branch conv
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype), self.strides,
            "SAME", rhs_dilation=(d, d), dimension_numbers=dn)
        y = y + bias.astype(self.dtype)
        if epilogue is not None and act:
            y = nn.relu(y)
        return y


class ConvBN(nn.Module):
    """Conv2DN of the reference: conv (default 1x1) followed by BatchNorm.
    In eval mode the BN affine (from running statistics) folds into the conv
    weights — zero extra passes (Conv epilogue)."""
    features: int
    kernel: tuple = (1, 1)
    strides: tuple = (1, 1)
    dtype: Dtype = jnp.float32
    act: bool = False  # fuse the caller's following ReLU into the BN apply

    @nn.compact
    def __call__(self, x, train: bool = False, dense_width: int = None,
                 dense_parts=None, dense_pool: int = None):
        conv = Conv(self.features, self.kernel, kernel_dilation=1,
                    strides=self.strides, dtype=self.dtype)
        bn = BatchNorm(momentum=0.99, epsilon=1e-3, dtype=self.dtype,
                       act=self.act)
        if dense_width is not None or dense_parts is not None:
            # lane-packed path (train-mode dense tail): 1x1 conv as kron
            # matmul (concat-free when dense_parts, pool-fused when
            # dense_pool), BN stats + apply dense
            assert train, "dense ConvBN is a training-path optimization"
            y = _save(conv(x, dense_width=dense_width,
                           dense_parts=dense_parts, dense_pool=dense_pool))
            return bn(y, train, features=self.features)
        if train:
            return bn(_save(conv(x)), train)
        # shape surrogate: the affine only needs the BN's (features,)-sized
        # variables, and the conv output itself must not be materialized first
        probe = jnp.zeros((1, self.features), self.dtype)
        return conv(x, epilogue=bn(probe, False, return_affine=True),
                    act=self.act)


class ResBlockA(nn.Module):
    """Multi-dilation residual block: identity + sum of pre-activation branches
    (model2.py:17-31). Every branch's first BN normalizes the SAME block input,
    so its batch statistics are computed once and shared across branches; the
    BN->ReLU pairs run on the fused apply path (ops/fused_bn.py)."""
    features: int
    dilation_rates: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, dense_width: int = None):
        import os
        fused_mode = os.environ.get("RESUNETA_FUSED_TRAIN_SEGMENT", "1")

        if dense_width is not None:
            # caller keeps the trunk on the dense view (ResUnetA dense trunk):
            # x is (N, H, W*C) in, (N, H, W*C) out — no boundary relayouts at
            # all; unplannable branches still fall back per-branch inside
            assert train, "dense ResBlockA is a training-path optimization"
            return self._dense_train(x, dense_width)

        if train and fused_mode == "1":
            from ..ops.pallas import convseg
            N, H, Wd, C = x.shape
            # ANY plannable branch justifies the dense view (a branch without
            # a VMEM tile plan falls back to NHWC XLA inside _dense_train,
            # paying one relayout; with the single-buffered planner tier all
            # model-family branches up to lanes=16384 now plan)
            if C == self.features and any(
                    convseg.pallas_available(H, Wd, C, self.features, d)
                    for d in self.dilation_rates):
                return self._dense_train(x.reshape(N, H, Wd * C),
                                         Wd).reshape(N, H, Wd, C)

        return self._generic(x, train, fused_mode)

    def _dense_train(self, xd, Wd):
        """Whole-block dense fast path on the (N, H, W*C) view. Every segment
        runs the dense fused kernel, the residual adds and BN statistics run
        on fully lane-packed views, and none of the C < 128 lane-padded
        intermediate layouts (25% lane utilization and 4x physical HBM bytes
        at C=32 — the profiled shallow-level layout tax, BENCH_NOTES.md) ever
        exists between segments. Under the dense trunk the view flows in and
        out without any boundary relayout; the NHWC auto-path pays one
        relayout in, one out."""
        from ..ops.fused_bn import bn_stats_dense
        from ..ops.pallas import convseg

        N, H, L = xd.shape
        C = L // Wd
        shared = bn_stats_dense(xd, C)
        out = xd
        for d in self.dilation_rates:
            bn1 = BatchNorm(momentum=0.99, epsilon=1e-3, dtype=self.dtype,
                            act=True)
            conv1 = Conv(self.features, (3, 3), kernel_dilation=d,
                         dtype=self.dtype)
            bn2 = BatchNorm(momentum=0.99, epsilon=1e-3, dtype=self.dtype,
                            act=True)
            conv2 = Conv(self.features, (3, 3), kernel_dilation=d,
                         dtype=self.dtype)
            if not convseg.pallas_available(H, Wd, C, self.features, d):
                # no VMEM tile plan for this dilation (d=31 at lanes=16384):
                # run this branch on NHWC XLA, sharing the block statistics —
                # one relayout in/out of the dense view for this branch only
                xn = xd.reshape(N, H, Wd, C)
                raw1 = bn1(xn, True, stats=shared, return_raw=True)
                b = _save(conv1(xn, bn_raw=raw1))
                raw2 = bn2(b, True, return_raw=True)
                b = _save(conv2(b, bn_raw=raw2))
                out = out + b.reshape(N, H, Wd * C)
                continue
            raw1 = bn1(xd, True, stats=shared, return_raw=True, features=C)
            b = _save(conv1(xd, bn_raw=raw1, dense_width=Wd))
            raw2 = bn2(b, True, stats=bn_stats_dense(b, C), return_raw=True,
                       features=C)
            b = _save(conv2(b, bn_raw=raw2, dense_width=Wd))
            out = out + b
        return out

    def _generic(self, x, train, fused_mode):
        shared = bn_stats(x) if train else None
        out = x
        for d in self.dilation_rates:
            bn1 = BatchNorm(momentum=0.99, epsilon=1e-3, dtype=self.dtype,
                            act=True)
            conv1 = Conv(self.features, (3, 3), kernel_dilation=d,
                         dtype=self.dtype)
            bn2 = BatchNorm(momentum=0.99, epsilon=1e-3, dtype=self.dtype,
                            act=True)
            conv2 = Conv(self.features, (3, 3), kernel_dilation=d,
                         dtype=self.dtype)
            if train:
                if fused_mode in ("1", "2"):
                    # one-kernel fwd + one-kernel bwd per segment
                    # (convseg.fused_segment) — DEFAULT ON: the v2 kernels
                    # (double-buffered window DMA, single z-transpose so the
                    # weight-gradient taps are MXU-native matmuls) measure
                    # 80.2 vs 75.9 patches/s unfused on the v5e bench
                    # (BENCH_NOTES.md). RESUNETA_FUSED_TRAIN_SEGMENT=0 opts
                    # out; =2 selects the XLA-fwd/Pallas-bwd hybrid (measured
                    # slower, kept for A/B). Gradients are parity-tested
                    # against autodiff (tests/test_pallas_convseg.py).
                    b = _save(conv1(
                        x, bn_raw=bn1(x, train, stats=shared, return_raw=True)))
                    b = _save(conv2(b, bn_raw=bn2(b, train, return_raw=True)))
                else:
                    b = _save(conv1(bn1(x, train, stats=shared)))
                    b = _save(conv2(bn2(b, train)))
            else:
                # eval: BN is an affine of running stats — hand it to the conv
                # as a prologue so the whole segment can fuse into one kernel
                b = conv1(x, prologue=bn1(x, False, return_affine=True))
                b = conv2(b, prologue=bn2(b, False, return_affine=True))
            out = out + b
        return out


def _max_pool(x, k):
    return nn.max_pool(x, window_shape=(k, k), strides=(k, k))


def _upsample_nearest(x, k):
    if k == 1:
        return x
    B, H, W, C = x.shape
    x = jnp.repeat(x, k, axis=1)
    x = jnp.repeat(x, k, axis=2)
    return x


class PSPPooling(nn.Module):
    """Pyramid pooling (model2.py:41-79): max-pool at {1,2,4,8} (gated on build-time
    image width), nearest upsample back, 1x1 ConvBN at nfilter/4 each, concat with
    the input, and a final 1x1 ConvBN(nfilter)."""
    features: int
    img_width: int  # build-time INPUT image width (gates the pool levels)
    dtype: Dtype = jnp.float32
    act: bool = False  # fuse the caller's following ReLU into the final ConvBN

    @nn.compact
    def __call__(self, x, train: bool = False, dense_width: int = None):
        levels = [1, 2]
        if self.img_width >= 128:
            levels.append(4)
        if self.img_width >= 256:
            levels.append(8)
        quarter = self.features // 4
        if dense_width is not None:
            # lane-packed path: pool/upsample as free row-major reshapes +
            # fully-packed max/broadcast, the final concat -> 1x1 ConvBN as a
            # sum of kron matmuls (reference op order preserved:
            # pool -> upsample -> ConvBN -> concat -> ConvBN, model2.py:41-79)
            from ..ops import dense as dops
            from ..ops.pallas import densemm
            C = x.shape[-1] // dense_width
            parts = []
            for k in levels:
                # ConvBN BEFORE the upsample: nearest upsampling commutes with
                # a 1x1 conv exactly, and BN batch statistics over the
                # upsampled tensor equal those over the pooled one (every
                # pixel is repeated k^2 times, so mean and E[x^2] are
                # unchanged) — the reference order pool -> upsample -> ConvBN
                # (model2.py:54-60) is reproduced bit-for-bit-ish at k^2-fold
                # less conv/BN work and quarter-channel upsample traffic.
                # pool + conv fused into one Pallas kernel (dense_pool;
                # ops/pallas/poolconv.py) — the pooled tensor and its 6-D
                # reshape/broadcast retiles never materialize
                p = ConvBN(quarter, dtype=self.dtype)(
                    x, train, dense_width=dense_width // k,
                    dense_pool=k if k > 1 else None)
                parts.append([p, quarter, False, k])
            parts.append([x, C, False, 1])
            # fold the remaining upsamples into the final projection matmul
            # (densemm ups). VMEM scales with max(ups) — the super-row tile
            # keeps >= 8 rows per upsampled block — so when the full set has
            # no plan, DOWNGRADE the largest k's by 2x (materialize only a
            # k=2 nearest-upsample at the POOLED width, 1/k^2 of the
            # full-res traffic) until a plan exists. The former
            # materialize-to-full-res fallback put four full-resolution
            # 6-D reshape/broadcast retiles (and their reduce backwards) in
            # the step — ~18 ms of the 512px profile (BENCH_NOTES round 5);
            # the downgraded sets ((1,2,2,2,1) at both 256px and 512px)
            # keep every full-res upsample inside the Pallas matmul.
            Hd = x.shape[1]
            while max(p[3] for p in parts) > 1 and not densemm.available(
                    Hd, dense_width, tuple(p[1] for p in parts),
                    self.features, tuple(p[3] for p in parts),
                    itemsize=x.dtype.itemsize):
                kmax = max(p[3] for p in parts)
                for p in parts:
                    if p[3] == kmax:
                        p[0] = dops.upsample_nearest(
                            p[0], width=dense_width // kmax, channels=p[1],
                            k=2)
                        p[3] = kmax // 2
            return ConvBN(self.features, dtype=self.dtype, act=self.act)(
                None, train, dense_parts=[tuple(p) for p in parts])
        pooled = []
        for k in levels:
            p = _upsample_nearest(_save(_max_pool(x, k)), k)
            p = ConvBN(quarter, dtype=self.dtype)(p, train)
            pooled.append(p)
        x = jnp.concatenate(pooled + [x], axis=-1)
        return ConvBN(self.features, dtype=self.dtype, act=self.act)(x, train)


class Combine(nn.Module):
    """Decoder/skip fusion (model2.py:81-87): relu(dec) ++ skip -> 1x1 conv -> BN."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, dec, skip, train: bool = False,
                 dense_width: int = None, dense_channels=None,
                 dense_ups=None):
        if dense_width is not None:
            # lane-packed path: dec/skip are dense views; the concat feeding
            # the 1x1 conv becomes a sum of kron matmuls with the reference's
            # relu(dec) fused into dec's matmul (never materialized).
            # dense_ups=(2, 1): dec arrives PRE-upsample (UpSampleConv
            # deferred it) and the nearest x2 expansion folds into the same
            # matmul (ops/pallas/densemm.py ups)
            c_dec, c_skip = dense_channels
            u = dense_ups or (1, 1)
            return ConvBN(self.features, dtype=self.dtype)(
                None, train,
                dense_parts=[(dec, c_dec, True, u[0]),
                             (skip, c_skip, False, u[1])])
        x = jnp.concatenate([nn.relu(dec), skip], axis=-1)
        return ConvBN(self.features, dtype=self.dtype)(x, train)


class UpSampleConv(nn.Module):
    """Nearest x2 -> 1x1 conv -> BN (model2.py:89-94)."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False, dense_width: int = None,
                 defer_upsample: bool = False):
        conv_bn = ConvBN(self.features, dtype=self.dtype)
        if dense_width is not None:
            # lane-packed path, with the ConvBN applied BEFORE the upsample:
            # nearest upsampling commutes exactly with a 1x1 conv, and BN
            # batch statistics over the upsampled tensor equal those over the
            # small one (every pixel repeated 4x leaves mean and E[x^2]
            # unchanged) — the reference order up -> conv -> BN
            # (model2.py:89-94) reproduced at 4x less matmul/BN work and
            # features/channels-fold less upsample traffic (same commutation
            # the dense PSPPooling uses). defer_upsample hands the SMALL
            # tensor back so the consumer (Combine) folds the x2 expansion
            # into its own matmul — no upsampled tensor ever materializes.
            from ..ops import dense as dops
            y = conv_bn(x, train, dense_width=dense_width)
            if defer_upsample:
                return y
            return dops.upsample_nearest(y, width=dense_width,
                                         channels=self.features, k=2)
        return conv_bn(_upsample_nearest(x, 2), train)


class ResUnetA(nn.Module):
    """ResUnet-a d6 with optional multitask heads. Input NHWC, any channel count
    (3 for ISPRS RGB, 14 for Amazon two-year stacks).

    color_head=False drops the HSV color head — the Amazon multitask setup
    (amazon_py/main_mabel_resuneta.py:154-161 derives boundary/distance labels;
    a color/HSV target is undefined for 14-channel input, so that head is
    omitted rather than trained against garbage)."""
    num_classes: int
    img_size: int = 256          # build-time width for PSP level gating
    multitasking: bool = True
    color_head: bool = True
    dtype: Dtype = jnp.float32

    def _use_dense_trunk(self, train, H, W):
        """Gate for the whole-trunk dense path (see __call__). Training-only;
        geometry must keep every shallow level lane-aligned (W*C multiples of
        128 and densemm/convseg row tiles need H % 8 at W/4, hence W % 32);
        RESUNETA_DENSE_TRUNK=0 forces off (A/B lever), =1 forces on (CPU
        parity tests exercise the jnp fallbacks), default requires the
        layout-pinned Pallas matmuls (TPU) — the jnp fallback LOSES to NHWC
        (the relayout tax, BENCH_NOTES.md round 3)."""
        import os
        if not train:
            return False
        mode = os.environ.get("RESUNETA_DENSE_TRUNK")
        if mode == "0":
            return False
        if H != W or W % 32 or W < 64:
            return False
        if os.environ.get("RESUNETA_FUSED_TRAIN_SEGMENT", "1") != "1":
            return False
        if mode == "1":
            return True
        from ..ops.pallas import densemm
        return densemm.available(H, W, (32, 32), 32)

    @nn.compact
    def __call__(self, x, train: bool = False):
        import os
        from ..ops import dense as dops
        dt = self.dtype
        x = x.astype(dt)
        N, H0, W0 = x.shape[0], x.shape[1], x.shape[2]

        # Dense trunk (training): the C <= 128 levels — where NHWC lane
        # padding costs 128/C-fold physical HBM bytes — run END-TO-END on the
        # lane-packed (N, H, W*C) view: ResBlock interiors (already dense),
        # the stride-2 downsample convs, the decoder UpSampleConv/Combine
        # glue, and the tail. The deep levels (C >= 256 at H <= W/8) stay
        # NHWC, which is already lane-full there. This leaves exactly ONE
        # expensive boundary (stem output -> dense at full resolution) plus a
        # cheap pair at 32x32xC=256, vs a relayout in/out at every shallow
        # block previously (~20% of the 512px device step, BENCH_NOTES.md).
        dense = self._use_dense_trunk(train, H0, W0)

        c1 = x = _save(Conv(32, (1, 1), dtype=dt)(x))
        Wd = None
        if dense:
            x = dops.to_dense(x)  # the one full-res boundary relayout
            c1 = x
            Wd = W0
        c2 = x = ResBlockA(32, [1, 3, 15, 31], dtype=dt)(x, train,
                                                         dense_width=Wd)
        x = _save(Conv(64, (1, 1), strides=(2, 2), dtype=dt)(
            x, dense_width=Wd))
        if dense:
            Wd //= 2
        c3 = x = ResBlockA(64, [1, 3, 15, 31], dtype=dt)(x, train,
                                                         dense_width=Wd)
        x = _save(Conv(128, (1, 1), strides=(2, 2), dtype=dt)(
            x, dense_width=Wd))
        if dense:
            Wd //= 2
        c4 = x = ResBlockA(128, [1, 3, 15], dtype=dt)(x, train,
                                                      dense_width=Wd)
        x = _save(Conv(256, (1, 1), strides=(2, 2), dtype=dt)(
            x, dense_width=Wd))
        if dense:
            # exit the dense domain: C=256 fills the 128 lanes twice over in
            # NHWC, and the tensor is 64x smaller than at the stem
            Wd //= 2
            x = dops.to_nhwc(x, width=Wd, channels=256)
        c5 = x = ResBlockA(256, [1, 3, 15], dtype=dt)(x, train)
        x = _save(Conv(512, (1, 1), strides=(2, 2), dtype=dt)(x))
        c6 = x = ResBlockA(512, [1], dtype=dt)(x, train)
        x = _save(Conv(1024, (1, 1), strides=(2, 2), dtype=dt)(x))
        x = ResBlockA(1024, [1], dtype=dt)(x, train)

        x = PSPPooling(1024, self.img_size, dtype=dt, act=True)(x, train)

        # deep decoder (NHWC): (up-filters, combine/RB filters, dilations, skip)
        for up_f, f, dil, skip in (
            (256, 512, [1], c6),
            (128, 256, [1, 3, 15], c5),
        ):
            x = UpSampleConv(up_f, dtype=dt)(x, train)
            x = Combine(f, dtype=dt)(x, skip, train)
            x = ResBlockA(f, dil, dtype=dt)(x, train)

        # shallow decoder: re-enter the dense domain at 256 channels
        shallow = ((64, 128, [1, 3, 15], c4),
                   (32, 64, [1, 3, 15, 31], c3),
                   (16, 32, [1, 3, 15, 31], c2))
        if dense:
            from ..ops.pallas import densemm
            Wq = W0 // 8
            x = dops.to_dense(x)
            for up_f, f, dil, skip in shallow:
                # fold UpSampleConv's nearest x2 into Combine's matmul when
                # the planner admits the upsampled spec (densemm ups); the
                # upsampled decoder tensor then never materializes
                fold = densemm.available(Wq * 2, Wq * 2, (up_f, f), f, (2, 1),
                                         itemsize=x.dtype.itemsize)
                x = UpSampleConv(up_f, dtype=dt)(x, train, dense_width=Wq,
                                                 defer_upsample=fold)
                Wq *= 2
                x = Combine(f, dtype=dt)(x, skip, train, dense_width=Wq,
                                         dense_channels=(up_f, f),
                                         dense_ups=(2, 1) if fold else None)
                x = ResBlockA(f, dil, dtype=dt)(x, train, dense_width=Wq)
        else:
            for up_f, f, dil, skip in shallow:
                x = UpSampleConv(up_f, dtype=dt)(x, train)
                x = Combine(f, dtype=dt)(x, skip, train)
                x = ResBlockA(f, dil, dtype=dt)(x, train)

        if dense:
            # already lane-packed — straight into the dense tail (mode "0"
            # A/B lever drops back to NHWC)
            tail_mode = os.environ.get("RESUNETA_DENSE_TAIL", "2")
            if tail_mode in ("1", "2"):
                return self._dense_tail(x, c1, train, tail_mode, W0)
            x = x.reshape(N, H0, W0, 32)
            c1 = c1.reshape(N, H0, W0, 32)

        N, Hf, Wf, Cf = x.shape
        # Dense tail: everything from the final combine through PSP (and, in
        # mode "1", the heads too) runs on the lane-packed (N, H, W*C) view,
        # with every 1x1 conv a layout-pinned Pallas kron matmul
        # (ops/pallas/densemm.py). The first, jnp-only version of this path
        # measured net-negative (XLA relayouted the dot outputs, +38 ms —
        # BENCH_NOTES.md round 3); the Pallas matmuls pin the layouts.
        # Mode "2" exits the dense view after PSP and runs the NHWC heads —
        # the measured winner and DEFAULT where the Pallas matmuls are
        # available (93.6 -> 99.5 patches/s at 256px; mode "1"'s six extra
        # head segments still cost more than they save, 86.6 — BENCH_NOTES.md
        # round 3). "0" = generic NHWC path. Without the layout-pinned
        # kernels (CPU, GSPMD mesh traces) the jnp kron fallback LOSES to
        # NHWC (the +38 ms relayout tax), so the default gates on
        # densemm.available; an explicit env setting still forces the mode
        # (CPU parity tests). Module/param names are pinned identical to the
        # NHWC branch (explicit Conv_6..Conv_11), so the same checkpoint
        # serves all modes.
        tail_mode = os.environ.get("RESUNETA_DENSE_TAIL")
        if tail_mode is None:
            from ..ops.pallas import densemm
            tail_mode = "2" if densemm.available(Hf, Wf, (Cf, Cf), Cf) \
                else "0"
        if (train and Cf == 32 and (Wf * Cf) % 128 == 0
                and Hf % 8 == 0 and Wf % 8 == 0
                and tail_mode in ("1", "2")
                and os.environ.get("RESUNETA_FUSED_TRAIN_SEGMENT", "1") == "1"):
            return self._dense_tail(x.reshape(N, Hf, Wf * Cf),
                                    c1.reshape(N, Hf, Wf * 32), train,
                                    tail_mode, Wf)

        x_comb = Combine(32, dtype=dt)(x, c1, train)
        x_psp = PSPPooling(32, self.img_size, dtype=dt, act=True)(x_comb, train)
        return self._heads(x_comb, x_psp)

    def _heads(self, x_comb, x_psp):
        """The four NHWC task heads (model2.py:144-191). Submodule creation
        ORDER here fixes the Flax auto-names (Conv_6..Conv_11 after the six
        encoder convs) that the dense tail pins explicitly — keep in sync."""
        dt = self.dtype
        if not self.multitasking:
            logits = _save(nn.Conv(self.num_classes, (1, 1), dtype=dt,
                                   kernel_init=_conv_init)(x_psp))
            return nn.softmax(logits.astype(jnp.float32), axis=-1)

        # Segmentation head (from x_psp)
        s = nn.relu(_save(nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                                  kernel_init=_conv_init, name="seg1")(x_psp)))
        s = nn.relu(_save(nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                                  kernel_init=_conv_init, name="seg2")(s)))
        s = _save(nn.Conv(self.num_classes, (1, 1), dtype=dt,
                          kernel_init=_conv_init, name="seg3")(s))
        out_seg = nn.softmax(s.astype(jnp.float32), axis=-1)

        # Boundary head (from x_psp)
        b = nn.relu(_save(nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                                  kernel_init=_conv_init)(x_psp)))
        b = _save(nn.Conv(self.num_classes, (1, 1), dtype=dt,
                          kernel_init=_conv_init)(b))
        out_bound = nn.sigmoid(b.astype(jnp.float32))

        # Distance head (from x_comb — pre-PSP, per model2.py:174)
        d = nn.relu(_save(nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                                  kernel_init=_conv_init)(x_comb)))
        d = nn.relu(_save(nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                                  kernel_init=_conv_init)(d)))
        d = _save(nn.Conv(self.num_classes, (1, 1), dtype=dt,
                          kernel_init=_conv_init)(d))
        out_dist = nn.softmax(d.astype(jnp.float32), axis=-1)

        out = {"seg": out_seg, "bound": out_bound, "dist": out_dist}
        if self.color_head:
            # Color head (from x_comb)
            c = _save(nn.Conv(3, (1, 1), dtype=dt, kernel_init=_conv_init)(x_comb))
            out["color"] = nn.sigmoid(c.astype(jnp.float32))
        return out

    def _dense_tail(self, xd, c1d, train, mode, Wf):
        """Training-path tail on the lane-packed dense view (called from the
        compact __call__; same submodule order and pinned names as the NHWC
        branch, so the parameter tree is identical in both modes). mode "2"
        runs only combine+PSP dense and hands NHWC tensors to the standard
        heads (A/B lever for the head-segment cost). Inputs are dense
        (N, H, W*C) views — under the dense trunk they arrive that way."""
        from ..ops.pallas import convseg

        dt = self.dtype
        N, Hf, L = xd.shape
        Cf = L // Wf

        x_comb = Combine(32, dtype=dt)(xd, c1d, train, dense_width=Wf,
                                       dense_channels=(Cf, 32))
        x_psp = PSPPooling(32, self.img_size, dtype=dt, act=True)(
            x_comb, train, dense_width=Wf)

        if mode == "2":
            return self._heads(x_comb.reshape(N, Hf, Wf, 32),
                               x_psp.reshape(N, Hf, Wf, 32))

        def head3(xd_in, act_in, name=None):
            """3x3 conv-32 on the dense view; act_in fuses the preceding ReLU
            into the segment kernel (identity BN affine)."""
            conv = Conv(32, (3, 3), dtype=dt, name=name)
            if convseg.pallas_available(Hf, Wf, 32, 32, 1):
                return _save(conv(xd_in, act=act_in, dense_width=Wf))
            xn = xd_in.reshape(N, Hf, Wf, 32)
            if act_in:
                xn = nn.relu(xn)
            return _save(conv(xn)).reshape(N, Hf, Wf * 32)

        def head1(feats, xd_in, act_in, name=None):
            """(optional fused ReLU ->) 1x1 conv as a layout-pinned dense kron
            matmul; returns the NHWC raw logits for the f32 output
            activation. The narrow logit widths (5/3) have no 128-aligned
            dense plan — exit to NHWC and run the tiny conv there instead of
            the jnp kron fallback (whose relayouted dot outputs were most of
            mode 1's round-3 loss)."""
            from ..ops.pallas import densemm
            conv = Conv(feats, (1, 1), dtype=dt, name=name)
            if densemm.available(Hf, Wf, (32,), feats,
                                 itemsize=xd_in.dtype.itemsize):
                return _save(conv(xd_in, dense_width=Wf,
                                  act_in=act_in)).reshape(N, Hf, Wf, feats)
            xn = xd_in.reshape(N, Hf, Wf, 32)
            if act_in:
                xn = nn.relu(xn)
            return _save(conv(xn))

        if not self.multitasking:
            logits = head1(self.num_classes, x_psp, False, name="Conv_6")
            return nn.softmax(logits.astype(jnp.float32), axis=-1)

        # heads (reference op order; the inter-conv ReLUs ride the segments)
        s = head3(x_psp, False, name="seg1")
        s = head3(s, True, name="seg2")
        s = head1(self.num_classes, s, True, name="seg3")
        out_seg = nn.softmax(s.astype(jnp.float32), axis=-1)

        b = head3(x_psp, False, name="Conv_6")
        b = head1(self.num_classes, b, True, name="Conv_7")
        out_bound = nn.sigmoid(b.astype(jnp.float32))

        d = head3(x_comb, False, name="Conv_8")
        d = head3(d, True, name="Conv_9")
        d = head1(self.num_classes, d, True, name="Conv_10")
        out_dist = nn.softmax(d.astype(jnp.float32), axis=-1)

        out = {"seg": out_seg, "bound": out_bound, "dist": out_dist}
        if self.color_head:
            out["color"] = nn.sigmoid(
                head1(3, x_comb, False, name="Conv_11").astype(jnp.float32))
        return out
