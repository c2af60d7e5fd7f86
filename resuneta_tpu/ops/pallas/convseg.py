"""Pallas TPU kernel: fused BN-affine -> ReLU -> dilated 3x3 conv (+bias).

The ResBlock branch segment (ResUnet_a/model2.py:17-24 BN->ReLU->Conv(d)) is
the reference's hot loop, and SURVEY.md §2.2 calls for exactly this fusion. XLA
cannot fuse elementwise producers into convolution ops, so the normalized
activation z = act(x*a + b) is otherwise materialized to HBM and re-read by the
conv — two whole feature-map passes per segment. This kernel computes

    y = conv_{3x3, dilation d, SAME}(act(x * a + b)) @ W + bias

in one pass with z living only in VMEM.

Layout strategy (the whole trick): C < 128 channels on the lane dimension pad
VMEM 128/C-fold, so the kernel works on DENSE (rows, W*C) views instead —
  * the (N, H, W, C) -> (N, H, W*C) reshape is free (row-major bitcast), and
    every VMEM buffer is fully lane-packed;
  * a column shift by kj pixels is a 32-bit lane rotate by kj*C lanes (f32);
  * the per-tap (M, C) x (C, C) matmul becomes (M*C/128-groups): each 128-lane
    group holds g = 128/C pixels, multiplied by a block-diagonal
    (128, 128) = diag(W_tap, ... g times ...) weight — g-fold redundant FLOPs
    on an MXU running at full width, instead of a C-wide matmul at C/128
    utilization.

Row tiling: each grid program DMAs a (tile + 2*d_up, W*C) row window from HBM
(d_up = dilation rounded up to sublane alignment; the caller pads zero rows so
windows never clamp), computes the 9 taps at static row offsets, and writes one
(tile, W*C) output block. Padded/outside rows and wrapped columns are masked to
zero — exactly the conv's SAME zero padding of z.

Used on the inference/eval path (models/resuneta.py ResBlockA) where BN is a
per-channel affine of the running statistics."""

import functools

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

MAX_CHANNELS = 128
# Wide channel ceilings for C % 128 == 0 blocks (RB(256)/RB(512) at deep
# resolutions, test_ISPRS.py:26-36 eval shapes): the per-tap matmul contracts
# a full (M, C) x (C, C) with no block-diagonal packing (lanes are already
# full). FWD covers the eval/inference prologue path — with bf16 tap storage
# (see _plan) C=512 fits a forward plan, so eval fuses RB(512) too; BWD_WIDE
# additionally runs the training backward with (C, C) dw accumulator blocks
# (the wide plan budgets the extra 9 x C^2 f32 accumulator VMEM — see
# _plan(bwd=True)). C=512 training self-rejects via that accumulator
# (9 x 512^2 x (2+4) B = 14.2 MB of taps alone).
MAX_CHANNELS_FWD = 512
MAX_CHANNELS_BWD_WIDE = 256
# estimator budget: hardware showed actual scoped-vmem ~2.3x this estimate
# (Mosaic temporaries + auto-double-buffered io blocks), so stay well under
# 16 MB. RESUNETA_CONVSEG_VMEM_BUDGET overrides (bytes) — a tuning knob for
# experiments; plans just over this line get the single-buffered tier below.
import os as _os

_VMEM_BUDGET = int(_os.environ.get("RESUNETA_CONVSEG_VMEM_BUDGET", int(7e6)))


def _dup(d):
    return (d + 7) // 8 * 8


def _win_pad(H, tile, d):
    """(window rows, source pad) for a row tile.

    pad == 0: window starts are clamped into the image and boundary programs
    realign the window in VMEM with a circular sublane roll. 16-bit buffers
    roll on the i32 sublane-pair view, and Mosaic's dynamic_rotate needs the
    rolled sublane count to stay 8-aligned, so the window is rounded up to a
    multiple of 16 rows (the extra rows are DMA'd but never read by taps;
    wrapped rows are masked by the consumers' image-row masks).

    pad > 0 (plane shorter than one window): fall back to a physically
    zero-padded source copy — no realign, no roll, no alignment constraint."""
    win = (tile + 2 * _dup(d) + 15) // 16 * 16
    if win <= H:
        return win, 0
    return tile + 2 * _dup(d), max(_dup(d), 8)


# nbuf=1 tier: plans whose double-buffered estimate sits just over the budget
# run with a SINGLE-buffered DMA window (the copy is exposed instead of
# overlapped with compute). Hardware-calibrated: the only such geometry in the
# model family is d=31 at lanes=16384 (est 7.67 MB), whose double-buffered
# backward measures 16.41 MB scoped VMEM against the 16.00 MB hardware limit —
# dropping one 2.62 MB window slot brings it under. The narrow ceiling keeps
# genuinely oversized plans (e.g. d=15 at lanes=32768, est 10.6 MB) unplanned.
# Derived from the effective budget so the RESUNETA_CONVSEG_VMEM_BUDGET knob
# shifts BOTH tiers (a raised double-buffer budget must not silently re-enable
# the known-failing 16.41 MB configuration through a stale single-tier line).
_VMEM_BUDGET_SINGLE = _VMEM_BUDGET + int(0.7e6)


def _plan(H, W, C, d, bwd=False):
    """(row-tile height, window buffer count, window rows, source pad) or
    None; the DMA window + f32 working slices must fit VMEM. A double-buffered
    plan at ANY tile height is preferred over the single-buffered tier
    (overlapped DMA beats tile size).

    Narrow tier (C <= 128): the original hardware-calibrated search,
    byte-identical plans to the round-4 formula. Wide tier (C > 128): the
    taps are STORED bf16 (both kernels cast them to bf16 at the matmul
    anyway, so f32 storage was pure VMEM waste — halves the 9*B*B tap
    buffer), the physically zero-padded window variant (win = tile + 2*dup,
    no 16-row alignment rounding, no in-VMEM realign) competes with the
    clamp+roll variant, and the single-buffer tier counts ONE window slot
    (what the kernel actually allocates). Together these admit every 512px
    C=256 @ H=64 d={1,3,15} geometry that round 4 left on the unfused XLA
    path (BENCH_NOTES round 5); bwd=True adds the wide dw accumulator
    blocks."""
    lanes = W * C
    B = max(C, 128)  # per-tap matmul block width (see MAX_CHANNELS_FWD)
    if B <= 128:
        for nbuf in (2, 1):
            budget = _VMEM_BUDGET if nbuf == 2 else _VMEM_BUDGET_SINGLE
            tile = 128
            while tile >= 8:
                win, pad = _win_pad(H, tile, d)
                need = (2 * win * lanes * 2  # double-buffered bf16 windows
                        + 3 * tile * lanes * 4  # f32 z + shifted copy + acc
                        + tile * lanes * 2     # output block
                        + 9 * B * B * 4)       # block-diagonal taps
                if H % tile == 0 and need <= budget:
                    return tile, nbuf, win, pad
                tile //= 2
        # Fallback tier (round 5): lanes past the calibrated search's reach
        # (1024px shallow levels, W*C = 32768) — ONE window slot (what the
        # nbuf=1 kernel actually allocates) and the physically zero-padded
        # window (tile + 2*dup rows, no 16-row alignment rounding). Only
        # reachable when the loop above found nothing, so every
        # hardware-calibrated plan at lanes <= 16384 is untouched; this is
        # what puts the 1024px d={1,3} segments (and with them the dense
        # trunk) on the fused path instead of unfused remat XLA
        # (BENCH_NOTES round 5: the 1024px profile was 43% elementwise
        # recompute + 27% relayouts with zero segment kernels). The tier's
        # own budget is hardware-calibrated TIGHTER than the single-buffer
        # line: the d=15 win=40 backward (est 6.88 MB) crashes the remote
        # Mosaic compile helper at lanes=32768 while the win=24 plans
        # (est 5.83 MB) compile and run — 6.4e6 admits exactly the verified
        # class; d>=15 branches take the mixed-dense NHWC fallback.
        dup = _dup(d)
        tile = 128
        while tile >= 8:
            win, pad = tile + 2 * dup, max(dup, 8)
            need = (win * lanes * 2
                    + 3 * tile * lanes * 4
                    + tile * lanes * 2
                    + 9 * B * B * 4)
            if H % tile == 0 and need <= min(_VMEM_BUDGET_SINGLE, int(6.4e6)):
                return tile, 1, win, pad
            tile //= 2
        return None
    dup = _dup(d)
    taps = 9 * B * B * 2 + (9 * B * B * 4 if bwd else 0)  # bf16 taps [+f32 dw]
    for nbuf, padded in ((2, False), (2, True), (1, False), (1, True)):
        budget = _VMEM_BUDGET if nbuf == 2 else _VMEM_BUDGET_SINGLE
        tile = 128
        while tile >= 8:
            if padded:
                win, pad = tile + 2 * dup, max(dup, 8)
            else:
                win, pad = _win_pad(H, tile, d)
            need = (nbuf * win * lanes * 2  # window slots actually allocated
                    + 3 * tile * lanes * 4
                    + tile * lanes * 2
                    + taps)
            if H % tile == 0 and need <= budget:
                return tile, nbuf, win, pad
            tile //= 2
    return None


def _plan_tile(H, W, C, d, bwd=False):
    p = _plan(H, W, C, d, bwd=bwd)
    return p[0] if p else None


# Scoped disable: Pallas calls are opaque to GSPMD, so mesh-sharded programs
# must trace without the segment kernels. Callers wrap the trace-causing call
# in `with convseg.disabled():` (parallel/mesh-aware paths do this) instead of
# mutating process-global env vars.
_DISABLED_DEPTH = 0


class disabled:
    """Context manager: disable the segment kernels while tracing under it."""

    def __enter__(self):
        global _DISABLED_DEPTH
        _DISABLED_DEPTH += 1
        return self

    def __exit__(self, *exc):
        global _DISABLED_DEPTH
        _DISABLED_DEPTH -= 1
        return False


def pallas_available(H, W, C, Cout, d, bwd=True):
    """bwd=True (default): the caller needs the training kernels too — C must
    divide the 128-lane block. bwd=False (eval/inference prologue path): the
    forward-only kernel additionally handles C % 128 == 0 up to
    MAX_CHANNELS_FWD with a full-width (C, C) tap matmul."""
    import os
    if _DISABLED_DEPTH or os.environ.get("RESUNETA_NO_PALLAS") or \
            os.environ.get("RESUNETA_NO_PALLAS_CONVSEG"):
        return False
    # The C > 128 wide tiers are OPT-IN (RESUNETA_CONVSEG_BWD_WIDE=1 /
    # RESUNETA_CONVSEG_FWD_WIDE=1): device A/B at the round-5 HEAD measured
    # the full-width (C, C) kernels LOSING to XLA's native convs at every
    # C=256 geometry — 256px train +1.9 ms/step, 512px train +5.3 ms/step,
    # 256px eval grid +3 ms (BENCH_NOTES round 5). NHWC is already lane-full
    # at C >= 128, so the dense kernels' layout win doesn't exist there and
    # the window DMA/roll overhead is pure cost. Kept implemented + parity-
    # tested for future hardware where the balance may flip.
    if bwd:
        wide_max = MAX_CHANNELS_BWD_WIDE if \
            os.environ.get("RESUNETA_CONVSEG_BWD_WIDE") == "1" \
            else MAX_CHANNELS
        ch_ok = (128 % C == 0 if C <= MAX_CHANNELS
                 else C <= wide_max and C % 128 == 0)
    else:
        wide_max = MAX_CHANNELS_FWD if \
            os.environ.get("RESUNETA_CONVSEG_FWD_WIDE") == "1" \
            else MAX_CHANNELS
        ch_ok = (128 % C == 0 if C <= MAX_CHANNELS
                 else C <= wide_max and C % 128 == 0)
    return (_PALLAS_OK and jax.default_backend() == "tpu"
            and C == Cout and ch_ok
            and (W * C) % 128 == 0
            and _plan_tile(H, W, C, d, bwd=bwd) is not None)


def _start_window_copy(src_hbm, buf, sem, k, slot, *, T, tile, dup, win, pad,
                       rows):
    """Kick off the async copy of flat program index k's row window into
    double-buffer slot `slot` (the (N, T) grid runs sequentially per core, so
    program k prefetches k+1's window and computes on its own).

    pad == 0 means the source is UNPADDED (`rows` image rows): the window start
    is clamped into [0, rows - win] and the in-kernel tap slices compensate
    with `_window_off` — no physical zero-padded copy of the activation ever
    exists. pad > 0 is the fallback for planes shorter than one window."""
    i2 = k // T
    t2 = k - i2 * T
    if pad:
        st = pl.multiple_of(pad + t2 * tile - dup, 8)
    else:
        # tile, dup, rows, win are all multiples of 8, so the clamp preserves
        # sublane alignment
        st = pl.multiple_of(jnp.clip(t2 * tile - dup, 0, rows - win), 8)
    pltpu.make_async_copy(src_hbm.at[i2, pl.ds(st, win), :],
                          buf.at[slot], sem.at[slot]).start()


def _window_off(t, *, tile, dup, win, rows):
    """Row offset of the nominal window start relative to the clamped one:
    after the copy, buffer row r holds image row clamp(nominal) + r instead of
    nominal + r. Nonzero only for programs whose nominal window sticks out of
    the image (the first/last few row-tiles)."""
    nominal = t * tile - dup
    return nominal - jnp.clip(nominal, 0, rows - win)


def _realign_window(buf, slot, off):
    """In-place circular shift of the DMA'd window so that buffer row r again
    holds nominal image row (t*tile - dup) + r after a clamped (pad == 0)
    window copy: result[r] = window[r + off]. Wrapped rows land on positions
    whose nominal image row is outside [0, H) — every consumer masks those.
    16-bit windows roll on the i32 sublane-pair view (off is a multiple of 8,
    hence an even row count)."""
    w = buf[slot]
    if w.dtype.itemsize == 2:
        v = pltpu.bitcast(w, jnp.int32)
        n = v.shape[0]
        buf[slot] = pltpu.bitcast(
            pltpu.roll(v, jax.lax.rem(-(off // 2) + n, n), axis=0), w.dtype)
    else:
        n = w.shape[0]
        buf[slot] = pltpu.roll(w, jax.lax.rem(-off + n, n), axis=0)


def _wait_window_copy(src_hbm, buf, sem, slot, *, win):
    pltpu.make_async_copy(src_hbm.at[0, pl.ds(0, win), :],
                          buf.at[slot], sem.at[slot]).wait()


def _pixel_roll_masked(arr, kj, C, W):
    """arr (rows, W*C) -> arr shifted by kj PIXELS along lanes, with pixels
    whose source column falls outside [0, W) zeroed.

    16-bit dtypes ride the i32 bitcast view (pltpu.bitcast packs sublane
    PAIRS, keeping the lane count, so an i32 lane-roll is an exact bf16
    lane-roll at half the VPU data volume — native 16-bit lane rotates do not
    compile on this Mosaic). 32-bit dtypes roll directly."""
    lanes = arr.shape[-1]
    if arr.dtype.itemsize == 2:
        view = pltpu.bitcast(arr, jnp.int32)   # (rows//2, lanes)
        zero = 0
    else:
        view = arr
        zero = jnp.zeros((), arr.dtype)
    rolled = pltpu.roll(view, (-kj * C) % lanes, axis=1)
    jj = jax.lax.broadcasted_iota(jnp.int32, rolled.shape, 1) // C
    rolled = jnp.where((jj + kj >= 0) & (jj + kj < W), rolled, zero)
    if arr.dtype.itemsize == 2:
        return pltpu.bitcast(rolled, arr.dtype)
    return rolled


def _segment_kernel(in_hbm, at_ref, bt_ref, w_ref, bias_ref, out_ref, buf, sem,
                    *, H, W, C, tile, d, act, pad, win, nbuf, B=128):
    i = pl.program_id(0)
    t = pl.program_id(1)
    lanes = W * C
    dup = _dup(d)
    # input rows [t*tile - dup, ...) of the image = [pad + t*tile - dup, ...)
    # of the padded array; pad, tile, dup are all sublane-aligned.
    # nbuf == 2 (double-buffered): program k waits on its own window (started
    # by k-1 or, for k == 0, right here) and prefetches k+1's while computing.
    # nbuf == 1 (VMEM-starved plans): each program copies its own window and
    # waits — the DMA is exposed, but the plan fits the 16 MB scoped limit.
    T = pl.num_programs(1)
    NT = pl.num_programs(0) * T
    k = i * T + t
    slot = jax.lax.rem(k, 2) if nbuf == 2 else 0
    src_rows = H if pad == 0 else H + 2 * pad

    if nbuf == 2:
        @pl.when(k == 0)
        def _first():
            _start_window_copy(in_hbm, buf, sem, k, slot, T=T, tile=tile,
                               dup=dup, win=win, pad=pad, rows=src_rows)

        @pl.when(k + 1 < NT)
        def _prefetch():
            _start_window_copy(in_hbm, buf, sem, k + 1, jax.lax.rem(k + 1, 2),
                               T=T, tile=tile, dup=dup, win=win, pad=pad,
                               rows=src_rows)
    else:
        _start_window_copy(in_hbm, buf, sem, k, slot, T=T, tile=tile,
                           dup=dup, win=win, pad=pad, rows=src_rows)

    _wait_window_copy(in_hbm, buf, sem, slot, win=win)
    if pad == 0:
        off = _window_off(t, tile=tile, dup=dup, win=win, rows=src_rows)

        @pl.when(off != 0)
        def _boundary():
            _realign_window(buf, slot, off)

    a = at_ref[0]
    b = bt_ref[0]
    row0 = t * tile  # global image row of output row 0

    acc = jnp.zeros((tile * lanes // B, B), jnp.float32)
    for ti, ki in enumerate((-d, 0, d)):
        # z for the rows feeding this tap: affine + act in f32, zero outside
        # the image (conv SAME padding of z, NOT act(b)); cast to bf16 ONCE —
        # the column taps then roll the 16-bit data (half the VPU volume)
        rows = buf[slot, pl.ds(dup + ki, tile), :].astype(jnp.float32)
        z = rows * a + b
        if act:
            z = jnp.maximum(z, 0)
        ii = jax.lax.broadcasted_iota(jnp.int32, (tile, lanes), 0) + row0 + ki
        z = jnp.where((ii >= 0) & (ii < H), z, 0.0)
        zb = z.astype(jnp.bfloat16)
        for tj, kj in enumerate((-d, 0, d)):
            zs = zb if kj == 0 else _pixel_roll_masked(zb, kj, C, W)
            wk = w_ref[ti, tj].astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                zs.reshape(tile * lanes // B, B), wk,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    y = acc + bias_ref[0]
    out_ref[0] = y.reshape(tile, lanes).astype(out_ref.dtype)


def _bwd_kernel(x_cur, g_hbm, at_ref, bt_ref, mut_ref, invt_ref, wblk_ref,
                dx_ref, dw_ref, vec_ref, gbuf, sem,
                *, H, W, C, tile, d, act, pad, win, nbuf, B=128):
    """One-pass backward for the fused segment: recomputes z tile-locally in
    VMEM (never re-materialized to HBM, unlike XLA remat which cannot fuse the
    recompute into conv ops) and emits dx, the 9 weight-gradient tap blocks,
    and the BN per-channel sums.

    For y[m] = sum_t z[m + t*d] @ W_t + c,  z = act(x*a + b):
      dz[m]  = sum_t g[m - t*d] @ W_t^T
      dz_pre = dz * 1[z_pre > 0]           (when act)
      dx     = dz_pre * a
      dW_t   = sum_m z[m] (outer) g[m - t*d]
      S1 = sum dz_pre, S2 = sum dz_pre * xhat, dc = sum g
    dW / S1 / S2 / dc accumulate across the whole grid into revisited blocks
    (initialized by the first program; the grid runs sequentially per core)."""
    i = pl.program_id(0)
    t = pl.program_id(1)
    lanes = W * C
    dup = _dup(d)
    T = pl.num_programs(1)
    NT = pl.num_programs(0) * T
    k = i * T + t
    slot = jax.lax.rem(k, 2) if nbuf == 2 else 0
    src_rows = H if pad == 0 else H + 2 * pad

    if nbuf == 2:
        @pl.when(k == 0)
        def _first():
            _start_window_copy(g_hbm, gbuf, sem, k, slot, T=T, tile=tile,
                               dup=dup, win=win, pad=pad, rows=src_rows)

        @pl.when(k + 1 < NT)
        def _prefetch():
            _start_window_copy(g_hbm, gbuf, sem, k + 1, jax.lax.rem(k + 1, 2),
                               T=T, tile=tile, dup=dup, win=win, pad=pad,
                               rows=src_rows)
    else:
        _start_window_copy(g_hbm, gbuf, sem, k, slot, T=T, tile=tile,
                           dup=dup, win=win, pad=pad, rows=src_rows)

    @pl.when((i == 0) & (t == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        vec_ref[...] = jnp.zeros_like(vec_ref)

    _wait_window_copy(g_hbm, gbuf, sem, slot, win=win)
    if pad == 0:
        off = _window_off(t, tile=tile, dup=dup, win=win, rows=src_rows)

        @pl.when(off != 0)
        def _boundary():
            _realign_window(gbuf, slot, off)

    a = at_ref[0]
    b = bt_ref[0]
    mu = mut_ref[0]
    inv = invt_ref[0]
    Mg = tile * lanes // B

    x = x_cur[0].astype(jnp.float32)
    row0 = t * tile
    ii = jax.lax.broadcasted_iota(jnp.int32, (tile, lanes), 0) + row0
    in_img = (ii >= 0) & (ii < H)
    jj = jax.lax.broadcasted_iota(jnp.int32, (tile, lanes), 1) // C

    z_pre = x * a + b
    z = jnp.maximum(z_pre, 0) if act else z_pre
    z = jnp.where(in_img, z, 0.0)
    zg = z.reshape(Mg, B).astype(jnp.bfloat16)
    # ONE explicit transpose: the 9 weight-gradient taps then run as native
    # (M, K) @ (K, N) matmuls (lhs contraction on lanes) instead of Mosaic
    # inserting a sublane-contraction transpose inside every tap.
    zT = zg.T

    dz = jnp.zeros((Mg, B), jnp.float32)
    gwin = gbuf[slot]
    vec_ref[2] += jnp.sum(
        gwin[dup:dup + tile, :].astype(jnp.float32).reshape(Mg, B), axis=0)
    for ti, ki in enumerate((-d, 0, d)):
        # cotangent rows stay in their 16-bit storage dtype: mask once, then
        # the column taps roll the bitcast view (no f32 round-trip per tap)
        gs_rows = gwin[dup - ki:dup - ki + tile, :]
        gi = jax.lax.broadcasted_iota(jnp.int32, (tile, lanes), 0) \
            + row0 - ki
        gs_rows = jnp.where((gi >= 0) & (gi < H), gs_rows,
                            jnp.zeros((), gs_rows.dtype))
        for tj, kj in enumerate((-d, 0, d)):
            if kj == 0:
                gs = gs_rows
            else:
                # g at pixel column (w - kj): roll lanes by +kj*C, mask where
                # the source column falls outside the image
                gs = _pixel_roll_masked(gs_rows, -kj, C, W)
            gsg = gs.reshape(Mg, B).astype(jnp.bfloat16)
            # weight-gradient tap: z^T @ gs (contract over pixels)
            dw_ref[ti, tj] += jax.lax.dot_general(
                zT, gsg, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # dz += gs @ W_t^T: contract gs lanes with W's output index
            dz = dz + jax.lax.dot_general(
                gsg, wblk_ref[ti, tj].astype(jnp.bfloat16),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

    dzl = dz.reshape(tile, lanes)
    if act:
        dzl = jnp.where(z_pre > 0, dzl, 0.0)
    dzl = jnp.where(in_img, dzl, 0.0)
    xhat = (x - mu) * inv
    vec_ref[0] += jnp.sum(dzl.reshape(Mg, B), axis=0)
    vec_ref[1] += jnp.sum((dzl * xhat).reshape(Mg, B), axis=0)
    dx_ref[0] = (dzl * a).astype(dx_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("width", "dilation", "act", "interpret"))
def bn_act_conv_pallas_dense(xd, a, b, w, bias, *, width: int, dilation: int,
                             act: bool = True, interpret: bool = False):
    """Dense-view fused segment: xd is the (N, H, W*C) row-major view of the
    activation and the result stays on that view — callers that chain segments
    (models/resuneta.py dense ResBlock path) avoid any NHWC round-trip, whose
    physical relayout (C < 128 channels padded onto lanes) costs more HBM
    traffic than the conv itself at the shallow levels."""
    N, H, lanes = xd.shape
    C = a.shape[0]
    Wd = width
    assert Wd * C == lanes, (Wd, C, lanes)
    d = dilation
    plan = _plan(H, Wd, C, d)
    if plan is None:
        raise ValueError(f"no tile plan for ({H},{Wd},{C}) d={d}; "
                         "guard with pallas_available()")
    tile, nbuf, win, pad = plan
    T = H // tile
    # B: per-tap matmul block width. C <= 128: g pixels per 128-lane block,
    # block-diagonal taps (g-fold redundant FLOPs at full MXU width).
    # C > 128 (multiple of 128, forward-only): one pixel spans C/128 lane
    # blocks and the tap runs as a full-width (M, C) x (C, C) contraction.
    B = max(C, 128)
    g = B // C
    # pad == 0: window starts are clamped into the image and boundary programs
    # realign in VMEM — the activation is never physically padded in HBM.
    # pad > 0: the planner chose the physically zero-padded source variant
    # (plane shorter than one window, or a wide-tier plan where the padded
    # window's smaller VMEM slot beats the 16-row-aligned roll window).

    xf = xd if pad == 0 else jnp.pad(xd, ((0, 0), (pad, pad), (0, 0)))
    a_t = jnp.tile(a.astype(jnp.float32), Wd).reshape(1, lanes)
    b_t = jnp.tile(b.astype(jnp.float32), Wd).reshape(1, lanes)
    bias_t = jnp.tile(bias.astype(jnp.float32), g).reshape(1, B)
    # taps stored bf16 in the wide tier: both kernels cast to bf16 at the
    # matmul, so the f32 copy was pure VMEM (the planner budgets 9*B*B*2)
    wdt = jnp.bfloat16 if B > 128 else jnp.float32
    eye = jnp.eye(g, dtype=w.dtype)
    # (3, 3, B, B) block-diagonal taps: kron(I_g, w[ki, kj]) (g == 1 for
    # C >= 128: the tap is the raw (C, C) matrix)
    wblk = jnp.einsum("ab,ijcd->ijacbd", eye, w.astype(jnp.float32)).reshape(
        3, 3, B, B).astype(wdt)

    kernel = functools.partial(_segment_kernel, H=H, W=Wd, C=C, tile=tile,
                               d=d, act=act, pad=pad, win=win, nbuf=nbuf, B=B)
    rep = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(N, T),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), rep, rep, rep, rep],
        out_specs=pl.BlockSpec((1, tile, lanes), lambda i, t: (i, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, H, lanes), xd.dtype),
        scratch_shapes=[
            pltpu.VMEM((nbuf, win, lanes), xd.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        interpret=interpret,
    )(xf, a_t, b_t, wblk, bias_t)


def bn_act_conv_pallas(x, a, b, w, bias, *, dilation: int, act: bool = True,
                       interpret: bool = False):
    """y = conv_{3x3,d,SAME}(act(x*a + b)) @ w + bias, fused.

    x: (N, H, W, C); a, b: (C,) affine (gamma*invstd, beta - mean*gamma*invstd);
    w: (3, 3, C, C) HWIO; bias: (C,). Returns (N, H, W, C) in x.dtype.
    """
    N, H, Wd, C = x.shape
    out = bn_act_conv_pallas_dense(
        x.reshape(N, H, Wd * C), a, b, w, bias, width=Wd, dilation=dilation,
        act=act, interpret=interpret)
    return out.reshape(N, H, Wd, C)


@functools.partial(jax.jit,
                   static_argnames=("width", "dilation", "act", "interpret"))
def _segment_bwd_pallas_dense(xd, gd, a, b, mean, invstd, wblk, *, width: int,
                              dilation: int, act: bool,
                              interpret: bool = False):
    """Runs _bwd_kernel over the grid on dense (N, H, W*C) views. Returns
    (dxd, dw_blocks, vecs) with dw_blocks (3, 3, B, B) and vecs
    (3, B) = [S1, S2, dc] in group-lane layout, B = max(C, 128) (fold the
    B/C groups to get per-channel values; for the wide C % 128 == 0 tier the
    blocks ARE the per-channel values)."""
    N, H, lanes = xd.shape
    C = a.shape[0]
    Wd = width
    d = dilation
    plan = _plan(H, Wd, C, d, bwd=True)
    if plan is None:
        raise ValueError("no tile plan; guard with pallas_available()")
    tile, nbuf, win, pad = plan
    T = H // tile
    B = max(C, 128)

    gf = gd.astype(xd.dtype)
    if pad:
        gf = jnp.pad(gf, ((0, 0), (pad, pad), (0, 0)))

    def vec(v):
        return jnp.tile(v.astype(jnp.float32), Wd).reshape(1, lanes)

    kernel = functools.partial(_bwd_kernel, H=H, W=Wd, C=C, tile=tile, d=d,
                               act=act, pad=pad, win=win, nbuf=nbuf, B=B)
    rep = pl.BlockSpec(memory_space=pltpu.VMEM)
    same = lambda i, t: (0, 0, 0, 0)
    dx, dw, vecs = pl.pallas_call(
        kernel,
        grid=(N, T),
        in_specs=[
            pl.BlockSpec((1, tile, lanes), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),   # x tile (no halo needed)
            pl.BlockSpec(memory_space=pl.ANY),        # g window source (DMA'd)
            rep, rep, rep, rep, rep,
        ],
        out_specs=(
            pl.BlockSpec((1, tile, lanes), lambda i, t: (i, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, B, B), same, memory_space=pltpu.VMEM),
            pl.BlockSpec((3, B), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, H, lanes), xd.dtype),
            jax.ShapeDtypeStruct((3, 3, B, B), jnp.float32),
            jax.ShapeDtypeStruct((3, B), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((nbuf, win, lanes), xd.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        interpret=interpret,
    )(xd, gf, vec(a), vec(b), vec(mean), vec(invstd), wblk)
    return dx, dw, vecs


def _segment_bwd_pallas(x, g, a, b, mean, invstd, wblk, *, dilation: int,
                        act: bool, interpret: bool = False):
    N, H, Wd, C = x.shape
    dx, dw, vecs = _segment_bwd_pallas_dense(
        x.reshape(N, H, Wd * C), g.reshape(N, H, Wd * C), a, b, mean, invstd,
        wblk, width=Wd, dilation=dilation, act=act, interpret=interpret)
    return dx.reshape(N, H, Wd, C), dw, vecs


def _affine(gamma, beta, mean, var, eps):
    invstd = jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    a = gamma * invstd
    return a, beta - mean * a, invstd


def _fold_groups(vB, C):
    """(…, B) group-lane vector -> per-channel (…, C) by summing groups
    (identity for the wide C >= 128 tier, where B == C)."""
    g = vB.shape[-1] // C
    return vB.reshape(vB.shape[:-1] + (g, C)).sum(-2)


def _block_w(w):
    C = w.shape[2]
    B = max(C, 128)
    g = B // C
    # bf16 storage in the wide tier — the kernels cast taps to bf16 at the
    # matmul either way, so this is numerics-identical and halves the VMEM
    # the planner must budget for the 9 tap blocks (_plan wide tier)
    wdt = jnp.bfloat16 if B > 128 else jnp.float32
    eye = jnp.eye(g, dtype=jnp.float32)
    return jnp.einsum("ab,ijcd->ijacbd", eye, w.astype(jnp.float32)).reshape(
        3, 3, B, B).astype(wdt)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def fused_segment(dilation, eps, act, interpret, x, gamma, beta, mean, var, w, bias):
    """Training-mode fused BN->ReLU->dilated-conv with a one-kernel backward.

    y = conv_{3x3,dilation,SAME}(act((x - mean) * rsqrt(var+eps) * gamma
        + beta)) @ w + bias

    mean/var are the batch statistics (computed outside, shareable across
    ResBlock branches); their cotangents follow the same closed form as
    ops/fused_bn.bn_apply so the statistics chain continues through autodiff.
    """
    a, b, _ = _affine(gamma, beta, mean, var, eps)
    return bn_act_conv_pallas(x, a, b, w, bias, dilation=dilation, act=act,
                              interpret=interpret)


def _fused_segment_fwd(dilation, eps, act, interpret, x, gamma, beta, mean,
                       var, w, bias):
    y = fused_segment(dilation, eps, act, interpret, x, gamma, beta, mean,
                      var, w, bias)
    return y, (x, gamma, beta, mean, var, w)


def _fold_cotangents(dx, dwblk, vecs, x, gamma, invstd, w):
    """(dx, block-diagonal tap grads, BN sums) -> the 7 input cotangents."""
    C = gamma.shape[0]
    grp = dwblk.shape[-1] // C
    # fold the block-diagonal taps: true dW = sum of the diagonal blocks
    dw = dwblk.reshape(3, 3, grp, C, grp, C)
    dw = jnp.einsum("ijgcgd->ijcd", dw)
    s1 = _fold_groups(vecs[0], C)   # sum dz_pre
    s2 = _fold_groups(vecs[1], C)   # sum dz_pre * xhat
    dc = _fold_groups(vecs[2], C)   # conv bias grad

    dgamma = s2
    dbeta = s1
    dmean = -gamma * invstd * s1
    dvar = -0.5 * gamma * invstd * invstd * s2
    return (dx.astype(x.dtype), dgamma, dbeta, dmean, dvar,
            dw.astype(w.dtype), dc.astype(jnp.float32))


def _fused_segment_bwd(dilation, eps, act, interpret, res, g):
    x, gamma, beta, mean, var, w = res
    a, b, invstd = _affine(gamma, beta, mean, var, eps)
    dx, dwblk, vecs = _segment_bwd_pallas(
        x, g, a, b, mean, invstd, _block_w(w), dilation=dilation, act=act,
        interpret=interpret)
    return _fold_cotangents(dx, dwblk, vecs, x, gamma, invstd, w)


fused_segment.defvjp(_fused_segment_fwd, _fused_segment_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3, 4))
def fused_segment_dense(width, dilation, eps, act, interpret, xd, gamma, beta,
                        mean, var, w, bias):
    """fused_segment on dense (N, H, W*C) views: input AND output stay dense,
    so a chain of segments (the dense ResBlock path, models/resuneta.py) never
    materializes the lane-padded NHWC layout in between. `width` is the image
    width W (static)."""
    a, b, _ = _affine(gamma, beta, mean, var, eps)
    return bn_act_conv_pallas_dense(xd, a, b, w, bias, width=width,
                                    dilation=dilation, act=act,
                                    interpret=interpret)


def _fused_segment_dense_fwd(width, dilation, eps, act, interpret, xd, gamma,
                             beta, mean, var, w, bias):
    y = fused_segment_dense(width, dilation, eps, act, interpret, xd, gamma,
                            beta, mean, var, w, bias)
    return y, (xd, gamma, beta, mean, var, w)


def _fused_segment_dense_bwd(width, dilation, eps, act, interpret, res, g):
    xd, gamma, beta, mean, var, w = res
    a, b, invstd = _affine(gamma, beta, mean, var, eps)
    dx, dwblk, vecs = _segment_bwd_pallas_dense(
        xd, g, a, b, mean, invstd, _block_w(w), width=width, dilation=dilation,
        act=act, interpret=interpret)
    return _fold_cotangents(dx, dwblk, vecs, xd, gamma, invstd, w)


fused_segment_dense.defvjp(_fused_segment_dense_fwd, _fused_segment_dense_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def fused_segment_bwdonly(dilation, eps, act, interpret, x, gamma, beta, mean,
                          var, w, bias):
    """Hybrid segment: XLA-op FORWARD (BN apply -> ReLU -> conv, which XLA
    schedules/fuses well in-graph) + the one-kernel Pallas BACKWARD of
    fused_segment (dx + 9 wgrad taps + BN sums in one pass, z recomputed only
    in VMEM — the backward is where XLA pays the C<128 layout tax in separate
    relu-mask/wgrad/BN-reduction passes). The bwd kernel recomputes z from x,
    so it is independent of how the forward ran."""
    a, b, _ = _affine(gamma, beta, mean, var, eps)
    z = x.astype(jnp.float32) * a + b
    if act:
        z = jnp.maximum(z, 0)
    z = z.astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        z, w.astype(x.dtype), (1, 1), "SAME",
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias.astype(x.dtype)


def _fused_segment_bwdonly_fwd(dilation, eps, act, interpret, x, gamma, beta,
                               mean, var, w, bias):
    y = fused_segment_bwdonly(dilation, eps, act, interpret, x, gamma, beta,
                              mean, var, w, bias)
    return y, (x, gamma, beta, mean, var, w)


fused_segment_bwdonly.defvjp(_fused_segment_bwdonly_fwd, _fused_segment_bwd)
