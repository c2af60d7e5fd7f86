"""Historical ResUnet-a variants, kept for capability parity with the reference's
model family (SURVEY.md §2.1):

  ResUnetAV1     — ResUnet_a/model.py: residual blocks sum the dilation branches
                   WITHOUT the identity path (model.py:26-33), PSP/decoder/combine
                   have no BatchNorm (model.py:35-65, 93-94), and there is no ReLU
                   after either PSPPooling. Heads are identical to model2.
  ResUnetALegacy — ResUnet_a/model_old.py: single-task, input-size-adaptive depth
                   (encoder/decoder stages gated on input size 64/128/256/512,
                   model_old.py:100-125,133-155), fixed PSP pool sizes 2/4/8/16
                   with 'same' pooling (model_old.py:62-76), mean-subtract predict
                   helper (model_old.py:176-185).
"""

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

from .resuneta import _conv_init, _max_pool, _upsample_nearest

Dtype = Any


class ResBlockV1(nn.Module):
    """Pre-activation multi-dilation block, sum of branches only (no identity)."""
    features: int
    dilation_rates: Sequence[int]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for d in self.dilation_rates:
            b = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype)(x)
            b = nn.relu(b)
            b = nn.Conv(self.features, (3, 3), kernel_dilation=(d, d),
                        padding="SAME", dtype=self.dtype, kernel_init=_conv_init)(b)
            b = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype)(b)
            b = nn.relu(b)
            b = nn.Conv(self.features, (3, 3), kernel_dilation=(d, d),
                        padding="SAME", dtype=self.dtype, kernel_init=_conv_init)(b)
            outs.append(b)
        out = outs[0]
        for b in outs[1:]:
            out = out + b
        return out


class PSPPoolingV1(nn.Module):
    """PSP without BatchNorm (model.py:35-65); conv before upsample like v1."""
    features: int
    img_width: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        levels = [1, 2]
        if self.img_width >= 128:
            levels.append(4)
        if self.img_width >= 256:
            levels.append(8)
        quarter = self.features // 4
        pooled = []
        for k in levels:
            p = _max_pool(x, k)
            p = nn.Conv(quarter, (1, 1), dtype=self.dtype, kernel_init=_conv_init)(p)
            pooled.append(_upsample_nearest(p, k))
        x = jnp.concatenate(pooled + [x], axis=-1)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       kernel_init=_conv_init)(x)


class ResUnetAV1(nn.Module):
    """The reference's first ResUnet-a version (ResUnet_a/model.py)."""
    num_classes: int
    img_size: int = 256
    multitasking: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)

        def combine(dec, skip, f):
            y = jnp.concatenate([nn.relu(dec), skip], axis=-1)
            return nn.Conv(f, (1, 1), dtype=dt, kernel_init=_conv_init)(y)

        c1 = x = nn.Conv(32, (1, 1), dtype=dt, kernel_init=_conv_init)(x)
        c2 = x = ResBlockV1(32, [1, 3, 15, 31], dtype=dt)(x, train)
        x = nn.Conv(64, (1, 1), strides=(2, 2), dtype=dt, kernel_init=_conv_init)(x)
        c3 = x = ResBlockV1(64, [1, 3, 15, 31], dtype=dt)(x, train)
        x = nn.Conv(128, (1, 1), strides=(2, 2), dtype=dt, kernel_init=_conv_init)(x)
        c4 = x = ResBlockV1(128, [1, 3, 15], dtype=dt)(x, train)
        x = nn.Conv(256, (1, 1), strides=(2, 2), dtype=dt, kernel_init=_conv_init)(x)
        c5 = x = ResBlockV1(256, [1, 3, 15], dtype=dt)(x, train)
        x = nn.Conv(512, (1, 1), strides=(2, 2), dtype=dt, kernel_init=_conv_init)(x)
        c6 = x = ResBlockV1(512, [1], dtype=dt)(x, train)
        x = nn.Conv(1024, (1, 1), strides=(2, 2), dtype=dt, kernel_init=_conv_init)(x)
        x = ResBlockV1(1024, [1], dtype=dt)(x, train)

        x = PSPPoolingV1(1024, self.img_size, dtype=dt)(x, train)

        for f, dil, skip in ((512, [1], c6), (256, [1, 3, 15], c5),
                             (128, [1, 3, 15], c4), (64, [1, 3, 15, 31], c3),
                             (32, [1, 3, 15, 31], c2)):
            x = nn.Conv(f, (1, 1), dtype=dt, kernel_init=_conv_init)(x)
            x = _upsample_nearest(x, 2)
            x = combine(x, skip, f)
            x = ResBlockV1(f, dil, dtype=dt)(x, train)

        x_comb = combine(x, c1, 32)
        x_psp = PSPPoolingV1(32, self.img_size, dtype=dt)(x_comb, train)

        if not self.multitasking:
            logits = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                             kernel_init=_conv_init)(x_psp)
            return nn.softmax(logits.astype(jnp.float32), axis=-1)

        s = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                            kernel_init=_conv_init, name="seg1")(x_psp))
        s = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                            kernel_init=_conv_init, name="seg2")(s))
        s = nn.Conv(self.num_classes, (1, 1), dtype=dt, kernel_init=_conv_init,
                    name="seg3")(s)
        out_seg = nn.softmax(s.astype(jnp.float32), axis=-1)

        b = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                            kernel_init=_conv_init)(x_psp))
        b = nn.Conv(self.num_classes, (1, 1), dtype=dt, kernel_init=_conv_init)(b)
        out_bound = nn.sigmoid(b.astype(jnp.float32))

        d = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                            kernel_init=_conv_init)(x_comb))
        d = nn.relu(nn.Conv(32, (3, 3), padding="SAME", dtype=dt,
                            kernel_init=_conv_init)(d))
        d = nn.Conv(self.num_classes, (1, 1), dtype=dt, kernel_init=_conv_init)(d)
        out_dist = nn.softmax(d.astype(jnp.float32), axis=-1)

        c = nn.Conv(3, (1, 1), dtype=dt, kernel_init=_conv_init)(x_comb)
        out_color = nn.sigmoid(c.astype(jnp.float32))

        return {"seg": out_seg, "bound": out_bound, "dist": out_dist,
                "color": out_color}


class PSPPoolingLegacy(nn.Module):
    """Fixed pool sizes 2/4/8/16 with 'same' padding (model_old.py:57-83)."""
    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        H = x.shape[1]
        quarter = self.features // 4
        pooled = []
        for k in (2, 4, 8, 16):
            pad_h = (-H) % k
            xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_h), (0, 0)),
                         constant_values=-jnp.inf) if pad_h else x
            p = _max_pool(xp, k)
            p = nn.Conv(quarter, (1, 1), dtype=self.dtype, kernel_init=_conv_init)(p)
            p = _upsample_nearest(p, k)[:, :H, :H, :]
            pooled.append(p)
        y = jnp.concatenate(pooled + [x], axis=-1)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       kernel_init=_conv_init)(y)


class ResUnetALegacy(nn.Module):
    """Input-size-adaptive single-task variant (ResUnet_a/model_old.py):
    encoder/decoder stages switch on the build-time input size."""
    num_classes: int
    img_size: int = 512
    mean: Sequence[float] = (82.0, 92.0, 88.0)  # config.py MEAN
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        s = self.img_size
        x = x.astype(dt)

        def combine(dec, skip, f):
            y = jnp.concatenate([nn.relu(dec), skip], axis=-1)
            return nn.Conv(f, (1, 1), dtype=dt, kernel_init=_conv_init)(y)

        c1 = x = nn.Conv(32, (1, 1), dtype=dt, kernel_init=_conv_init)(x)
        c2 = x = ResBlockV1(32, [1, 3, 15, 31], dtype=dt)(x, train)
        skips = {}
        if s >= 64:
            x = nn.Conv(64, (1, 1), strides=(2, 2), dtype=dt,
                        kernel_init=_conv_init)(x)
            skips["c3"] = x = ResBlockV1(64, [1, 3, 15, 31], dtype=dt)(x, train)
        if s >= 128:
            x = nn.Conv(128, (1, 1), strides=(2, 2), dtype=dt,
                        kernel_init=_conv_init)(x)
            skips["c4"] = x = ResBlockV1(128, [1, 3, 15], dtype=dt)(x, train)
        if s >= 256:
            x = nn.Conv(256, (1, 1), strides=(2, 2), dtype=dt,
                        kernel_init=_conv_init)(x)
            skips["c5"] = x = ResBlockV1(256, [1, 3, 15], dtype=dt)(x, train)
        if s >= 512:
            x = nn.Conv(512, (1, 1), strides=(2, 2), dtype=dt,
                        kernel_init=_conv_init)(x)
            skips["c6"] = x = ResBlockV1(512, [1], dtype=dt)(x, train)

        x = nn.Conv(1024, (1, 1), strides=(2, 2), dtype=dt,
                    kernel_init=_conv_init)(x)
        x = ResBlockV1(1024, [1], dtype=dt)(x, train)
        x = PSPPoolingLegacy(1024, dtype=dt)(x, train)

        if s >= 512:
            x = nn.Conv(512, (1, 1), dtype=dt, kernel_init=_conv_init)(x)
            x = _upsample_nearest(x, 2)
            x = combine(x, skips["c6"], 512)
            x = ResBlockV1(512, [1], dtype=dt)(x, train)
        if s >= 256:
            x = nn.Conv(256, (1, 1), dtype=dt, kernel_init=_conv_init)(x)
            x = _upsample_nearest(x, 2)
            x = combine(x, skips["c5"], 256)
            x = ResBlockV1(256, [1, 3, 15], dtype=dt)(x, train)
        if s >= 128:
            x = nn.Conv(128, (1, 1), dtype=dt, kernel_init=_conv_init)(x)
            x = _upsample_nearest(x, 2)
            x = combine(x, skips["c4"], 128)
            x = ResBlockV1(128, [1, 3, 15], dtype=dt)(x, train)
        if s >= 64:
            x = nn.Conv(64, (1, 1), dtype=dt, kernel_init=_conv_init)(x)
            x = _upsample_nearest(x, 2)
            x = combine(x, skips["c3"], 64)
            x = ResBlockV1(64, [1, 3, 15, 31], dtype=dt)(x, train)

        x = nn.Conv(32, (1, 1), dtype=dt, kernel_init=_conv_init)(x)
        x = _upsample_nearest(x, 2)
        x = combine(x, c2, 32)
        x = ResBlockV1(32, [1, 3, 15, 31], dtype=dt)(x, train)
        x = combine(x, c1, 32)
        x = PSPPoolingLegacy(32, dtype=dt)(x, train)
        logits = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                         kernel_init=_conv_init)(x)
        return nn.softmax(logits.astype(jnp.float32), axis=-1)

    def predict_ids(self, variables, img):
        """model_old.py:179-185: mean-subtract, forward, argmax."""
        img = (jnp.asarray(img, jnp.float32) - jnp.asarray(self.mean))[None]
        probs = self.apply(variables, img, train=False)
        return jnp.argmax(probs[0], axis=-1)
