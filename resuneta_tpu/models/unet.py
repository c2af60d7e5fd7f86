"""UNet baseline — the reference's `--resunet_a False` path (utils.py:98-133):
4 maxpool downs with a single 3x3 relu conv per level (32..512 filters), nearest-up
decoder with 3x3 relu conv + skip concat, final 1x1 conv + softmax head named 'seg'.
"""

from typing import Any

import jax.numpy as jnp
import flax.linen as nn

_conv_init = nn.initializers.glorot_uniform()


class UNet(nn.Module):
    num_classes: int
    base_filters: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)
        f1 = self.base_filters

        def conv(x, f):
            return nn.relu(
                nn.Conv(f, (3, 3), padding="SAME", dtype=dt, kernel_init=_conv_init)(x)
            )

        def up2(x):
            x = jnp.repeat(x, 2, axis=1)
            return jnp.repeat(x, 2, axis=2)

        c1 = conv(x, f1)
        p1 = nn.max_pool(c1, (2, 2), strides=(2, 2))
        c2 = conv(p1, f1 * 2)
        p2 = nn.max_pool(c2, (2, 2), strides=(2, 2))
        c3 = conv(p2, f1 * 4)
        p3 = nn.max_pool(c3, (2, 2), strides=(2, 2))
        c4 = conv(p3, f1 * 8)
        p4 = nn.max_pool(c4, (2, 2), strides=(2, 2))
        c5 = conv(p4, f1 * 16)

        u1 = conv(up2(c5), f1 * 8)
        m1 = jnp.concatenate([c4, u1], axis=-1)
        u2 = conv(up2(m1), f1 * 4)
        m2 = jnp.concatenate([c3, u2], axis=-1)
        u3 = conv(up2(m2), f1 * 2)
        m3 = jnp.concatenate([c2, u3], axis=-1)
        u4 = conv(up2(m3), f1)
        m4 = jnp.concatenate([c1, u4], axis=-1)

        logits = nn.Conv(self.num_classes, (1, 1), dtype=dt, kernel_init=_conv_init)(m4)
        return nn.softmax(logits.astype(jnp.float32), axis=-1)
