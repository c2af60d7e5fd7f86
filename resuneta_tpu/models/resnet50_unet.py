"""Experimental ResNet50-style encoder-decoder (reference utils.py:135-232:
identity_block + ResNet50): 5 conv/pool stages with un-normed identity blocks,
nearest-up decoder with skip concats, 3-class softmax head. Kept for capability
parity with the reference's experimental model family."""

from typing import Any, Sequence

import jax.numpy as jnp
import flax.linen as nn

_conv_init = nn.initializers.glorot_uniform()


class IdentityBlock(nn.Module):
    """utils.py:135-163: 1x1 -> fxf -> 1x1 convs (no BN, as committed), residual add,
    final ReLU."""
    f: int
    filters: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        F1, F2, F3 = self.filters
        shortcut = x
        y = nn.relu(nn.Conv(F1, (1, 1), padding="SAME", dtype=self.dtype,
                            kernel_init=_conv_init)(x))
        y = nn.relu(nn.Conv(F2, (self.f, self.f), padding="SAME", dtype=self.dtype,
                            kernel_init=_conv_init)(y))
        y = nn.Conv(F3, (1, 1), padding="SAME", dtype=self.dtype,
                    kernel_init=_conv_init)(y)
        return nn.relu(y + shortcut)


class ResNet50UNet(nn.Module):
    num_classes: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        x = x.astype(dt)

        def conv_relu(x, f, k):
            return nn.relu(nn.Conv(f, (k, k), padding="SAME", dtype=dt,
                                   kernel_init=_conv_init)(x))

        def up2(x):
            x = jnp.repeat(x, 2, axis=1)
            return jnp.repeat(x, 2, axis=2)

        conv1 = nn.Conv(64, (7, 7), padding="SAME", dtype=dt,
                        kernel_init=_conv_init)(x)
        act1 = nn.relu(conv1)
        pool1 = nn.max_pool(act1, (2, 2), strides=(2, 2))
        ident1 = IdentityBlock(3, (64, 64, 64), dtype=dt)(pool1)

        conv2 = nn.Conv(128, (3, 3), padding="SAME", dtype=dt,
                        kernel_init=_conv_init)(ident1)
        pool2 = nn.max_pool(nn.relu(conv2), (2, 2), strides=(2, 2))
        ident2 = IdentityBlock(3, (128, 128, 128), dtype=dt)(pool2)

        conv3 = nn.Conv(256, (3, 3), padding="SAME", dtype=dt,
                        kernel_init=_conv_init)(ident2)
        pool3 = nn.max_pool(nn.relu(conv3), (2, 2), strides=(2, 2))
        ident3 = IdentityBlock(3, (256, 256, 256), dtype=dt)(pool3)

        conv4 = nn.Conv(512, (3, 3), padding="SAME", dtype=dt,
                        kernel_init=_conv_init)(ident3)
        pool4 = nn.max_pool(nn.relu(conv4), (2, 2), strides=(2, 2))
        ident4 = IdentityBlock(3, (512, 512, 512), dtype=dt)(pool4)

        conv5 = nn.Conv(1024, (3, 3), padding="SAME", dtype=dt,
                        kernel_init=_conv_init)(ident4)
        ident5 = IdentityBlock(3, (1024, 1024, 1024), dtype=dt)(nn.relu(conv5))

        u1 = conv_relu(up2(ident5), 512, 3)
        m1 = jnp.concatenate([conv4, u1], axis=-1)
        u2 = conv_relu(up2(m1), 256, 3)
        m2 = jnp.concatenate([conv3, u2], axis=-1)
        u3 = conv_relu(up2(m2), 128, 3)
        m3 = jnp.concatenate([conv2, u3], axis=-1)
        u4 = conv_relu(up2(m3), 64, 3)
        m4 = jnp.concatenate([conv1, u4], axis=-1)

        logits = nn.Conv(self.num_classes, (1, 1), dtype=dt,
                         kernel_init=_conv_init)(m4)
        return nn.softmax(logits.astype(jnp.float32), axis=-1)
