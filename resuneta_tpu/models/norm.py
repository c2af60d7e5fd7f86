"""BatchNorm Flax module on the hand-scheduled training path (ops/fused_bn.py).

Drop-in replacement for flax.linen.BatchNorm as used by the models: same
variable collections and names ('params': scale/bias, 'batch_stats': mean/var
— the class is deliberately named BatchNorm so Flax auto-naming produces
identical parameter trees and round-1 checkpoints keep loading), same
momentum/epsilon semantics as Keras BatchNormalization(momentum=0.99, eps=1e-3)
(ResUnet_a/model2.py:17-24), float32 statistics under bfloat16 compute.

Extras over flax.linen.BatchNorm:
  * act=True fuses the following ReLU into the normalization (the ResBlock
    branches are always BN->ReLU — model2.py:18-22).
  * __call__(x, train, stats=...) accepts precomputed batch statistics so the
    four dilation branches of a ResBlock, whose first BNs all normalize the
    same input, share ONE statistics pass instead of four.
"""

from typing import Any, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..ops.fused_bn import bn_stats, batch_norm_act


class BatchNorm(nn.Module):
    momentum: float = 0.99
    epsilon: float = 1e-3
    dtype: Any = jnp.float32
    act: bool = False  # fuse a ReLU into the apply pass

    @nn.compact
    def __call__(self, x, train: bool = False,
                 stats: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                 return_affine: bool = False, return_raw: bool = False,
                 features: Optional[int] = None):
        # `features` overrides the channel count when x is a dense (N, H, W*C)
        # view (the ResBlock fast path passes precomputed `stats` then, so x is
        # only consulted for shape)
        C = features if features is not None else x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))

        if train:
            if stats is not None:
                mean, var = stats
            elif features is not None:
                # x is the dense (N, H, W*C) lane-packed view
                from ..ops.fused_bn import bn_stats_dense
                mean, var = bn_stats_dense(x, C)
            else:
                mean, var = bn_stats(x)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        if return_raw:
            # (scale, bias, mean, var) for consumers that fuse the whole
            # normalization into their own kernel with a custom VJP
            # (ops/pallas/convseg.fused_segment); running stats updated above
            return scale, bias, mean, var

        if return_affine:
            # the (a, b) of y = x*a + b, for consumers that fuse the affine
            # (+ ReLU) into their own kernel (models/resuneta.py Conv prologue)
            import jax
            invstd = jax.lax.rsqrt(var + self.epsilon)
            return scale * invstd, bias - mean * scale * invstd

        if features is not None:
            from ..ops.dense import bn_apply
            return bn_apply(x, channels=C, gamma=scale, beta=bias, mean=mean,
                            var=var, eps=self.epsilon, relu=self.act)
        return batch_norm_act(x, scale, bias, mean, var,
                              eps=self.epsilon, relu=self.act)
