"""Keras-style compatibility shims for users migrating from the reference.

The reference exposes `Resunet_a(input_shape, num_classes, args).model`
(ResUnet_a/model2.py:6-12). Here `.model` is the Flax module and `.init()` returns
its variables; `predict` mirrors Keras model.predict for quick scripts.
"""

from types import SimpleNamespace

import jax
import jax.numpy as jnp

from .models import ResUnetA, ResUnetAV1


class Resunet_a:
    """Drop-in-shaped constructor: Resunet_a((H, W, C), num_classes, args).

    args needs `.multitasking` (and optionally `.gpu_parallel`, ignored — data
    parallelism is a mesh concern here, not a model-build concern)."""

    def __init__(self, input_shape, num_classes, args=None, inputs=None,
                 variant="model2"):
        args = args or SimpleNamespace(multitasking=True)
        self.img_height, self.img_width, self.img_channel = input_shape
        self.num_classes = num_classes
        self.args = args
        cls = ResUnetA if variant == "model2" else ResUnetAV1
        self.model = cls(num_classes=num_classes, img_size=self.img_width,
                         multitasking=bool(getattr(args, "multitasking", True)))
        self._variables = None

    def init(self, seed=0):
        self._variables = self.model.init(
            jax.random.PRNGKey(seed),
            jnp.zeros((1, self.img_height, self.img_width, self.img_channel)),
            train=False)
        return self._variables

    def predict(self, x, variables=None, batch_size=32):
        variables = variables or self._variables or self.init()
        from .infer import predict_patches

        @jax.jit
        def apply_fn(xb):
            return self.model.apply(variables, xb, train=False)

        import numpy as np
        return predict_patches(apply_fn, np.asarray(x, np.float32), batch_size)
