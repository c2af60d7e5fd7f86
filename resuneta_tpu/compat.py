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


class UNet:
    """The legacy config-driven driver the reference's `ResUnet_a/train.py` /
    `test.py` stubs invoke (`from model import UNet` — ResUnet_a/train.py:1-10,
    test.py:1-18) but upstream never shipped (model.py defines only Resunet_a;
    the stubs are broken as committed). This is the working equivalent: the
    size-adaptive legacy model (ResUnet_a/model_old.py) with its compile
    choices — Adam(1e-3, beta1=0.9) + Tanimoto (model_old.py:169-171; its local
    Tanimoto_loss is broken — missing return — so the family's working
    tanimoto_dual_loss is used) —
    trained over a DataGenerator-equivalent directory pair, with
    loadWeight/predict matching model_old.py:176-185 (mean subtraction +
    argmax) and `visual` rendering class ids with the ISPRS palette.

    Dataset layout for train(dataset_dir, logdir): images under
    `{dataset_dir}/train`, same-named label maps under `{dataset_dir}/label`
    (.npy class-id maps or image files; multi-channel label images use
    channel 0 — ResUnet_a/utils.py:27-35,53)."""

    def __init__(self, config=None):
        from .models.variants import ResUnetALegacy
        from .utils.config import UnetConfig

        self.config = config or UnetConfig()
        c = self.config
        self.model = ResUnetALegacy(num_classes=c.CLASSES_NUM,
                                    img_size=c.IMAGE_W, mean=tuple(c.MEAN))
        self._state = None

    def _make_state(self):
        from .train import create_train_state

        c = self.config
        return create_train_state(
            self.model, jax.random.PRNGKey(0),
            (1, c.IMAGE_H, c.IMAGE_W, c.IMAGE_C), "adam", 1e-3)

    def train(self, dataset_dir, logdir, epochs=None, batch_size=None,
              val_fraction=0.2):
        """model.fit equivalent over the directory dataset; keeps the
        best-val-loss checkpoint in `logdir` (the reference family's
        save-best-only policy, train_ISPRS.py:291-292)."""
        import os

        import numpy as np

        from .data.dataset import DirectoryPairDataset
        from .losses import tanimoto_dual_loss
        from .train import make_train_step, make_eval_step
        from .train.loop import TrainConfig, train_model

        c = self.config
        ds = DirectoryPairDataset(
            os.path.join(dataset_dir, "train"),
            os.path.join(dataset_dir, "label"),
            c.CLASSES_NUM, mean=c.MEAN, target_size=(c.IMAGE_H, c.IMAGE_W))
        n = len(ds)
        rng = np.random.default_rng(42)
        order = rng.permutation(n)
        n_val = max(1, int(n * val_fraction)) if n > 1 else 0
        val_ds = ds.subset(order[:n_val]) if n_val else None
        train_ds = ds.subset(order[n_val:])

        loss_fns = {"seg": tanimoto_dual_loss}
        step = make_train_step(loss_fns, {}, multitasking=False)
        eval_step = make_eval_step(loss_fns, {}, multitasking=False)
        state = self._state or self._make_state()
        cfg = TrainConfig(
            epochs=epochs or c.EPOCHS,
            batch_size=batch_size or c.BATCH_SIZE,
            results_path=logdir, multitasking=False)
        self._state, history = train_model(cfg, state, step, eval_step,
                                           train_ds, val_ds or train_ds)
        return history

    def loadWeight(self, path):
        """model_old.py:176-177 — restore the checkpoint saved by train().
        Accepts the train() logdir (resolves its best_model.ckpt) or a
        checkpoint directory directly."""
        import os

        from .train.checkpoint import restore

        best = os.path.join(path, "best_model.ckpt")
        self._state, _ = restore(best if os.path.isdir(best) else path,
                                 self._state or self._make_state())
        return self._state

    def predict(self, img):
        """model_old.py:179-185: subtract config MEAN, forward one image in
        eval mode, per-pixel argmax class ids."""
        import numpy as np

        state = self._state or self._make_state()
        return np.asarray(self.model.predict_ids(
            {"params": state.params, "batch_stats": state.batch_stats}, img))

    def visual(self, result, path):
        """Render class ids with the ISPRS palette and save (test.py:17)."""
        import os

        from PIL import Image

        from .data.isprs import class_ids_to_rgb

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        Image.fromarray(class_ids_to_rgb(result)).save(path)
