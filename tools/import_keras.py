#!/usr/bin/env python
"""Keras -> Flax weight importer for ResUnet-a d6 (VERDICT round-1 item #5).

Maps the reference Keras graph's weights (ResUnet_a/model2.py:97-191, built by
the code in /root/reference — imported read-only at runtime, never copied) onto
resuneta_tpu.models.ResUnetA's parameter tree, enabling forward/eval parity
checks against the reference's own trained .h5 checkpoints and the recorded
quality anchors (infos_training_train_on_batch.txt) without retraining.

Mapping strategy
----------------
Both graphs are built in the same dataflow order (our flax __call__ was derived
from model2.py's build order), so the i-th convolution in one corresponds to the
i-th in the other, and likewise for BatchNorm layers:

* Flax side: an interceptor records the module path of every nn.Conv /
  BatchNorm call, in call order, during a shape-only init.
* Keras side: auto-generated layer names encode global creation order
  ("conv2d", "conv2d_1", ...). The four explicitly-named head layers
  (seg1/seg2/seg3, color — model2.py:152-189) are spliced back into creation
  position: heads are created seg -> bound -> dist -> color, and bound/dist
  convs are auto-named so they sort AFTER all body convs.
* Every mapped pair is shape-checked; Conv2D kernels are (kh, kw, cin, cout) in
  both frameworks, BatchNormalization's (gamma, beta, moving_mean,
  moving_variance) map to our (scale, bias) params + (mean, var) batch_stats.

Usage:
  python tools/import_keras.py --h5 /path/to/weights.h5 --out ckpt_dir \
      [--patch_size 256] [--num_classes 5]
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def flax_layer_order(model, input_shape):
    """Ordered (conv_paths, bn_paths) of a ResUnetA by tracing an init."""
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from resuneta_tpu.models.norm import BatchNorm
    from resuneta_tpu.models.resuneta import Conv as FusableConv

    convs, bns = [], []

    def interceptor(next_fun, args, kwargs, context):
        mod = context.module
        if context.method_name == "__call__" and mod.path:
            path = tuple(mod.path)
            if isinstance(mod, (nn.Conv, FusableConv)) and path not in convs:
                convs.append(path)
            elif isinstance(mod, BatchNorm) and path not in bns:
                bns.append(path)
        return next_fun(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros(input_shape, jnp.float32), train=False)
    return convs, bns, variables


def keras_layer_order(kmodel, multitasking=True):
    """Reference layers in creation order: (conv_layers, bn_layers)."""

    def auto_num(name, prefix):
        if name == prefix:
            return 0
        m = re.fullmatch(re.escape(prefix) + r"_(\d+)", name)
        return int(m.group(1)) if m else None

    autos, named = [], {}
    bns = []
    for layer in kmodel.layers:
        cls = type(layer).__name__
        if cls == "Conv2D":
            n = auto_num(layer.name, "conv2d")
            if n is None:
                named[layer.name] = layer
            else:
                autos.append((n, layer))
        elif cls == "BatchNormalization":
            bns.append((auto_num(layer.name, "batch_normalization"), layer))

    autos.sort(key=lambda kv: kv[0])
    bns.sort(key=lambda kv: kv[0])
    autos = [l for _, l in autos]
    bns = [l for _, l in bns]

    if not multitasking:
        return autos, bns

    # creation order (model2.py:152-189): body convs, then seg1/seg2/seg3
    # (named), then 2 bound + 3 dist convs (auto-named, so they are the LAST
    # five in the auto sequence), then color (named)
    body, tail = autos[:-5], autos[-5:]
    ordered = body + [named["seg1"], named["seg2"], named["seg3"]] + tail \
        + [named["color"]]
    return ordered, bns


def import_keras_weights(kmodel, model, input_shape, multitasking=True):
    """Return flax variables for `model` carrying kmodel's weights."""
    import jax.numpy as jnp  # noqa: F401

    conv_paths, bn_paths, variables = flax_layer_order(model, input_shape)
    kconvs, kbns = keras_layer_order(kmodel, multitasking)
    if len(conv_paths) != len(kconvs):
        raise ValueError(f"conv count mismatch: flax {len(conv_paths)} vs "
                         f"keras {len(kconvs)}")
    if len(bn_paths) != len(kbns):
        raise ValueError(f"BN count mismatch: flax {len(bn_paths)} vs "
                         f"keras {len(kbns)}")

    params = _to_mutable(variables["params"])
    stats = _to_mutable(variables["batch_stats"])

    for path, klayer in zip(conv_paths, kconvs):
        kernel, bias = klayer.get_weights()
        tgt = _walk(params, path)
        if tuple(tgt["kernel"].shape) != tuple(kernel.shape):
            raise ValueError(f"conv {path} <- {klayer.name}: shape "
                             f"{tgt['kernel'].shape} vs {kernel.shape}")
        tgt["kernel"] = jnp.asarray(kernel)
        tgt["bias"] = jnp.asarray(bias)

    for path, klayer in zip(bn_paths, kbns):
        gamma, beta, mean, var = klayer.get_weights()
        tgt = _walk(params, path)
        if tuple(tgt["scale"].shape) != tuple(gamma.shape):
            raise ValueError(f"bn {path} <- {klayer.name}: shape "
                             f"{tgt['scale'].shape} vs {gamma.shape}")
        tgt["scale"] = jnp.asarray(gamma)
        tgt["bias"] = jnp.asarray(beta)
        stgt = _walk(stats, path)
        stgt["mean"] = jnp.asarray(mean)
        stgt["var"] = jnp.asarray(var)

    return {"params": params, "batch_stats": stats}


def _to_mutable(tree):
    if hasattr(tree, "unfreeze"):
        tree = tree.unfreeze()
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def _walk(tree, path):
    node = tree
    for p in path:
        node = node[p]
    return node


def build_reference_model(patch_size=256, num_classes=5, channels=3,
                          multitasking=True, h5_path=None):
    """Build the reference Keras graph (imported from /root/reference) and
    optionally load trained weights from an .h5 checkpoint."""
    sys.path.insert(0, "/root/reference")
    from ResUnet_a.model2 import Resunet_a

    args = argparse.Namespace(multitasking=multitasking, use_dropout=False)
    net = Resunet_a((patch_size, patch_size, channels), num_classes, args)
    if h5_path:
        net.model.load_weights(h5_path)
    return net.model


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--h5", required=True, help="reference Keras .h5 weights")
    ap.add_argument("--out", required=True, help="orbax checkpoint output dir")
    ap.add_argument("--patch_size", type=int, default=256)
    ap.add_argument("--num_classes", type=int, default=5)
    ap.add_argument("--channels", type=int, default=3)
    ap.add_argument("--multitasking", default=True)
    a = ap.parse_args(argv)

    from resuneta_tpu.models import ResUnetA
    kmodel = build_reference_model(a.patch_size, a.num_classes, a.channels,
                                   a.multitasking, a.h5)
    model = ResUnetA(num_classes=a.num_classes, img_size=a.patch_size,
                     multitasking=a.multitasking)
    variables = import_keras_weights(
        kmodel, model, (1, a.patch_size, a.patch_size, a.channels),
        a.multitasking)

    import jax
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(a.out),
               jax.tree_util.tree_map(np.asarray, variables))
    ckptr.wait_until_finished()
    print(f"imported {a.h5} -> {a.out}")


if __name__ == "__main__":
    main()
