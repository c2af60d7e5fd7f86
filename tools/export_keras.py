#!/usr/bin/env python
"""Flax -> Keras .h5 weight exporter for ResUnet-a d6 (VERDICT round-3 #9).

The reverse of tools/import_keras.py: writes a framework-trained checkpoint
into the reference Keras graph (ResUnet_a/model2.py:97-191, imported read-only
from /root/reference) and saves it as an .h5 the reference's own evaluation
CLI can consume directly (`load_model(model_path, compile=False)`,
/root/reference/test_ISPRS.py:276-279) — the cleanest demonstration that the
rebuild is a drop-in replacement: train here, evaluate there.

The layer mapping is the importer's, run in reverse (call-order pairing of
convs and BatchNorms, shape-checked per layer); round-trip parity is pinned by
tests/test_keras_import.py::TestExportRoundTrip.

Usage:
  python tools/export_keras.py --ckpt ckpt_dir --out best_model.h5 \
      [--patch_size 256] [--num_classes 5] [--weights_only False]

--weights_only True writes an HDF5 weights file (for load_weights); the
default writes the FULL legacy .h5 model (architecture + weights), which is
what test_ISPRS.py's load_model expects.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.import_keras import (build_reference_model, flax_layer_order,
                                keras_layer_order, _walk)


def export_keras_weights(variables, model, input_shape, kmodel,
                         multitasking=True):
    """Write `variables` ({'params', 'batch_stats'} for `model`) into the
    layers of the reference Keras graph `kmodel`, in place."""
    conv_paths, bn_paths, _ = flax_layer_order(model, input_shape)
    kconvs, kbns = keras_layer_order(kmodel, multitasking)
    if len(conv_paths) != len(kconvs):
        raise ValueError(f"conv count mismatch: flax {len(conv_paths)} vs "
                         f"keras {len(kconvs)}")
    if len(bn_paths) != len(kbns):
        raise ValueError(f"BN count mismatch: flax {len(bn_paths)} vs "
                         f"keras {len(kbns)}")

    params = variables["params"]
    stats = variables["batch_stats"]

    for path, klayer in zip(conv_paths, kconvs):
        src = _walk(params, path)
        kernel = np.asarray(src["kernel"], np.float32)
        bias = np.asarray(src["bias"], np.float32)
        kshape = tuple(klayer.get_weights()[0].shape)
        if kshape != kernel.shape:
            raise ValueError(f"conv {path} -> {klayer.name}: shape "
                             f"{kernel.shape} vs {kshape}")
        klayer.set_weights([kernel, bias])

    for path, klayer in zip(bn_paths, kbns):
        src = _walk(params, path)
        sstat = _walk(stats, path)
        klayer.set_weights([
            np.asarray(src["scale"], np.float32),
            np.asarray(src["bias"], np.float32),
            np.asarray(sstat["mean"], np.float32),
            np.asarray(sstat["var"], np.float32),
        ])
    return kmodel


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True,
                    help="orbax checkpoint dir ({'params','batch_stats'})")
    ap.add_argument("--out", required=True, help=".h5 output path")
    ap.add_argument("--patch_size", type=int, default=256)
    ap.add_argument("--num_classes", type=int, default=5)
    ap.add_argument("--channels", type=int, default=3)
    ap.add_argument("--multitasking", default="True",
                    choices=["True", "False"])
    ap.add_argument("--weights_only", default="False",
                    choices=["True", "False"])
    a = ap.parse_args(argv)
    multitasking = a.multitasking == "True"

    from resuneta_tpu.models import ResUnetA
    from resuneta_tpu.train.checkpoint import restore_variables

    model = ResUnetA(num_classes=a.num_classes, img_size=a.patch_size,
                     multitasking=multitasking)
    variables = restore_variables(os.path.abspath(a.ckpt))
    kmodel = build_reference_model(a.patch_size, a.num_classes, a.channels,
                                   multitasking)
    export_keras_weights(variables, model,
                         (1, a.patch_size, a.patch_size, a.channels), kmodel,
                         multitasking)
    out = os.path.abspath(a.out)
    if a.weights_only == "True":
        kmodel.save_weights(out)
    else:
        kmodel.save(out)  # legacy full-model HDF5: test_ISPRS.py load_model
    print(f"exported {a.ckpt} -> {out}")


if __name__ == "__main__":
    main()
