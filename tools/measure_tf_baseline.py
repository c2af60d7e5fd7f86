#!/usr/bin/env python
"""Measure the REFERENCE framework's actual training step on the installed TF.

Runs the reference's own code (imported read-only from /root/reference — nothing is
copied) in the closest runnable configuration: the real Keras graph built by
ResUnet_a/model2.py, compiled with the reference's Tanimoto_dual_loss and metrics
(train_ISPRS.py:418-453), driven exactly like the reference hot loop
(train_ISPRS.py:115-148): per-sample np.load of image + 4 label tensors from disk,
then `model.train_on_batch`. Default batch_size=4 (train_ISPRS.py:314-315).

This machine has no CUDA GPU, so the number is a measured CPU anchor. bench.py's
`vs_baseline` derivation from this measurement is documented in BENCH_NOTES.md.

Usage: python tools/measure_tf_baseline.py [--batch_size 4] [--steps 5] [--patch 256]
Prints one JSON line with patches/sec.
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--patch", type=int, default=256)
    ap.add_argument("--num_classes", type=int, default=5)
    a = ap.parse_args()

    sys.path.insert(0, "/root/reference")
    import tensorflow as tf
    from ResUnet_a.model2 import Resunet_a
    from multitasking_utils import Tanimoto_dual_loss

    args = argparse.Namespace(multitasking=True, use_dropout=False)
    net = Resunet_a((a.patch, a.patch, 3), a.num_classes, args)
    model = net.model
    print(f"# reference model params: {model.count_params()}", file=sys.stderr)

    # train_ISPRS.py:404-405 Adam(lr=..., beta_1=0.9); Keras 3 spells it
    # learning_rate — the only shim needed to run the reference graph today.
    optm = tf.keras.optimizers.Adam(learning_rate=1e-3, beta_1=0.9)
    losses = {"seg": Tanimoto_dual_loss(), "bound": Tanimoto_dual_loss(),
              "dist": Tanimoto_dual_loss(), "color": Tanimoto_dual_loss()}
    loss_weights = {"seg": 1.0, "bound": 1.0, "dist": 1.0, "color": 1.0}
    metrics_dict = {"seg": ["accuracy", tf.keras.metrics.TruePositives(),
                            tf.keras.metrics.FalsePositives(),
                            tf.keras.metrics.TrueNegatives(),
                            tf.keras.metrics.FalseNegatives()]}
    model.compile(optimizer=optm, loss=losses, loss_weights=loss_weights,
                  metrics=metrics_dict)

    # The reference's disk layout: one .npy per patch per tensor
    # (train_ISPRS.py:122-128 / 137-141) — 5 serial np.load per sample.
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="tf_baseline_")
    ps, nc, bs = a.patch, a.num_classes, a.batch_size
    paths = {}
    onehot = np.eye(nc, dtype=np.float32)[
        rng.integers(0, nc, (ps, ps))]
    for name, arr in (
        ("img", rng.random((ps, ps, 3), dtype=np.float32)),
        ("seg", onehot),
        ("bound", onehot.copy()),
        ("dist", rng.random((ps, ps, nc), dtype=np.float32)),
        ("color", rng.random((ps, ps, 3), dtype=np.float32)),
    ):
        p = os.path.join(tmp, f"{name}.npy")
        np.save(p, arr)
        paths[name] = p

    x_b = np.zeros((bs, ps, ps, 3), np.float32)
    y_seg = np.zeros((bs, ps, ps, nc), np.float32)
    y_bound = np.zeros((bs, ps, ps, nc), np.float32)
    y_dist = np.zeros((bs, ps, ps, nc), np.float32)
    y_color = np.zeros((bs, ps, ps, 3), np.float32)

    def step():
        for b in range(bs):  # serial per-sample loads, as the reference does
            x_b[b] = np.load(paths["img"])
            y_seg[b] = np.load(paths["seg"]).astype(np.float32)
            y_bound[b] = np.load(paths["bound"]).astype(np.float32)
            y_dist[b] = np.load(paths["dist"]).astype(np.float32)
            y_color[b] = np.load(paths["color"]).astype(np.float32)
        y = {"seg": y_seg, "bound": y_bound, "dist": y_dist, "color": y_color}
        return model.train_on_batch(x=x_b, y=y, return_dict=False)

    for _ in range(a.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(a.steps):
        step()
    dt = time.perf_counter() - t0

    pps = bs * a.steps / dt
    print(json.dumps({
        "metric": f"reference TF train patches/sec (CPU, {ps}px multitask bs{bs})",
        "value": round(pps, 3),
        "unit": "patches/s",
        "sec_per_step": round(dt / a.steps, 3),
        "tf": tf.__version__,
    }))


if __name__ == "__main__":
    main()
