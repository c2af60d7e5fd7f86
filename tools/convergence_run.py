#!/usr/bin/env python
"""Long synthetic convergence run: the quality-parity anchor obtainable
without the ISPRS rasters.

The reference's quality anchor is a full training run reaching 73.578% accuracy
on Potsdam (/root/reference/infos_training_train_on_batch.txt:65-89). Real
rasters are not available in this environment, so this tool demonstrates the
next-strongest property: the PRODUCTION train step (uint8 batch -> on-device
augmentation + multitask label generation -> fwd/bwd -> Adam, one XLA program)
trains the flagship ResUnet-a d6 to high held-out quality on a learnable
synthetic world, measured with the BASELINE.md gate metric (mIoU) in eval mode
(running statistics), on patches from scenes never seen in training.

Run (TPU): python tools/convergence_run.py
Env knobs: CONV_STEPS (default 600), CONV_PS (256), CONV_BS (16),
           CONV_MIOU_FLOOR (0.95 exit gate), CONV_CLASS_IOU_FLOOR (0.90
           per-class exit gate), CONV_SEEDS ("0,1" — comma-separated world/
           init seeds, each gated independently).
Prints one JSON line per seed + a summary line; exits nonzero if ANY seed
misses either floor.

Gate calibration (round 4): round 3 measured val mIoU 0.9844 (per-class
[0.997, 0.984, 0.971, 0.982, 0.988]) at the default config; a second seed
measured the same regime (see BENCH_NOTES.md round 4 for both rows). The
floors are set ~3 points under the observed band so a catastrophic numerics
regression (label-gen, BN, loss sign) fails the gate while seed-to-seed
variance (~1-2 points) does not.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np


def make_world(height, width, num_classes, seed):
    """A learnable ISPRS-like scene: per-class base colors + per-pixel noise +
    a smooth illumination field. Class regions are overlapping rectangles and
    disks (same family as util_synth.synth_scene, but the image is CORRELATED
    with the classes so segmentation is learnable while noise + illumination
    keep it from being a trivial color lookup)."""
    rng = np.random.default_rng(seed)
    ids = np.zeros((height, width), np.uint8)
    yy, xx = np.mgrid[0:height, 0:width]
    # interleave class placement so later classes don't simply bury earlier
    # ones; ~25 shapes/class leaves every class (incl. background 0) with a
    # two-digit pixel share
    order = [(k, j) for j in range(25) for k in range(1, num_classes)]
    rng.shuffle(order)
    for k, _ in order:
        if rng.random() < 0.5:
            r0 = rng.integers(0, height - 16)
            c0 = rng.integers(0, width - 16)
            dh, dw = rng.integers(24, 140, 2)
            ids[r0:min(r0 + dh, height), c0:min(c0 + dw, width)] = k
        else:
            cy = rng.integers(0, height)
            cx = rng.integers(0, width)
            rad = rng.integers(16, 72)
            ids[(yy - cy) ** 2 + (xx - cx) ** 2 < rad ** 2] = k
    # class palette is GLOBAL (fixed seed), not per-scene: the learnable
    # signal must generalize from the training scenes to the held-out one;
    # per-scene variation comes from layout, illumination and pixel noise
    base = np.random.default_rng(1234).integers(
        40, 216, (num_classes, 3)).astype(np.float32)
    img = base[ids]
    # smooth illumination field (low-frequency sinusoids) + pixel noise
    illum = (20 * np.sin(2 * np.pi * yy / rng.integers(200, 400))
             + 20 * np.cos(2 * np.pi * xx / rng.integers(200, 400)))
    img += illum[..., None] + rng.normal(0, 25, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8), ids


def run_seed(seed, steps, ps, bs, floor, class_floor):
    import jax
    import jax.numpy as jnp
    from resuneta_tpu.models import ResUnetA
    from resuneta_tpu.losses import make_losses
    from resuneta_tpu.train import create_train_state, make_train_step
    from resuneta_tpu.data import make_device_pipeline
    from resuneta_tpu.metrics import mean_iou
    from resuneta_tpu.ops.patches import extract_patches
    from resuneta_tpu.infer import predict_patches, make_seg_ids_fn

    nc = 5
    rng = np.random.default_rng(seed)

    # 3 training scenes, 1 held-out scene from the same world distribution
    train_x, train_y = [], []
    for s in range(3):
        img, ids = make_world(1024, 1024, nc, seed * 10 + s)
        xs, ys = extract_patches(img, ids, ps, ps // 2)
        train_x.append(xs)
        train_y.append(ys)
    train_x = np.concatenate(train_x)
    train_y = np.concatenate(train_y)
    val_img, val_ids = make_world(1024, 1024, nc, seed * 10 + 7)
    val_x, val_y = extract_patches(val_img, val_ids, ps, ps)
    val_y = val_y.astype(np.int64)
    print(f"# train patches: {len(train_x)}, val patches: {len(val_x)}",
          file=sys.stderr)

    model = ResUnetA(num_classes=nc, img_size=ps, multitasking=True,
                     dtype=jnp.bfloat16)
    state = create_train_state(model, jax.random.PRNGKey(seed),
                               (1, ps, ps, 3), "adam", 1e-4)
    pipeline = make_device_pipeline(nc, norm_type=1, multitasking=True)
    step = make_train_step(
        make_losses("tanimoto"),
        {"seg": 1.0, "bound": 1.0, "dist": 1.0, "color": 1.0},
        multitasking=True, preprocess=pipeline)

    t0 = time.perf_counter()
    t_first = None
    for i in range(steps):
        sel = rng.choice(len(train_x), bs, replace=False)
        batch = {
            "image_u8": jnp.asarray(train_x[sel]),
            "label_ids": jnp.asarray(train_y[sel]),
            "aug": jnp.asarray(rng.integers(0, 5, bs).astype(np.int32)),
        }
        state, row = step(state, batch)
        if i == 0:
            np.asarray(row)  # fence the compile out of the throughput figure
            t_first = time.perf_counter()
        if (i + 1) % 100 == 0:
            r = np.asarray(row)
            print(f"# step {i + 1}: loss={r[0]:.4f} seg_acc={r[5]:.4f}",
                  file=sys.stderr)
    r = np.asarray(row)  # fence
    train_secs = time.perf_counter() - t_first
    pps = bs * (steps - 1) / train_secs if steps > 1 else float("nan")

    # held-out eval, eval-mode BN (running statistics), via the production
    # inference engine (jitted, tail-batch padding, on-device argmax)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    ids_fn = make_seg_ids_fn(model, variables, multitask=True, norm_type=1)
    pred_ids = predict_patches(ids_fn, val_x, batch_size=bs)
    miou, per_class = mean_iou(val_y.ravel(), pred_ids.ravel(),
                               labels=list(range(nc)))
    acc = float((pred_ids == val_y).mean())

    ok = bool(miou >= floor and min(float(v) for v in per_class) >= class_floor)
    result = {
        "seed": seed,
        "steps": steps, "patch_size": ps, "batch_size": bs,
        "train_patches_per_sec": round(pps, 2),
        "final_train_seg_acc": round(float(r[5]), 4),
        "val_miou": round(float(miou), 4),
        "val_iou_per_class": [round(float(v), 4) for v in per_class],
        "val_acc": round(acc, 4),
        "miou_floor": floor,
        "class_iou_floor": class_floor,
        "pass": ok,
    }
    print(json.dumps(result))
    return result


def main():
    steps = int(os.environ.get("CONV_STEPS", 600))
    ps = int(os.environ.get("CONV_PS", 256))
    bs = int(os.environ.get("CONV_BS", 16))
    floor = float(os.environ.get("CONV_MIOU_FLOOR", 0.95))
    class_floor = float(os.environ.get("CONV_CLASS_IOU_FLOOR", 0.90))
    # legacy single-seed knob still honored when CONV_SEEDS is unset
    default_seeds = os.environ.get("CONV_SEED", "0,1")
    seeds = [int(s) for s in
             os.environ.get("CONV_SEEDS", default_seeds).split(",")]
    results = [run_seed(s, steps, ps, bs, floor, class_floor) for s in seeds]
    summary = {
        "seeds": seeds,
        "val_mious": [r["val_miou"] for r in results],
        "pass": all(r["pass"] for r in results),
    }
    print(json.dumps(summary))
    sys.exit(0 if summary["pass"] else 1)


if __name__ == "__main__":
    main()
