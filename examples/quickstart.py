#!/usr/bin/env python
"""End-to-end quickstart on synthetic data: build a scene, preprocess to the
packed format, train multitask ResUnet-a for a few epochs, and run whole-scene
inference — the full reference workflow (README.md:5-21) in one script.

Run on CPU:  RESUNETA_PLATFORM=cpu python examples/quickstart.py
Run on TPU:  python examples/quickstart.py
"""

import os
import tempfile

import numpy as np


def main():
    plat = os.environ.get("RESUNETA_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    from resuneta_tpu.data.isprs import LABEL_DICT, class_ids_to_rgb
    from resuneta_tpu.cli.preprocess_isprs import main as preprocess
    from resuneta_tpu.cli.train_isprs import main as train
    from resuneta_tpu.cli.test_isprs import main as test

    work = tempfile.mkdtemp(prefix="resuneta_quickstart_")
    print(f"workdir: {work}")
    scene_dir = os.path.join(work, "ISPRS_npy")
    os.makedirs(scene_dir)

    # --- synthetic ISPRS-style scene: colored rectangles per class ---
    rng = np.random.default_rng(0)
    H = W = 256
    ids = np.zeros((H, W), np.uint8)
    for k in range(1, 5):
        for _ in range(6):
            r0, c0 = rng.integers(0, H - 16, 2)
            dh, dw = rng.integers(10, 60, 2)
            ids[r0:min(r0 + dh, H), c0:min(c0 + dw, W)] = k
    image = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
    for k in range(5):
        image[ids == k] = (40 * k + 20, (60 * k + 35) % 256, (90 * k + 70) % 256)
    for split in ("Train", "Test"):
        np.save(os.path.join(scene_dir, f"Image_{split}.npy"),
                image.transpose(2, 0, 1))
        np.save(os.path.join(scene_dir, f"Reference_{split}.npy"),
                class_ids_to_rgb(ids, LABEL_DICT).transpose(2, 0, 1))

    ds = os.path.join(work, "patches")
    preprocess(["--patch_size", "64", "--stride", "32",
                "--dataset_path", scene_dir, "--output_path", ds])

    results = os.path.join(work, "results")
    train(["--resunet_a", "True", "--multitasking", "True", "--loss", "tanimoto",
           "-dp", ds, "-rp", results, "-bs", "8", "-lr", "1e-4",
           "--epochs", "3", "-ps", "64"])

    test(["--model_path", os.path.join(results, "best_model.ckpt"),
          "--dataset_path", scene_dir, "-ps", "64", "--use_multitasking",
          "--output_path", os.path.join(work, "preds"), "--max_viz_patches", "2"])
    print(f"\nDone. Outputs in {work}/preds")


if __name__ == "__main__":
    main()
