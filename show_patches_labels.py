#!/usr/bin/env python
"""Label-generation inspection tool (reference: show_patches_labels.py:249-280 —
per-patch grids of one-hot seg / boundary / distance channels + HSV color label).

Renders a num_classes x 4 grid per patch from a packed dataset (or synthetic data
with --synthetic), generating all label heads on-device with the production ops.
"""

import argparse
import os

import numpy as np


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", type=str, default=None,
                        help="packed dataset dir (manifest.json)")
    parser.add_argument("--synthetic", action="store_true",
                        help="use a synthetic patch instead of a dataset")
    parser.add_argument("--patch_index", type=int, default=0)
    parser.add_argument("--num_patches", type=int, default=1)
    parser.add_argument("--output_path", type=str, default="results/patch_labels")
    args = parser.parse_args(argv)

    plat = os.environ.get("RESUNETA_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)

    import jax
    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import cm

    from resuneta_tpu.ops.boundary import get_boundary_label
    from resuneta_tpu.ops.distance import get_distance_label
    from resuneta_tpu.ops.colorspace import hsv_color_label, hsv_to_rgb_cv2

    if args.synthetic or not args.dataset_path:
        rng = np.random.default_rng(0)
        ids = np.zeros((args.num_patches, 64, 64), np.uint8)
        ids[:, 16:40, 8:52] = 1
        ids[:, 44:60, 30:60] = 2
        images = rng.integers(0, 256, (args.num_patches, 64, 64, 3), np.uint8)
        num_classes = 5
    else:
        from resuneta_tpu.data import PackedDataset
        ds = PackedDataset(args.dataset_path)
        num_classes = ds.meta["num_classes"]
        sel = np.arange(args.patch_index, args.patch_index + args.num_patches)
        raw = ds.get_batch(sel)
        images, ids = raw["image_u8"], raw["label_ids"]

    @jax.jit
    def gen(onehot, img):
        return (get_boundary_label(onehot), get_distance_label(onehot),
                hsv_color_label(img, 1))

    os.makedirs(args.output_path, exist_ok=True)
    for k in range(len(images)):
        onehot = np.eye(num_classes, dtype=np.float32)[ids[k]]
        bound, dist, color = (np.asarray(a)
                              for a in gen(jnp.asarray(onehot), jnp.asarray(images[k])))
        fig, axes = plt.subplots(nrows=num_classes, ncols=4,
                                 figsize=(10, 2 * num_classes))
        for c in range(num_classes):
            axes[c, 0].imshow(onehot[:, :, c], cmap=cm.Greys_r)
            axes[c, 1].imshow(bound[:, :, c], cmap=cm.Greys_r)
            axes[c, 2].imshow(dist[:, :, c], cmap=cm.Greys_r)
            rgb = np.asarray(hsv_to_rgb_cv2(
                jnp.asarray(color * np.array([179, 255, 255], np.float32))))
            axes[c, 3].imshow(rgb.clip(0, 255).astype(np.uint8))
            axes[c, 0].set_ylabel(f"Class {c}")
        for title, ax in zip(["Seg", "Bound", "Dist", "Color->RGB"], axes[0]):
            ax.set_title(title)
        out = os.path.join(args.output_path, f"patch_{k}.png")
        plt.savefig(out)
        plt.close(fig)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
