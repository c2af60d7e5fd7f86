"""ISPRS inference/eval CLI — argument contract of test_ISPRS.py:215-236:
--use_multitasking (store_true), --model_path, --dataset_path, -ps, --norm_type,
--num_classes, --output_path.

Flow parity (test_ISPRS.py:238-415): load test image + RGB reference, normalize
(norm_type 3 fits the scaler on the CHW test image itself, like the reference),
non-overlapping chop, batched jitted prediction (the reference predicts with
batch_size=1; we batch — same outputs, SURVEY.md §5), sklearn-parity metrics +
confusion matrix, whole-image reconstruction, RGB render, and the multitask
per-class/per-task prediction grids + HSV color render.
"""

import argparse
import os

import numpy as np

from ..utils.cli import setup_platform, str2bool


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--use_multitasking", help="Choose resunet-a model or not",
                        action="store_true")
    parser.add_argument("--model_path", help="Model's checkpoint filepath",
                        type=str, required=True)
    parser.add_argument("--dataset_path", help="Dataset directory path",
                        type=str, required=True)
    parser.add_argument("-ps", "--patch_size",
                        help="Size of Patches extracted from image and reference",
                        type=int, default=256)
    parser.add_argument("--norm_type", choices=[1, 2, 3],
                        help="Types of normalization. Be sure to select the same type"
                             " used in your training. 1 --> [0,1]; 2 --> [-1,1]; "
                             "3 --> StandardScaler() from scikit",
                        type=int, default=1)
    parser.add_argument("--num_classes", help="Number of classes", type=int, default=5)
    parser.add_argument("--output_path", help="Path to where save predictions",
                        type=str, default="results/preds_run")
    # TPU-build extensions
    parser.add_argument("--batch_size", type=int, default=32,
                        help="Inference batch size (reference used 1)")
    parser.add_argument("--resunet_a", default=True, type=str2bool,
                        help="Model family of the checkpoint")
    parser.add_argument("--max_viz_patches", type=int, default=8,
                        help="Cap on per-patch visualization grids")
    parser.add_argument("--overlap_stride", type=int, default=None,
                        help="Overlap-averaged reconstruction: window stride "
                             "< patch_size averages softmax probabilities over "
                             "all windows covering a pixel (quality option "
                             "beyond the reference's non-overlap chop)")
    return parser


def main(argv=None):
    setup_platform()
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..models import ResUnetA, UNet
    from ..train import create_train_state, checkpoint
    from ..infer import predict_patches
    from ..metrics import compute_metrics, confusion_matrix, iou_per_class
    from ..ops.normalize import normalize_rgb, normalization
    from ..ops.patches import extract_patches_nonoverlap, reconstruct_from_patches
    from ..data.isprs import LABEL_DICT, binarize_matrix, class_ids_to_rgb, \
        load_npy_image

    root_path = args.dataset_path

    img_test = load_npy_image(
        os.path.join(root_path, "Image_Test.npy")).astype(np.float32)
    if args.norm_type == 3:
        # reference quirk: whole-image scaler fit on the CHW array (test_ISPRS.py:246)
        img_test_normalized = np.asarray(normalization(jnp.asarray(img_test), 1))
    else:
        img_test_normalized = np.asarray(
            normalize_rgb(jnp.asarray(img_test), args.norm_type))
    img_test_normalized = img_test_normalized.transpose((1, 2, 0))
    print(img_test_normalized.shape)

    img_test_ref = load_npy_image(os.path.join(root_path, "Reference_Test.npy"))
    img_test_ref = img_test_ref.transpose((1, 2, 0))
    print(img_test_ref.shape)

    binary_ref = binarize_matrix(img_test_ref, LABEL_DICT)

    patches_test = extract_patches_nonoverlap(
        img_test_normalized, args.patch_size).astype(np.float32)
    patches_test_ref = extract_patches_nonoverlap(binary_ref, args.patch_size)
    print(patches_test.shape)

    # ---------- model + checkpoint ----------
    if args.resunet_a:
        model = ResUnetA(num_classes=args.num_classes, img_size=args.patch_size,
                         multitasking=args.use_multitasking)
    else:
        model = UNet(num_classes=args.num_classes)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (1, args.patch_size, args.patch_size, patches_test.shape[-1]))
    state, _ = checkpoint.restore(args.model_path, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def apply_fn(x):
        return model.apply(variables, x, train=False)

    preds = predict_patches(apply_fn, patches_test, batch_size=args.batch_size)
    print("=" * 40)
    print("[TEST]")

    if args.use_multitasking:
        seg_pred = np.argmax(preds["seg"], axis=-1)
        patches_pred = [preds["seg"], preds["bound"], preds["dist"], preds["color"]]
    else:
        seg_pred = np.argmax(preds, axis=-1)

    true_labels = patches_test_ref.reshape(-1)
    predicted_labels = seg_pred.reshape(-1)

    metrics = compute_metrics(true_labels, predicted_labels)
    cm = confusion_matrix(true_labels, predicted_labels)
    print("Confusion  matrix \n", cm)
    print()
    print("Accuracy: ", metrics[0])
    print("F1score: ", metrics[1])
    print("Recall: ", metrics[2])
    print("Precision: ", metrics[3])
    # BASELINE.md quality gate: segmentation mIoU (per-class Jaccard from the
    # same confusion matrix the reference prints at test_ISPRS.py:304-314)
    ious = iou_per_class(cm)
    print("IoU per class: ", 100.0 * ious)
    print("mIoU: ", 100.0 * ious.mean())

    H, W = binary_ref.shape
    if args.overlap_stride and args.overlap_stride < args.patch_size:
        from ..infer.sliding import predict_scene_overlap
        img_reconstructed, _ = predict_scene_overlap(
            apply_fn, img_test_normalized, args.patch_size,
            stride=args.overlap_stride, batch_size=args.batch_size,
            multitask=args.use_multitasking)
        print(f"[overlap-averaged reconstruction, stride={args.overlap_stride}]")
    else:
        img_reconstructed = reconstruct_from_patches(seg_pred, H, W, order="row")
    img_rgb = class_ids_to_rgb(img_reconstructed, LABEL_DICT)

    os.makedirs(args.output_path, exist_ok=True)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.imsave(os.path.join(args.output_path, "pred_seg_reconstructed.jpeg"),
                   img_rgb)
    except ImportError:
        from PIL import Image
        Image.fromarray(img_rgb).save(
            os.path.join(args.output_path, "pred_seg_reconstructed.jpeg"))

    if args.use_multitasking:
        _save_multitask_viz(args, patches_test, patches_test_ref, patches_pred)

    return metrics, cm


def _save_multitask_viz(args, patches_test, patches_test_ref, patches_pred):
    """Per-class/per-task grids + HSV color render (test_ISPRS.py:336-415)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import cm as colormaps
    import jax
    import jax.numpy as jnp

    from ..ops.boundary import get_boundary_label
    from ..ops.distance import get_distance_label
    from ..ops.colorspace import hsv_to_rgb_cv2

    n = min(len(patches_test), args.max_viz_patches)
    gen = jax.jit(lambda oh: (get_boundary_label(oh), get_distance_label(oh)))

    for i in range(n):
        fig1, axes = plt.subplots(nrows=args.num_classes, ncols=7, figsize=(15, 10))
        img = (patches_test[i] * 255).clip(0, 255).astype(np.uint8)
        img_ref = patches_test_ref[i]
        img_ref_h = np.eye(args.num_classes, dtype=np.float32)[
            img_ref.astype(np.int64) % args.num_classes]
        bound_ref_h, dist_ref_h = (np.asarray(a) for a in gen(jnp.asarray(img_ref_h)))

        for n_class in range(args.num_classes):
            axes[n_class, 0].imshow(img)
            for task in range(len(patches_pred) - 1):
                task_pred = patches_pred[task]
                col_ref = (task + 1) * 2
                axes[n_class, col_ref].imshow(task_pred[i, :, :, n_class],
                                              cmap=colormaps.Greys_r)
                col = col_ref - 1
                ref_map = (img_ref_h, bound_ref_h, dist_ref_h)[task]
                axes[n_class, col].imshow(ref_map[:, :, n_class],
                                          cmap=colormaps.Greys_r)
        for title, ax in zip(
            ["Patch", "Seg Ref", "Seg Pred", "Bound Ref", "Bound Pred",
             "Dist Ref", "Dist Pred"], axes[0]):
            ax.set_title(title)
        for n_class in range(args.num_classes):
            axes[n_class, 0].set_ylabel(f"Class {n_class}")
        plt.savefig(os.path.join(args.output_path, f"pred{i}_classes.jpg"))
        plt.close(fig1)

        # Color head: normalized HSV -> RGB render (test_ISPRS.py:390-414)
        fig2, (ax1, ax2, ax3) = plt.subplots(nrows=1, ncols=3, figsize=(10, 5))
        ax1.set_title("Original")
        ax1.imshow(img)
        hsv_pred = patches_pred[3][i]
        hsv_patch = (hsv_pred * np.array([179, 255, 255])).astype(np.uint8)
        rgb_patch = np.asarray(
            hsv_to_rgb_cv2(jnp.asarray(hsv_patch))).clip(0, 255).astype(np.uint8)
        ax2.set_title("Pred HSV in RGB")
        ax2.imshow(rgb_patch)
        ax3.set_title("Difference between both")
        from ..ops.colorspace import rgb_to_hsv_cv2
        hsv_label = np.asarray(rgb_to_hsv_cv2(jnp.asarray(img)))
        diff = np.mean(hsv_patch.astype(np.float32) - hsv_label, axis=-1)
        rng = diff.max() - diff.min()
        diff = 2 * (diff - diff.min()) / (rng if rng else 1.0) - 1.0
        ax3.imshow(diff, cmap=colormaps.Greys_r)
        plt.savefig(os.path.join(args.output_path, f"pred{i}_color.jpg"))
        plt.close(fig2)


if __name__ == "__main__":
    main()
