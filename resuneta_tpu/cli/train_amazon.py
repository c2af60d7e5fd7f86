"""Amazon deforestation training CLI — the runnable, repaired equivalent of
amazon_py/main.py (whose committed form mixes working and stale code; SURVEY.md §2).

Flow (amazon_py/main.py:8-169): load two 7-band year rasters (npy, CHW) -> concat
to 14 channels -> whole-image normalization -> 3-class mask with buffer-2 dilation
(mask_no_considered) -> 15-tile grid with hand-picked train/val ids -> per-tile
patch extraction + >=percent% deforestation balance filter + x5 augmentation ->
weighted-CE training (weights [0.5, 0.5, 0]) with early stopping + best checkpoint
-> whole-scene prediction with area opening + masking -> metrics + alarm area.
"""

import argparse
import os
import time

import numpy as np

from ..utils.cli import str2bool, setup_platform


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset_path", type=str, default="./DATASETS/Amazon_npy")
    parser.add_argument("--image_t1", type=str, default="clipped_raster_004_66_2018.npy")
    parser.add_argument("--image_t2", type=str, default="clipped_raster_004_66_2019.npy")
    parser.add_argument("--reference", type=str,
                        default="labels/binary_clipped_2019.npy")
    parser.add_argument("--past_reference", type=str, nargs="*",
                        default=["labels/binary_clipped_2013_2018.npy",
                                 "labels/binary_clipped_1988_2012.npy"])
    parser.add_argument("--resunet_a", type=str2bool, default=False)
    parser.add_argument("--multitasking", type=str2bool, default=False)
    parser.add_argument("-rp", "--results_path", type=str, default="./results/amazon_run1")
    parser.add_argument("-bs", "--batch_size", type=int, default=8)
    parser.add_argument("-lr", "--learning_rate", type=float, default=1e-4)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("-ps", "--patch_size", type=int, default=128)
    parser.add_argument("--stride", type=int, default=None,
                        help="default: patch_size // 8 (main.py:78)")
    parser.add_argument("--percent", type=float, default=5.0,
                        help="min %% deforestation per kept patch")
    parser.add_argument("--buffer", type=int, default=2)
    parser.add_argument("--area", type=int, default=11,
                        help="area-opening threshold at eval (main.py:143)")
    parser.add_argument("--num_classes", type=int, default=3)
    parser.add_argument("--train_tiles", type=int, nargs="*", default=[1, 6, 7, 13])
    parser.add_argument("--val_tiles", type=int, nargs="*", default=[5, 12])
    parser.add_argument("--test_tiles", type=int, nargs="*",
                        default=[2, 3, 4, 8, 9, 10, 11, 14, 15])
    parser.add_argument("--norm_type", type=int, default=1, choices=[1, 2, 3],
                        help="whole-image normalization (utils.py:242-253 numbering)")
    parser.add_argument("--class_weights", type=float, nargs="*", default=[0.5, 0.5, 0.0])
    parser.add_argument("--gpu_parallel", type=str2bool, default=False)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--skip_eval", type=str2bool, default=False)
    parser.add_argument("--preprocessed_path", type=str, default=None,
                        help="dataset dir written by preprocess_save_patches_Amazon"
                             " (train/val splits + manifest); skips scene loading "
                             "for training (whole-scene eval still needs rasters)")
    parser.add_argument("--use_tiles", type=str2bool, default=True,
                        help="False = whole-scene strided extraction with the valid"
                             "-footprint filter instead of the 15-tile split (the "
                             "main2_no_tiles.py variant)")
    parser.add_argument("--mask_ref", type=str, default=None,
                        help="valid-footprint mask npy (used when --use_tiles False)")
    return parser


def load_amazon_scene(args):
    """Load + concat rasters, build the 3-class final mask and tile grid."""
    import jax.numpy as jnp
    from ..data.isprs import load_npy_image
    from ..ops.normalize import normalization
    from ..ops.morphology import mask_no_considered
    from ..data.amazon import make_tile_mask

    root = args.dataset_path
    img_t1 = load_npy_image(os.path.join(root, args.image_t1)).astype(np.float32)
    img_t2 = load_npy_image(os.path.join(root, args.image_t2)).astype(np.float32)
    if img_t1.ndim == 3 and img_t1.shape[0] < img_t1.shape[-1]:
        img_t1 = img_t1.transpose((1, 2, 0))
        img_t2 = img_t2.transpose((1, 2, 0))
    image_array = np.concatenate((img_t1, img_t2), axis=-1).astype(np.float32)
    image_array = np.asarray(normalization(jnp.asarray(image_array), args.norm_type))

    image_ref = load_npy_image(os.path.join(root, args.reference))
    past = None
    for p in args.past_reference:
        arr = load_npy_image(os.path.join(root, p))
        past = arr if past is None else past + arr
    if past is None:
        past = np.zeros_like(image_ref)

    H = min(image_array.shape[0], image_ref.shape[0], past.shape[0])
    W = min(image_array.shape[1], image_ref.shape[1], past.shape[1])
    image_array, image_ref, past = (
        image_array[:H, :W], image_ref[:H, :W], past[:H, :W])

    final_mask = mask_no_considered(image_ref, args.buffer, past)
    mask_tiles = make_tile_mask(H, W)
    return image_array, image_ref, final_mask, mask_tiles


def main(argv=None):
    setup_platform()
    args = build_parser().parse_args(argv)
    stride = args.stride or args.patch_size // 8

    import jax
    from ..models import ResUnetA, UNet
    from ..losses import weighted_categorical_crossentropy
    from ..train import (create_train_state, make_train_step, make_eval_step,
                         train_model, TrainConfig)
    from ..data import ArrayDataset, make_label_head_pipeline
    from ..data.amazon import patch_tiles, bal_aug_patches
    from ..parallel import make_mesh
    from ..metrics import compute_metrics, confusion_matrix
    from ..infer.amazon import prediction

    def to_ds(p, r):
        onehot = np.eye(args.num_classes, dtype=np.float32)[np.asarray(r, np.int64)]
        if p.dtype != np.float32:
            p = p.astype(np.float32)  # keeps float32 memmaps lazy
        return ArrayDataset({"image": p, "seg": onehot})

    if args.preprocessed_path:
        import json
        root = args.preprocessed_path
        with open(os.path.join(root, "manifest.json")) as f:
            manifest = json.load(f)
        args.class_weights = manifest.get("class_weights", args.class_weights)
        train_ds = to_ds(np.load(os.path.join(root, "train_images.npy"),
                                 mmap_mode="r"),
                         np.load(os.path.join(root, "train_labels.npy")))
        val_ds = to_ds(np.load(os.path.join(root, "val_images.npy"), mmap_mode="r"),
                       np.load(os.path.join(root, "val_labels.npy")))
        channels = manifest["channels"]
        args.skip_eval = True  # whole-scene eval needs the rasters
        image_array = image_ref = final_mask = mask_tiles = None
    else:
        image_array, image_ref, final_mask, mask_tiles = load_amazon_scene(args)
        H, W, channels = image_array.shape
        print(f"Input image shape: {image_array.shape}")

    if args.preprocessed_path:
        pass
    elif args.use_tiles:
        def build_split(tiles):
            p, r = patch_tiles(tiles, mask_tiles, image_array, final_mask,
                               args.patch_size, stride)
            p, r = bal_aug_patches(args.percent, args.patch_size, p, r)
            return to_ds(p, r)

        train_ds = build_split(args.train_tiles)
        val_ds = build_split(args.val_tiles)
    else:
        # main2_no_tiles.py variant: whole-scene strided extraction gated on the
        # valid satellite footprint, then an 80/20 split
        from sklearn.model_selection import train_test_split
        from ..data.amazon import extract_patches_right_region, bal_aug_patches2
        from ..data.isprs import load_npy_image

        if args.mask_ref:
            mask_valid = load_npy_image(
                os.path.join(args.dataset_path, args.mask_ref))[:image_ref.shape[0],
                                                                :image_ref.shape[1]]
        else:
            mask_valid = np.full_like(image_ref, -1, np.float64)
        p, r = extract_patches_right_region(
            image_array, final_mask, mask_valid, args.patch_size, stride,
            args.percent)
        p, r = bal_aug_patches2(args.percent, args.patch_size,
                                np.asarray(p), np.asarray(r))
        idx = np.arange(len(p))
        tr, va = train_test_split(idx, test_size=0.2, random_state=42)
        train_ds, val_ds = to_ds(p[tr], r[tr]), to_ds(p[va], r[va])
    print(f"Training patches: {len(train_ds)}  Validation patches: {len(val_ds)}")

    multitasking = bool(args.multitasking and args.resunet_a)
    if args.resunet_a:
        # Multitask on Amazon (main_mabel_resuneta.py:152-201, repaired): bound/
        # dist heads trained against labels derived on-device from the one-hot
        # reference; no color head — HSV is undefined for 14-channel input.
        model = ResUnetA(num_classes=args.num_classes, img_size=args.patch_size,
                         multitasking=multitasking, color_head=False)
    else:
        model = UNet(num_classes=args.num_classes)
    state = create_train_state(
        model, jax.random.PRNGKey(args.seed),
        (args.batch_size, args.patch_size, args.patch_size, channels),
        "adam", args.learning_rate)

    wce = weighted_categorical_crossentropy(args.class_weights)
    if multitasking:
        # the reference compiles the same wce for every head with weight 1.0
        # (main_mabel_resuneta.py:195-201)
        loss_fns = {"seg": wce, "bound": wce, "dist": wce}
        loss_weights = {"seg": 1.0, "bound": 1.0, "dist": 1.0}
        preprocess = make_label_head_pipeline()
    else:
        loss_fns = {"seg": wce}
        loss_weights = {}
        preprocess = None
    mesh = make_mesh() if args.gpu_parallel and jax.device_count() > 1 else None
    # pure-dp mesh -> shard_map step with the fused kernels live (steps.py)
    train_step = make_train_step(loss_fns, loss_weights, multitasking=multitasking,
                                 preprocess=preprocess, mesh=mesh)
    eval_step = make_eval_step(loss_fns, loss_weights, multitasking=multitasking,
                               preprocess=preprocess, mesh=mesh)

    config = TrainConfig(results_path=args.results_path,
                         batch_size=args.batch_size, epochs=args.epochs,
                         multitasking=multitasking, patience=10, delta=1e-4,
                         seed=args.seed)
    t0 = time.time()
    state, history = train_model(config, state, train_step, eval_step,
                                 train_ds, val_ds, mesh=mesh)
    train_time = time.time() - t0
    print("training time", train_time)

    if args.skip_eval:
        return state, history

    # ---------- whole-scene evaluation on the test tiles ----------
    mask_ts = np.zeros_like(mask_tiles, np.float32)
    for t in args.test_tiles:
        mask_ts[mask_tiles == t] = 1

    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def apply_fn(x):
        return model.apply(variables, x, train=False)

    (ref_final, pre_final, prob_rec, ref_rec, ref_clip, clip_mask,
     time_ts) = prediction(apply_fn, image_array, image_ref, final_mask,
                           mask_ts, args.patch_size, args.area, mesh=mesh)

    cm = confusion_matrix(ref_final, pre_final)
    metrics = compute_metrics(ref_final, pre_final)
    print("Confusion  matrix \n", cm)
    print("Accuracy: ", metrics[0])
    print("F1score: ", metrics[1])
    print("Recall: ", metrics[2])
    print("Precision: ", metrics[3])
    if cm.shape[0] > 1:
        total = (cm[1, 1] + cm[0, 1]) / len(ref_final) * 100
        print("Area to be analyzed", total)
    print("test time", time_ts)

    np.save(os.path.join(args.results_path, "prob_reconstructed.npy"), prob_rec)
    return state, history


if __name__ == "__main__":
    main()
