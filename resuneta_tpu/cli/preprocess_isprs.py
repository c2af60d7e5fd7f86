"""ISPRS preprocessing CLI — argument contract of preprocess_save_patches_ISPRS.py
(:112-127): --norm_type {1,2,3}, --patch_size, --stride, --num_classes, --data_aug.

Default output is the PACKED dataset (uint8 images + class ids; augmentation and
label generation happen on-device at train time — data/pipeline.py). Passing
--layout legacy writes the reference's exact file-per-patch tree
(train/ labels/{seg,bound,dist,color}/patch_{i*5+j}.npy, float32, pre-normalized,
pre-augmented x5) using the on-device ops batched over patches.
"""

import argparse
import os

import numpy as np

from ..utils.cli import str2bool, setup_platform
from ..data.isprs import LABEL_DICT, binarize_matrix, load_npy_image
from ..data.dataset import write_packed_dataset
from ..ops.patches import extract_patches


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--norm_type", help="Choose type of normalization to be used",
                        type=int, default=1, choices=[1, 2, 3])
    parser.add_argument("--patch_size", help="Choose size of patches",
                        type=int, default=256)
    parser.add_argument("--stride",
                        help="Choose stride to be using on patches extraction",
                        type=int, default=32)
    parser.add_argument("--num_classes",
                        help="Choose number of classes to convert labels to one hot"
                             " encoding", type=int, default=5)
    parser.add_argument("--data_aug",
                        help="Allow augmentation images to be added to the dataset"
                             " along with the original images",
                        type=str2bool, default=True)
    # TPU-build extensions (defaults preserve the reference behavior/paths)
    parser.add_argument("--dataset_path", type=str, default="./DATASETS/ISPRS_npy",
                        help="Directory containing Image_Train.npy/Reference_Train.npy")
    parser.add_argument("--output_path", type=str, default=None,
                        help="Output dir (default: reference naming scheme)")
    parser.add_argument("--layout", type=str, default="packed",
                        choices=["packed", "legacy"],
                        help="packed = uint8 arrays + on-device label gen at train "
                             "time; legacy = reference file-per-patch float32 tree")
    return parser


def write_legacy_tree(folder_path, patches, patches_ref, args):
    """Materialize the reference's exact on-disk contract using the JAX ops."""
    import jax
    import jax.numpy as jnp
    from ..ops.augment import augment5
    from ..ops.boundary import get_boundary_label
    from ..ops.distance import get_distance_label
    from ..ops.colorspace import hsv_color_label
    from ..ops.normalize import normalize_rgb

    for sub in ("train", "labels/seg", "labels/bound", "labels/dist", "labels/color"):
        os.makedirs(os.path.join(folder_path, sub), exist_ok=True)

    num_classes = args.num_classes

    @jax.jit
    def gen(img_u8, ids):
        if args.data_aug:
            imgs, lbls = augment5(img_u8, ids)
        else:
            imgs, lbls = img_u8[None], ids[None]
        onehot = jax.nn.one_hot(lbls, num_classes, dtype=jnp.float32)
        img_norm = jax.vmap(lambda im: normalize_rgb(im.astype(jnp.float32),
                                                     args.norm_type))(imgs)
        bound = jax.vmap(get_boundary_label)(onehot)
        dist = jax.vmap(get_distance_label)(onehot)
        color = jax.vmap(lambda im: hsv_color_label(im, args.norm_type))(imgs)
        return img_norm, onehot, bound, dist, color

    n_var = 5 if args.data_aug else 1
    for i in range(len(patches)):
        img_norm, onehot, bound, dist, color = (
            np.asarray(a) for a in gen(patches[i], patches_ref[i])
        )
        for j in range(n_var):
            name = f"patch_{i * 5 + j}.npy" if args.data_aug else f"patch_{i}.npy"
            np.save(os.path.join(folder_path, "train", name), img_norm[j])
            np.save(os.path.join(folder_path, "labels/seg", name), onehot[j])
            np.save(os.path.join(folder_path, "labels/bound", name), bound[j])
            np.save(os.path.join(folder_path, "labels/dist", name), dist[j])
            np.save(os.path.join(folder_path, "labels/color", name), color[j])


def main(argv=None):
    setup_platform()
    args = build_parser().parse_args(argv)

    print("=" * 50)
    print("Parameters")
    print(f"patch size={args.patch_size}")
    print(f"stride={args.stride}")
    print(f"Number of classes={args.num_classes} ")
    print("=" * 50)

    root_path = args.dataset_path
    img_train = load_npy_image(os.path.join(root_path, "Image_Train.npy"))
    img_train = img_train.transpose((1, 2, 0))  # CHW -> HWC
    print("Imagem RGB")
    print(img_train.shape)

    img_train_ref = load_npy_image(os.path.join(root_path, "Reference_Train.npy"))
    img_train_ref = img_train_ref.transpose((1, 2, 0))
    print("Imagem de referencia")
    print(img_train_ref.shape)

    binary_ref = binarize_matrix(img_train_ref, LABEL_DICT)
    del img_train_ref

    patches, patches_ref = extract_patches(
        img_train, binary_ref, args.patch_size, args.stride
    )
    print(f"Number of patches: {len(patches)}")
    if args.data_aug:
        print(f"Number of patches expected: {len(patches) * 5}")

    folder_path = args.output_path or (
        f"./DATASETS/patch_size={args.patch_size}_stride={args.stride}_"
        f"norm_type={args.norm_type}_data_aug={args.data_aug}"
    )
    if args.layout == "packed":
        meta = write_packed_dataset(
            folder_path,
            patches.astype(np.uint8),
            patches_ref.astype(np.uint8),
            args.num_classes,
            norm_type=args.norm_type,
            data_aug=args.data_aug,
        )
        print(f"Packed dataset written to {folder_path}: {meta}")
    else:
        write_legacy_tree(folder_path, patches, patches_ref, args)
        print(f"Legacy patch tree written to {folder_path}")


if __name__ == "__main__":
    main()
