"""ISPRS training CLI — full argument contract of train_ISPRS.py:298-338 preserved:
--resunet_a, --multitasking, --gpu_parallel, -rp/--results_path, -cp/--checkpoint_path,
-dp/--dataset_path, -bs, -lr, --loss {weighted_cross_entropy,cross_entropy,tanimoto},
-optm {adam,sgd}, --num_classes, --epochs, -ps, --bound_weight, --dist_weight,
--color_weight.

--gpu_parallel maps to data parallelism over the full jax.devices() mesh (the
MirroredStrategy replacement, SURVEY.md §2.3); on a single chip it is a no-op,
exactly like MirroredStrategy with one GPU.
"""

import argparse
import os
import time

import numpy as np

from ..utils.cli import str2bool, setup_platform


def build_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--resunet_a", help="choose resunet-a model or not",
                        type=str2bool, default=False)
    parser.add_argument("--multitasking", help="choose resunet-a multitasking or not",
                        type=str2bool, default=False)
    parser.add_argument("--gpu_parallel",
                        help="choose 1 to train on multiple devices",
                        type=str2bool, default=False)
    parser.add_argument("-rp", "--results_path",
                        help="Path where to save logs and model checkpoint. Logs and "
                             "checkpoint will be saved inside this folder.",
                        type=str, default="./results/results_run1")
    parser.add_argument("-cp", "--checkpoint_path",
                        help="Path where to load model checkpoint to continue "
                             "training, if needed", type=str, default=None)
    parser.add_argument("-dp", "--dataset_path", help="Path where to load dataset",
                        type=str, default="./DATASETS/patch_size=256_stride=32")
    parser.add_argument("-bs", "--batch_size", help="Batch size on training",
                        type=int, default=4)
    parser.add_argument("-lr", "--learning_rate", help="Learning rate on training",
                        type=float, default=1e-3)
    parser.add_argument("--loss", help="choose which loss you want to use",
                        type=str, default="weighted_cross_entropy",
                        choices=["weighted_cross_entropy", "cross_entropy", "tanimoto"])
    parser.add_argument("-optm", "--optimizer", help="Choose which optmizer to use",
                        type=str, choices=["adam", "sgd"], default="adam")
    parser.add_argument("--num_classes", help="Number of classes", type=int, default=5)
    parser.add_argument("--epochs", help="Number of epochs", type=int, default=500)
    parser.add_argument("-ps", "--patch_size", help="Size of patches extracted",
                        type=int, default=256)
    parser.add_argument("--bound_weight", help="Boundary loss weight",
                        type=float, default=1.0)
    parser.add_argument("--dist_weight", help="Distance transform loss weight",
                        type=float, default=1.0)
    parser.add_argument("--color_weight", help="HSV transform loss weight",
                        type=float, default=1.0)
    # TPU-build extensions
    parser.add_argument("--dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="Model compute dtype (params stay float32)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--patience", type=int, default=10)
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax.profiler trace of epoch 0 here")
    return parser


def main(argv=None):
    setup_platform()
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    from sklearn.model_selection import train_test_split

    from ..models import ResUnetA, UNet
    from ..losses import make_losses
    from ..train import (
        create_train_state, make_train_step, make_eval_step, train_model,
        TrainConfig, checkpoint,
    )
    from ..data import PackedDataset, LegacyPatchDataset, make_device_pipeline
    from ..data.dataset import is_packed
    from ..parallel import make_mesh

    print("=" * 30 + "INITIALIZING" + "=" * 30)
    print(f"DEVICES: {jax.devices()}")

    mesh = None
    if args.gpu_parallel and jax.device_count() > 1:
        mesh = make_mesh()
        print(f"Number of devices: {jax.device_count()} (data-parallel mesh)")

    # ---------- dataset ----------
    root = args.dataset_path
    if is_packed(root):
        full = PackedDataset(root)
        idx = np.arange(len(full))
        tr_idx, val_idx = train_test_split(idx, test_size=0.2, random_state=42)
        train_ds, val_ds = full.subset(tr_idx), full.subset(val_idx)
        norm_type = full.meta.get("norm_type", 1)
        preprocess = make_device_pipeline(
            args.num_classes, norm_type, args.multitasking
        )
        channels = full.meta.get("channels", 3)
    else:
        full = LegacyPatchDataset(root, multitasking=args.multitasking)
        idx = np.arange(len(full))
        tr_idx, val_idx = train_test_split(idx, test_size=0.2, random_state=42)
        train_ds, val_ds = full.subset(tr_idx), full.subset(val_idx)
        preprocess = None
        channels = 3

    # ---------- model ----------
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if args.resunet_a:
        if args.multitasking:
            print("Multitasking enabled!")
        else:
            print("Using simple ResUnet-a")
        model = ResUnetA(num_classes=args.num_classes, img_size=args.patch_size,
                         multitasking=args.multitasking, dtype=dtype)
    else:
        model = UNet(num_classes=args.num_classes, dtype=dtype)

    state = create_train_state(
        model, jax.random.PRNGKey(args.seed),
        (args.batch_size, args.patch_size, args.patch_size, channels),
        optimizer=args.optimizer, learning_rate=args.learning_rate,
    )

    # ---------- losses ----------
    print("=" * 60)
    if args.loss == "cross_entropy":
        print("Using Cross Entropy")
    elif args.loss == "tanimoto":
        print("Using Tanimoto Dual Loss")
    else:
        print("Using Weighted cross entropy")
    loss_fns = make_losses(args.loss)
    loss_weights = {"seg": 1.0, "bound": args.bound_weight,
                    "dist": args.dist_weight, "color": args.color_weight}
    if args.multitasking:
        print(f"Loss Weights: {loss_weights}")
    print("=" * 60)

    # ---------- resume ----------
    if args.checkpoint_path is not None:
        print(f"[INFO] loading {args.checkpoint_path}...")
        print(f"[INFO] old learning rate: {float(state.learning_rate)}")
        state, meta = checkpoint.restore(
            args.checkpoint_path, state, learning_rate_override=args.learning_rate
        )
        print(f"[INFO] new learning rate: {float(state.learning_rate)}")

    # pure-dp mesh -> shard_map step with the fused kernels live (steps.py)
    train_step = make_train_step(loss_fns, loss_weights, args.multitasking,
                                 preprocess=preprocess, mesh=mesh)
    eval_step = make_eval_step(loss_fns, loss_weights, args.multitasking,
                               preprocess=preprocess, mesh=mesh)

    os.makedirs(args.results_path, exist_ok=True)
    config = TrainConfig(
        results_path=args.results_path,
        batch_size=args.batch_size,
        epochs=args.epochs,
        multitasking=args.multitasking,
        patience=args.patience,
        seed=args.seed,
        profile_dir=args.profile_dir,
    )

    start = time.time()
    state, history = train_model(config, state, train_step, eval_step,
                                 train_ds, val_ds, mesh=mesh)
    print(f"\nTraining took: {(time.time() - start) / 3600} \n")
    return state, history


if __name__ == "__main__":
    main()
