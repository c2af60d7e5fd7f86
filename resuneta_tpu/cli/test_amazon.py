"""Amazon test/eval CLI — the equivalent of amazon_py/test_amazon.py: load a trained
checkpoint, run whole-scene prediction over the test tiles, report confusion
matrix / accuracy / F1 / recall / precision, alarm area, and the threshold-sweep
recall/precision/alarm-area curves (the repaired matrics_AA_recall of
utils2.py:312-356)."""

import argparse
import os

import numpy as np

from ..utils.cli import setup_platform
from .train_amazon import build_parser as _train_parser, load_amazon_scene


def build_parser():
    parser = argparse.ArgumentParser(parents=[_train_parser()], add_help=False,
                                     conflict_handler="resolve")
    parser.add_argument("--model_path", type=str, required=True,
                        help="checkpoint dir saved by training (best_model.ckpt)")
    parser.add_argument("--output_path", type=str, default="results/amazon_preds")
    parser.add_argument("--thresholds", type=float, nargs="*",
                        default=list(np.round(np.arange(0.05, 1.0, 0.05), 3)))
    return parser


def main(argv=None):
    setup_platform()
    args = build_parser().parse_args(argv)

    import jax
    from ..models import ResUnetA, UNet
    from ..train import create_train_state, checkpoint
    from ..metrics import compute_metrics, confusion_matrix
    from ..infer.amazon import prediction, color_map, rgb_image, matrics_AA_recall

    image_array, image_ref, final_mask, mask_tiles = load_amazon_scene(args)
    H, W, channels = image_array.shape

    mask_ts = np.zeros_like(mask_tiles, np.float32)
    for t in args.test_tiles:
        mask_ts[mask_tiles == t] = 1

    if args.resunet_a:
        model = ResUnetA(num_classes=args.num_classes, img_size=args.patch_size,
                         multitasking=bool(args.multitasking), color_head=False)
    else:
        model = UNet(num_classes=args.num_classes)
    state = create_train_state(
        model, jax.random.PRNGKey(0),
        (1, args.patch_size, args.patch_size, channels))
    state, _ = checkpoint.restore(args.model_path, state)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def apply_fn(x):
        return model.apply(variables, x, train=False)

    (ref_final, pre_final, prob_rec, ref_rec, ref_clip, clip_mask,
     time_ts) = prediction(apply_fn, image_array, image_ref, final_mask,
                           mask_ts, args.patch_size, args.area)

    cm = confusion_matrix(ref_final, pre_final)
    metrics = compute_metrics(ref_final, pre_final)
    print("Confusion  matrix \n", cm)
    print("Accuracy: ", metrics[0])
    print("F1score: ", metrics[1])
    print("Recall: ", metrics[2])
    print("Precision: ", metrics[3])
    if cm.shape[0] > 1:
        print("Alarm area:", (cm[1, 1] + cm[0, 1]) / len(ref_final) * 100)
    print("test time", time_ts)

    sweep = matrics_AA_recall(args.thresholds, prob_rec, ref_clip,
                              clip_mask, args.area)
    recalls, precisions, aas = (100 * sweep[:, 0], 100 * sweep[:, 1],
                                100 * sweep[:, 2])
    print("Thresholds:", list(args.thresholds))
    print("Recall curve:", np.round(recalls, 2).tolist())
    print("Precision curve:", np.round(precisions, 2).tolist())
    print("Alarm-area curve:", np.round(aas, 2).tolist())

    os.makedirs(args.output_path, exist_ok=True)
    np.save(os.path.join(args.output_path, "prob_reconstructed.npy"), prob_rec)
    cmap = color_map(prob_rec, ref_rec, ref_clip, clip_mask, th=0.5)
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        plt.imsave(os.path.join(args.output_path, "color_map.png"),
                   rgb_image(cmap).astype(np.uint8))
        fig = plt.figure()
        plt.plot(args.thresholds, recalls, label="recall")
        plt.plot(args.thresholds, precisions, label="precision")
        plt.plot(args.thresholds, aas, label="alarm area")
        plt.legend(); plt.xlabel("threshold")
        plt.savefig(os.path.join(args.output_path, "threshold_sweep.png"))
        plt.close(fig)
    except ImportError:
        pass
    return metrics, cm


if __name__ == "__main__":
    main()
