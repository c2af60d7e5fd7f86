"""Epoch training loop — the train_model equivalent (train_ISPRS.py:55-293):
per-epoch shuffle, batched train/eval steps, per-task epoch report, TensorBoard
scalars with the reference's exact tag layout, MCC, early stopping (patience 10,
delta 1e-3 with the reference's `val_loss >= min_loss + delta` tie-penalizing
comparison — SURVEY.md §5 quirks) and best-model checkpointing.

The loop is host-side orchestration only: all compute lives in the jitted steps;
batches stream asynchronously (JAX dispatch) so host I/O overlaps device compute.
"""

import os
import time
from dataclasses import dataclass
from typing import Optional

import jax
import numpy as np

from .steps import METRICS_MULTITASK, METRICS_SINGLE
from .checkpoint import save_best, AsyncSaver
from ..metrics import compute_mcc
from ..parallel.mesh import shard_batch
from ..utils.table import ascii_table


@dataclass
class TrainConfig:
    results_path: str = "./results/results_run1"
    batch_size: int = 4
    epochs: int = 500
    multitasking: bool = True
    patience: int = 10
    delta: float = 1e-3
    seed: int = 0
    tensorboard: bool = True
    verbose: bool = True
    checkpoint_name: str = "best_model.ckpt"
    profile_dir: Optional[str] = None  # jax.profiler trace of epoch 0 when set
    async_checkpoint: bool = True      # non-blocking orbax saves
    keep_last: int = 0                 # also keep the last N epoch checkpoints


def _writers(config):
    if not config.tensorboard:
        return None, None
    try:
        from tensorboardX import SummaryWriter
    except ImportError:
        return None, None
    return (
        SummaryWriter(os.path.join(config.results_path, "logs", "train")),
        SummaryWriter(os.path.join(config.results_path, "logs", "val")),
    )


def _add_scalars(train_w, val_w, epoch, name, train_loss, val_loss,
                 train_acc=None, val_acc=None, val_mcc=None):
    """Tag layout of add_tensorboard_scalars (train_ISPRS.py:35-53)."""
    if train_w is None:
        return
    train_w.add_scalar(name + "/Loss", float(train_loss), epoch)
    if train_acc is not None:
        train_w.add_scalar(name + "/Accuracy", float(train_acc), epoch)
    val_w.add_scalar(name + "/Loss", float(val_loss), epoch)
    if val_acc is not None:
        val_w.add_scalar(name + "/Accuracy", float(val_acc), epoch)
    if val_mcc is not None:
        val_w.add_scalar(name + "/MCC", float(val_mcc), epoch)


def _epoch_pass(step_fn, state, ds, batch_size, order, mesh, train: bool):
    rows = []
    n_batches = len(ds) // batch_size
    if n_batches == 0 and len(ds) > 0:
        # dataset smaller than one batch: run a single short batch (recompiles
        # once for the smaller shape rather than silently skipping the split)
        n_batches, batch_size = 1, len(ds)
    for b in range(n_batches):
        pos = order[b * batch_size:(b + 1) * batch_size]
        raw = ds.get_batch(pos)
        if mesh is not None:
            raw = shard_batch(raw, mesh)
        # distribution strategy (shard_map vs GSPMD incl. the Pallas trace
        # blackout) lives inside the step — build steps with
        # make_train_step(mesh=...) when passing a mesh here
        if train:
            state, row = step_fn(state, raw)
        else:
            row = step_fn(state, raw)
        rows.append(row)  # device arrays; sync deferred to epoch end
    mean = np.mean(np.stack([np.asarray(r) for r in rows]), axis=0) if rows \
        else np.zeros(0)
    return state, mean


def train_model(config: TrainConfig, state, train_step, eval_step,
                train_ds, val_ds, mesh=None):
    """Returns (state, history list of per-epoch dicts). Saves the best checkpoint
    under config.results_path like the reference saves best_model.h5."""
    names = METRICS_MULTITASK if config.multitasking else METRICS_SINGLE
    train_w, val_w = _writers(config)
    os.makedirs(config.results_path, exist_ok=True)
    ckpt_path = os.path.join(config.results_path, config.checkpoint_name)

    if config.verbose:
        print("Start training...")
        print("=" * 60)
        print(f"Training on {len(train_ds)} images")
        print(f"Validating on {len(val_ds)} images")
        print("=" * 60)
        print(f"Total Epochs: {config.epochs}")

    min_loss = float("inf")
    cont = 0
    rng = np.random.default_rng(config.seed)
    history = []
    saver = AsyncSaver(keep_last=config.keep_last) \
        if (config.async_checkpoint or config.keep_last) else None

    # Always drain pending async saves — an exception/KeyboardInterrupt
    # mid-epoch must not abandon an uncommitted checkpoint (the meta.json for
    # a save is only written once the commit completes, see AsyncSaver).
    try:
        return _train_epochs(config, state, train_step, eval_step, train_ds,
                             val_ds, mesh, names, train_w, val_w, saver,
                             min_loss, cont, rng, history, ckpt_path)
    finally:
        if saver is not None:
            saver.close()


def _train_epochs(config, state, train_step, eval_step, train_ds, val_ds, mesh,
                  names, train_w, val_w, saver, min_loss, cont, rng, history,
                  ckpt_path):
    for epoch in range(config.epochs):
        t0 = time.time()
        perm = rng.permutation(len(train_ds))
        profiling = config.profile_dir is not None and epoch == 0
        if profiling:
            import jax.profiler
            jax.profiler.start_trace(config.profile_dir)
        state, loss_tr = _epoch_pass(
            train_step, state, train_ds, config.batch_size, perm, mesh, train=True
        )
        if profiling:
            import jax.profiler
            jax.profiler.stop_trace()
        train_time = time.time() - t0
        n_seen = (len(train_ds) // config.batch_size) * config.batch_size
        order_val = np.arange(len(val_ds))
        _, loss_val = _epoch_pass(
            eval_step, state, val_ds, config.batch_size, order_val, mesh, train=False
        )

        train_metrics = dict(zip(names, loss_tr.tolist()))
        val_metrics = dict(zip(names, loss_val.tolist()))
        patches_per_sec = n_seen / max(train_time, 1e-9)
        history.append({"train": train_metrics, "val": val_metrics,
                        "time": time.time() - t0,
                        "patches_per_sec": patches_per_sec})
        if train_w is not None:
            train_w.add_scalar("Perf/patches_per_sec", patches_per_sec, epoch)

        if not config.multitasking:
            mcc = float(compute_mcc(
                val_metrics["true_positives"], val_metrics["true_negatives"],
                val_metrics["false_positives"], val_metrics["false_negatives"]))
            if config.verbose:
                print(f"Epoch: {epoch} "
                      f"Training loss: {train_metrics['loss']:.5f} "
                      f"Train acc.: {100 * train_metrics['accuracy']:.5f}% "
                      f"Validation loss: {val_metrics['loss']:.5f} "
                      f"Validation acc.: {100 * val_metrics['accuracy']:.5f}%")
            _add_scalars(train_w, val_w, epoch, "Total",
                         train_metrics["loss"], val_metrics["loss"],
                         train_metrics["accuracy"], val_metrics["accuracy"], mcc)
            val_loss = val_metrics["loss"]
        else:
            mcc = float(compute_mcc(
                val_metrics["seg_true_positives"], val_metrics["seg_true_negatives"],
                val_metrics["seg_false_positives"], val_metrics["seg_false_negatives"]))
            rows = [
                ["Seg", round(train_metrics["seg_loss"], 5),
                 round(val_metrics["seg_loss"], 5),
                 round(100 * train_metrics["seg_accuracy"], 5),
                 round(100 * val_metrics["seg_accuracy"], 5)],
                ["Bound", round(train_metrics["bound_loss"], 5),
                 round(val_metrics["bound_loss"], 5), 0, 0],
                ["Dist", round(train_metrics["dist_loss"], 5),
                 round(val_metrics["dist_loss"], 5), 0, 0],
                ["Color", round(train_metrics["color_loss"], 5),
                 round(val_metrics["color_loss"], 5), 0, 0],
                ["Total", round(train_metrics["loss"], 5),
                 round(val_metrics["loss"], 5), 0, 0],
            ]
            _add_scalars(train_w, val_w, epoch, "Segmentation",
                         train_metrics["seg_loss"], val_metrics["seg_loss"],
                         train_metrics["seg_accuracy"], val_metrics["seg_accuracy"], mcc)
            _add_scalars(train_w, val_w, epoch, "Boundary",
                         train_metrics["bound_loss"], val_metrics["bound_loss"])
            _add_scalars(train_w, val_w, epoch, "Distance",
                         train_metrics["dist_loss"], val_metrics["dist_loss"])
            _add_scalars(train_w, val_w, epoch, "Color",
                         train_metrics["color_loss"], val_metrics["color_loss"])
            _add_scalars(train_w, val_w, epoch, "Total",
                         train_metrics["loss"], val_metrics["loss"])
            if config.verbose:
                print(ascii_table(f"Epoch: {epoch}",
                                  ["Task", "Loss", "Val Loss", "Acc %", "Val Acc %"],
                                  rows))
            val_loss = val_metrics["loss"]

        # Early stopping with the reference's exact comparison (train_ISPRS.py:280)
        if val_loss >= min_loss + config.delta:
            cont += 1
            if config.verbose:
                print(f"EarlyStopping counter: {cont} out of {config.patience}")
            if cont >= config.patience:
                if config.verbose:
                    print("Early Stopping! \t Training Stopped")
                return state, history
        else:
            cont = 0
            min_loss = val_loss
            if config.verbose:
                print("Saving best model...")
            if saver is not None:
                saver.save_best(ckpt_path, state, epoch, min_loss)
            else:
                save_best(ckpt_path, state, epoch, min_loss)
        if saver is not None and config.keep_last:
            saver.save_epoch(os.path.join(config.results_path, "checkpoints"),
                             state, epoch)

    return state, history
