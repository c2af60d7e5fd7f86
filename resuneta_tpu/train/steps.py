"""Jitted train/eval steps — the train_on_batch / test_on_batch equivalents
(train_ISPRS.py:115-187), compiled once and sharded over the device mesh.

One logical program over the global batch: under GSPMD the batch axis is sharded
across the mesh's 'data' axis, gradients are all-reduced by compiler-inserted
collectives over ICI, and BatchNorm batch statistics are computed over the GLOBAL
batch (sync-BN), matching single-device numerics at any replica count
(SURVEY.md §7 hard part (d)).

Metric rows keep the reference's exact names and ordering so the epoch report and
TensorBoard layout line up (train_ISPRS.py:493-496, 508-509).
"""

from typing import Dict

import jax
import jax.numpy as jnp

from ..metrics import categorical_accuracy, binary_counts

# Rematerialization policy for the model forward inside the train step: keep
# only tensors tagged "save" (conv/pool outputs and BN statistics —
# models/resuneta.py _save) and recompute every elementwise segment between
# them during the backward pass. MEASURED NEGATIVE on the v5e bench (75.8 ->
# 67.8 patches/s with the closed-form BN, 64.1 with plain BN): XLA's remat
# scheduling duplicates passes instead of fusing recompute into consumers
# here. Kept as an opt-in (make_train_step(remat=True)) — it reduces peak
# activation memory ~2x, which matters for large-batch/512px configs that
# otherwise OOM, and for future XLA versions to re-evaluate.
SAVE_CONVS = jax.checkpoint_policies.save_only_these_names("save")

METRICS_MULTITASK = [
    "loss", "seg_loss", "bound_loss", "dist_loss", "color_loss",
    "seg_accuracy", "seg_true_positives", "seg_false_positives",
    "seg_true_negatives", "seg_false_negatives",
]
METRICS_SINGLE = [
    "loss", "accuracy", "true_positives", "false_positives",
    "true_negatives", "false_negatives",
]


def _multitask_total(loss_fns, loss_weights, outputs, batch):
    """Weighted sum over whatever heads the model actually produced — the full
    seg/bound/dist/color set for ISPRS, seg/bound/dist for Amazon multitask
    (no HSV target on 14-channel input)."""
    heads = [h for h in ("seg", "bound", "dist", "color") if h in outputs]
    per_head = {h: loss_fns[h](batch[h], outputs[h]) for h in heads}
    total = sum(per_head[h] * loss_weights.get(h, 1.0) for h in heads)
    return total, per_head


def _metrics_row(multitasking, total, per_head, seg_pred, seg_true):
    acc = categorical_accuracy(seg_true, seg_pred)
    tp, fp, tn, fn = binary_counts(seg_true, seg_pred)
    if multitasking:
        zero = jnp.zeros((), total.dtype)
        return jnp.stack([
            total, per_head["seg"], per_head["bound"], per_head["dist"],
            per_head.get("color", zero), acc, tp, fp, tn, fn,
        ])
    return jnp.stack([total, acc, tp, fp, tn, fn])


def make_train_step(loss_fns: Dict, loss_weights: Dict, multitasking: bool,
                    preprocess=None, donate: bool = True, remat: bool = False):
    """Returns train_step(state, batch) -> (state, metrics_row).

    batch: dict with 'image' plus label heads ('seg' [+ 'bound','dist','color']).
    `preprocess` optionally maps the raw (e.g. uint8 packed) batch to the model
    batch on-device — the fused augment/normalize/label-gen pipeline plugs in here
    so everything from uint8 patches to gradients is ONE compiled program.
    `remat` applies the SAVE_CONVS rematerialization policy to the forward.
    """

    def train_step(state, batch):
        if preprocess is not None:
            batch = preprocess(batch)

        def forward(params, image):
            return state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                image, train=True, mutable=["batch_stats"],
            )

        if remat:
            forward = jax.checkpoint(forward, policy=SAVE_CONVS)

        def loss_fn(params):
            outputs, mutated = forward(params, batch["image"])
            if multitasking:
                total, per_head = _multitask_total(loss_fns, loss_weights, outputs, batch)
            else:
                total = loss_fns["seg"](batch["seg"], outputs)
                per_head = None
            return total, (mutated["batch_stats"], outputs, per_head)

        (total, (new_stats, outputs, per_head)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        seg_pred = outputs["seg"] if multitasking else outputs
        row = _metrics_row(multitasking, total, per_head, seg_pred, batch["seg"])
        return new_state, row

    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(loss_fns: Dict, loss_weights: Dict, multitasking: bool,
                   preprocess=None):
    """test_on_batch equivalent: inference mode (running BN stats), no grads."""

    def eval_step(state, batch):
        if preprocess is not None:
            batch = preprocess(batch)
        outputs = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], train=False,
        )
        if multitasking:
            total, per_head = _multitask_total(loss_fns, loss_weights, outputs, batch)
        else:
            total = loss_fns["seg"](batch["seg"], outputs)
            per_head = None
        seg_pred = outputs["seg"] if multitasking else outputs
        return _metrics_row(multitasking, total, per_head, seg_pred, batch["seg"])

    return jax.jit(eval_step)
