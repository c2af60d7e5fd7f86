"""Jitted train/eval steps — the train_on_batch / test_on_batch equivalents
(train_ISPRS.py:115-187), compiled once and sharded over the device mesh.

One logical step over the global batch, with two distribution strategies
(pass `mesh=` to the factories; SURVEY.md §7 hard part (d)):

* pure data-parallel meshes — `shard_map` over the 'data' axis: the body runs
  per-shard WITH the fused Pallas kernels live (they are opaque to GSPMD, so
  the compiler-partitioned program had to trace without them — VERDICT r4),
  and the batch-global couplings are explicit ICI collectives: pmean'd
  BatchNorm statistics (sync-BN), pmean'd Tanimoto class volumes, pmean'd
  gradients, psum'd metric counts. Numerics match the single-device program
  at any replica count (tests/test_shardmap_step.py).
* meshes with a live 'space' axis — GSPMD partitioning of the single logical
  program (activation heights sharded, conv halo exchanges inserted by XLA);
  the Pallas segment kernels are disabled while tracing (handled internally
  via sharded_trace_scope — callers just call the returned step).

Metric rows keep the reference's exact names and ordering so the epoch report and
TensorBoard layout line up (train_ISPRS.py:493-496, 508-509).
"""

from typing import Dict

import jax
import jax.numpy as jnp

from ..metrics import categorical_accuracy, binary_counts
from ..parallel import axis as data_axis

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
    # under a shard_map'ed step these are per-shard values: means pmean,
    # counts psum (identity when no data axis is mapped)
    tp, fp, tn, fn = data_axis.psum((tp, fp, tn, fn))
    acc = data_axis.pmean(acc)
    total = data_axis.pmean(total)
    if multitasking:
        per_head = data_axis.pmean(per_head)
        zero = jnp.zeros((), total.dtype)
        return jnp.stack([
            total, per_head["seg"], per_head["bound"], per_head["dist"],
            per_head.get("color", zero), acc, tp, fp, tn, fn,
        ])
    return jnp.stack([total, acc, tp, fp, tn, fn])


def _pure_data_mesh(mesh, axis_name):
    """True when every mesh axis except `axis_name` has size 1 — the shapes
    shard_map data-parallelism covers. A live 'space' axis partitions
    activation interiors (conv halo exchanges), which stays GSPMD's job."""
    return all(size == 1 for name, size in mesh.shape.items()
               if name != axis_name)


def _distribute(step_fn, mesh, axis_name, donate, state_out=True):
    """Wrap a step body for the given mesh (None -> plain jit; pure-dp ->
    shard_map with collectives + fused kernels; else GSPMD with the Pallas
    blackout scoped internally). state_out: body returns (state, row) vs a
    bare row (eval). Every output is replicated — the row is collectively
    reduced inside and state updates use pmean'd grads/statistics."""
    donate_argnums = (0,) if donate else ()
    if mesh is not None and _pure_data_mesh(mesh, axis_name):
        from jax.sharding import PartitionSpec as P

        def body(state, batch):
            with data_axis.data_axis(axis_name):
                return step_fn(state, batch)

        mapped = jax.shard_map(body, mesh=mesh,
                               in_specs=(P(), P(axis_name)),
                               out_specs=(P(), P()) if state_out else P(),
                               check_vma=False)
        return jax.jit(mapped, donate_argnums=donate_argnums)

    jitted = jax.jit(step_fn, donate_argnums=donate_argnums)
    if mesh is None:
        return jitted

    from ..parallel.mesh import sharded_trace_scope

    def gspmd_step(state, batch):
        # the scope only matters while TRACING (first call); entering it per
        # call costs nothing
        with sharded_trace_scope(mesh):
            return jitted(state, batch)

    return gspmd_step


def make_train_step(loss_fns: Dict, loss_weights: Dict, multitasking: bool,
                    preprocess=None, donate: bool = True, remat: bool = False,
                    mesh=None, axis_name: str = "data"):
    """Returns train_step(state, batch) -> (state, metrics_row).

    batch: dict with 'image' plus label heads ('seg' [+ 'bound','dist','color']).
    `preprocess` optionally maps the raw (e.g. uint8 packed) batch to the model
    batch on-device — the fused augment/normalize/label-gen pipeline plugs in here
    so everything from uint8 patches to gradients is ONE compiled program.
    `remat` applies the SAVE_CONVS rematerialization policy to the forward.
    `mesh`: distribute the step (module docstring) — pure-dp meshes run the
    body per-shard under shard_map with the fused kernels LIVE and explicit
    collectives; 'space'-bearing meshes run GSPMD. Callers feed the step
    mesh-sharded global arrays (parallel.mesh.shard_batch / replicate_state)
    either way.
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
        # shard_map'ed meshes: all-reduce the per-shard gradients (identity
        # otherwise; GSPMD inserts its own all-reduce from the sharding)
        grads = data_axis.pmean(grads)
        new_state = state.apply_gradients(grads, new_stats)
        seg_pred = outputs["seg"] if multitasking else outputs
        row = _metrics_row(multitasking, total, per_head, seg_pred, batch["seg"])
        return new_state, row

    return _distribute(train_step, mesh, axis_name, donate)


def make_eval_step(loss_fns: Dict, loss_weights: Dict, multitasking: bool,
                   preprocess=None, mesh=None, axis_name: str = "data"):
    """test_on_batch equivalent: inference mode (running BN stats), no grads.
    `mesh` distributes exactly like make_train_step (shard_map for pure-dp)."""

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

    return _distribute(eval_step, mesh, axis_name, donate=False,
                       state_out=False)
