"""Losses with Keras-compatible numerics and reductions.

All losses compute in float32 regardless of the model's compute dtype (bf16-safe,
SURVEY.md §7 hard part (c)). Per-head scalars use Keras' sum_over_batch_size
reduction (mean over every element of the per-sample loss), so the multitask total
  total = seg + bound_weight*bound + dist_weight*dist + color_weight*color
matches model.compile(loss=..., loss_weights=...) in the reference
(train_ISPRS.py:437-452).
"""

import jax.numpy as jnp

_KERAS_EPS = 1e-7  # K.epsilon()


def tanimoto_loss(label, pred):
    """Tanimoto coefficient with inverse-squared-volume class weights — a faithful
    port of multitasking_utils.py:38-68 (Diakogiannis et al. 2019, arXiv:1904.00592).

    label, pred: (B, H, W, C). Returns per-sample coefficients (B,).
    NB: argument ORDER matters — the weights wli come from `label`; the reference's
    dual wrapper passes swapped arguments deliberately (see tanimoto_dual_loss).
    """
    label = label.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    smooth = 1e-5

    # (C,) class volumes, averaged over the GLOBAL batch: under a shard_map'ed
    # train step (parallel/axis.py) the local-batch mean is pmean'd across the
    # data axis, preserving single-device numerics — the weights couple every
    # sample in the batch, and in the dual's swapped call they are a function
    # of the PREDICTIONS, so this collective also carries gradient.
    from .parallel.axis import pmean as _axis_pmean
    Vli = _axis_pmean(jnp.mean(jnp.sum(label, axis=(1, 2)), axis=0))
    wli = 1.0 / (Vli ** 2)  # inf where Vli == 0
    # NiftyNet inf handling: replace inf weights with the max finite weight
    finite = jnp.where(jnp.isinf(wli), jnp.zeros_like(wli), wli)
    wli = jnp.where(jnp.isinf(wli), jnp.ones_like(wli) * jnp.max(finite), wli)

    sum_square = jnp.sum(jnp.square(pred) + jnp.square(label), axis=(1, 2))  # (B, C)
    sum_product = jnp.sum(pred * label, axis=(1, 2))  # (B, C)
    numerator = jnp.sum(wli * sum_product, axis=-1)  # (B,)
    denominator = jnp.sum(wli * (sum_square - sum_product), axis=-1)  # (B,)
    return (numerator + smooth) / (denominator + smooth)


def tanimoto_dual_loss(label, pred):
    """1 - 0.5*(T(pred-as-label, label-as-pred) + T(1-label, 1-pred)) — including the
    swapped-argument asymmetry of multitasking_utils.py:71-85 (loss1 computes its
    class weights from the predictions). Returns a scalar (Keras mean over batch)."""
    loss1 = tanimoto_loss(pred, label)          # swapped, as in the reference
    loss2 = tanimoto_loss(1.0 - label, 1.0 - pred)
    return jnp.mean(1.0 - 0.5 * (loss1 + loss2))


def weighted_categorical_crossentropy(weights):
    """utils.py:466-491: renormalize probs, clip to [eps, 1-eps], -sum(w*y*log p) per
    pixel; returned closure gives the Keras-reduced scalar (mean over B*H*W)."""
    weights = jnp.asarray(weights, jnp.float32)

    def loss(y_true, y_pred):
        y_true = y_true.astype(jnp.float32)
        y_pred = y_pred.astype(jnp.float32)
        y_pred = y_pred / jnp.sum(y_pred, axis=-1, keepdims=True)
        y_pred = jnp.clip(y_pred, _KERAS_EPS, 1.0 - _KERAS_EPS)
        pixel = -jnp.sum(y_true * jnp.log(y_pred) * weights, axis=-1)
        return jnp.mean(pixel)

    return loss


def categorical_crossentropy(y_true, y_pred):
    """tf.keras.losses.CategoricalCrossentropy() on probabilities (from_logits=False):
    renormalize, clip, -sum(y*log p), mean over all pixels."""
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    y_pred = y_pred / jnp.sum(y_pred, axis=-1, keepdims=True)
    y_pred = jnp.clip(y_pred, _KERAS_EPS, 1.0 - _KERAS_EPS)
    return jnp.mean(-jnp.sum(y_true * jnp.log(y_pred), axis=-1))


def binary_crossentropy(y_true, y_pred):
    """tf.keras.losses.BinaryCrossentropy() on probabilities: elementwise BCE with
    clipping, mean over the last axis, then mean over everything."""
    y_true = y_true.astype(jnp.float32)
    y_pred = jnp.clip(y_pred.astype(jnp.float32), _KERAS_EPS, 1.0 - _KERAS_EPS)
    bce = -(y_true * jnp.log(y_pred) + (1.0 - y_true) * jnp.log(1.0 - y_pred))
    return jnp.mean(jnp.mean(bce, axis=-1))


def mean_squared_error(y_true, y_pred):
    """tf.keras.losses.MeanSquaredError(): mean over last axis, then overall mean."""
    y_true = y_true.astype(jnp.float32)
    y_pred = y_pred.astype(jnp.float32)
    return jnp.mean(jnp.mean(jnp.square(y_true - y_pred), axis=-1))


# ISPRS fixed WCE weights (train_ISPRS.py:424)
ISPRS_WCE_WEIGHTS = (4.34558461, 2.97682037, 3.92124661, 5.67350328, 374.0300152)


def make_losses(loss_name, num_classes=None, wce_weights=None):
    """Loss selection matching train_ISPRS.py:411-429: returns a dict of per-head
    scalar loss fns {seg, bound, dist, color}."""
    if loss_name == "cross_entropy":
        return {
            "seg": categorical_crossentropy,
            "bound": binary_crossentropy,
            "dist": mean_squared_error,
            "color": mean_squared_error,
        }
    elif loss_name == "tanimoto":
        return {
            "seg": tanimoto_dual_loss,
            "bound": tanimoto_dual_loss,
            "dist": tanimoto_dual_loss,
            "color": tanimoto_dual_loss,
        }
    elif loss_name == "weighted_cross_entropy":
        w = wce_weights if wce_weights is not None else ISPRS_WCE_WEIGHTS
        return {
            "seg": weighted_categorical_crossentropy(w),
            "bound": binary_crossentropy,
            "dist": mean_squared_error,
            "color": mean_squared_error,
        }
    raise ValueError(f"unknown loss {loss_name}")
