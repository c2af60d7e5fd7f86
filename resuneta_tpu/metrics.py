"""Metrics — on-device (jit-friendly) and host-side evaluation helpers.

Train-time metrics match Keras compiled-metric semantics (train_ISPRS.py:446-449):
categorical accuracy plus TruePositives/FalsePositives/TrueNegatives/FalseNegatives
counted at threshold 0.5 over ALL class channels, and MCC derived from those counts
(train_ISPRS.py:30-32).

Eval-time metrics match utils.py:52-57 compute_metrics (sklearn accuracy/F1/recall/
precision x100, per-class average=None) and sklearn.metrics.confusion_matrix.
"""

import jax.numpy as jnp
import numpy as np


# ---------------- on-device (jit) ----------------

def _argmax_lastc(x):
    """jnp.argmax(x, axis=-1) with identical first-max-wins tie semantics,
    unrolled over the class axis for small C: per-class elementwise
    compare/select planes instead of XLA's index-carrying reduce — whose
    layout assignment on narrow-lane inputs turned the two metric argmaxes
    into 61 ms ops EACH at 1024px (12% of that step; BENCH_NOTES round 5).
    Falls back to jnp.argmax past C=8 (reduction wins again there)."""
    C = x.shape[-1]
    if C > 8:
        return jnp.argmax(x, axis=-1)
    best = x[..., 0]
    idx = jnp.zeros(x.shape[:-1], jnp.int32)
    for c in range(1, C):
        take = x[..., c] > best
        best = jnp.where(take, x[..., c], best)
        idx = jnp.where(take, jnp.int32(c), idx)
    return idx


def categorical_accuracy(y_true, y_pred):
    """Keras 'accuracy' for softmax outputs vs one-hot labels."""
    return jnp.mean(
        (_argmax_lastc(y_true) == _argmax_lastc(y_pred)).astype(jnp.float32)
    )


def binary_counts(y_true, y_pred, threshold=0.5):
    """Keras TruePositives/FalsePositives/TrueNegatives/FalseNegatives: threshold the
    probabilities and count across every element (all classes)."""
    p = y_pred > threshold
    t = y_true > threshold
    tp = jnp.sum((p & t).astype(jnp.float32))
    fp = jnp.sum((p & ~t).astype(jnp.float32))
    tn = jnp.sum((~p & ~t).astype(jnp.float32))
    fn = jnp.sum((~p & t).astype(jnp.float32))
    return tp, fp, tn, fn


def compute_mcc(tp, tn, fp, fn):
    """Matthews correlation coefficient from counts (train_ISPRS.py:30-32).

    Returns 0 when any marginal count is 0 (sklearn.matthews_corrcoef semantics)
    instead of the reference's NaN, so degenerate validation batches don't poison
    the epoch history."""
    denom = jnp.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return jnp.where(denom > 0, (tp * tn - fp * fn) / jnp.maximum(denom, 1e-38), 0.0)


def confusion_matrix_device(true_ids, pred_ids, num_classes):
    """On-device confusion matrix via bincount: cm[t, p] counts."""
    idx = true_ids.astype(jnp.int32) * num_classes + pred_ids.astype(jnp.int32)
    return jnp.bincount(idx.reshape(-1), length=num_classes * num_classes).reshape(
        num_classes, num_classes
    )


# ---------------- host-side (eval parity with sklearn) ----------------

def confusion_matrix(true_labels, predicted_labels, labels=None):
    """sklearn.metrics.confusion_matrix semantics: label set = sorted union of the
    classes present (or an explicit list)."""
    t = np.asarray(true_labels).ravel()
    p = np.asarray(predicted_labels).ravel()
    if labels is None:
        labels = np.unique(np.concatenate([np.unique(t), np.unique(p)]))
    labels = np.asarray(labels)
    lut = {v: i for i, v in enumerate(labels.tolist())}
    n = len(labels)
    ti = np.fromiter((lut[v] for v in t.tolist()), dtype=np.int64, count=len(t))
    pi = np.fromiter((lut[v] for v in p.tolist()), dtype=np.int64, count=len(p))
    return np.bincount(ti * n + pi, minlength=n * n).reshape(n, n)


def _prf_from_cm(cm):
    diag = np.diag(cm).astype(np.float64)
    pred_sum = cm.sum(axis=0).astype(np.float64)
    true_sum = cm.sum(axis=1).astype(np.float64)
    precision = np.divide(diag, pred_sum, out=np.zeros_like(diag), where=pred_sum > 0)
    recall = np.divide(diag, true_sum, out=np.zeros_like(diag), where=true_sum > 0)
    denom = precision + recall
    f1 = np.divide(2 * precision * recall, denom, out=np.zeros_like(diag), where=denom > 0)
    return precision, recall, f1


def compute_metrics(true_labels, predicted_labels, labels=None):
    """utils.py:52-57: (accuracy, f1_per_class, recall_per_class, precision_per_class),
    all x100, per-class arrays ordered by sorted label union like sklearn."""
    t = np.asarray(true_labels).ravel()
    p = np.asarray(predicted_labels).ravel()
    cm = confusion_matrix(t, p, labels)
    accuracy = 100.0 * np.trace(cm) / max(cm.sum(), 1)
    precision, recall, f1 = _prf_from_cm(cm)
    return accuracy, 100.0 * f1, 100.0 * recall, 100.0 * precision


def iou_per_class(cm):
    """Per-class IoU (Jaccard) from a confusion matrix: diag / (row + col - diag).

    Matches sklearn.metrics.jaccard_score(average=None) over the label set the
    matrix was built with; classes absent from both truth and prediction get
    IoU 0 (sklearn's zero_division=0 default). This is the BASELINE.md quality
    gate's metric (mIoU parity +-0.3), derived from the same confusion matrix the
    reference computes at test_ISPRS.py:304-314."""
    cm = np.asarray(cm, np.float64)
    diag = np.diag(cm)
    union = cm.sum(axis=0) + cm.sum(axis=1) - diag
    return np.divide(diag, union, out=np.zeros_like(diag), where=union > 0)


def mean_iou(true_labels, predicted_labels, labels=None):
    """mIoU: mean of per-class IoU over the sorted label union (or explicit
    `labels`). Returns (miou, iou_per_class_array)."""
    cm = confusion_matrix(true_labels, predicted_labels, labels)
    ious = iou_per_class(cm)
    return float(ious.mean()), ious


def alarm_area(cm_2class):
    """Amazon alarm-area metric (amazon_py/main.py:157-158): (TP+FP)/total over the
    binary deforestation confusion matrix."""
    total = cm_2class.sum()
    return (cm_2class[1, 1] + cm_2class[0, 1]) / max(total, 1)


def threshold_sweep_curves(thresholds, prob_map, ref_reconstructed, mask_considered):
    """Simple masked threshold sweep -> (recall, precision, alarm-area) curves in
    percent. NOT the reference's matrics_AA_recall — that full semantics (area
    opening + past-deforestation masking, utils2.py:312-356) lives in
    infer/amazon.py:matrics_AA_recall and is what the Amazon CLI uses. This is a
    lightweight diagnostic for raw probability maps.

    prob_map, ref_reconstructed, mask_considered: 2-D arrays; only pixels where
    mask_considered == 1 participate.
    """
    sel = mask_considered == 1
    ref = (np.asarray(ref_reconstructed)[sel] == 1).astype(np.int64)
    prob = np.asarray(prob_map)[sel]
    recalls, precisions, aas = [], [], []
    for th in thresholds:
        pred = (prob >= th).astype(np.int64)
        tp = int(np.sum((pred == 1) & (ref == 1)))
        fp = int(np.sum((pred == 1) & (ref == 0)))
        fn = int(np.sum((pred == 0) & (ref == 1)))
        recalls.append(100.0 * tp / max(tp + fn, 1))
        precisions.append(100.0 * tp / max(tp + fp, 1))
        aas.append(100.0 * (tp + fp) / max(ref.size, 1))
    return np.array(recalls), np.array(precisions), np.array(aas)
