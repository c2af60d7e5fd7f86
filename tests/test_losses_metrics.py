"""Loss/metric numerics vs the reference TF formulas (multitasking_utils.py:38-85,
utils.py:466-491) and sklearn."""

import numpy as np
import jax.numpy as jnp
import pytest

from resuneta_tpu import losses, metrics


def _rand_probs(rng, shape):
    x = rng.uniform(0.01, 1.0, size=shape).astype(np.float32)
    return x / x.sum(axis=-1, keepdims=True)


def _rand_onehot(rng, b, h, w, c):
    ids = rng.integers(0, c, size=(b, h, w))
    return np.eye(c, dtype=np.float32)[ids]


class TestTanimotoVsTF:
    @pytest.fixture(scope="class")
    def tf(self):
        return pytest.importorskip("tensorflow")

    def test_tanimoto_loss_parity(self, tf):
        rng = np.random.default_rng(0)
        label = _rand_onehot(rng, 2, 16, 16, 5)
        pred = _rand_probs(rng, (2, 16, 16, 5))

        smooth = 1e-5
        Vli = tf.reduce_mean(tf.reduce_sum(label, axis=[1, 2]), axis=0)
        wli = tf.math.reciprocal(Vli ** 2)
        new_weights = tf.where(tf.math.is_inf(wli), tf.zeros_like(wli), wli)
        wli = tf.where(tf.math.is_inf(wli), tf.ones_like(wli) * tf.reduce_max(new_weights), wli)
        sum_square = tf.reduce_sum(tf.square(pred) + tf.square(label), axis=[1, 2])
        sum_product = tf.reduce_sum(pred * label, axis=[1, 2])
        num = tf.reduce_sum(wli * sum_product, axis=-1)
        den = tf.reduce_sum(wli * (sum_square - sum_product), axis=-1)
        golden = ((num + smooth) / (den + smooth)).numpy()

        ours = np.asarray(losses.tanimoto_loss(jnp.asarray(label), jnp.asarray(pred)))
        np.testing.assert_allclose(ours, golden, rtol=1e-5)

    def test_dual_includes_swapped_arg_asymmetry(self, tf):
        rng = np.random.default_rng(1)
        label = _rand_onehot(rng, 2, 8, 8, 3)
        pred = _rand_probs(rng, (2, 8, 8, 3))
        l1 = np.asarray(losses.tanimoto_loss(jnp.asarray(pred), jnp.asarray(label)))
        l2 = np.asarray(
            losses.tanimoto_loss(jnp.asarray(1 - label), jnp.asarray(1 - pred))
        )
        golden = np.mean(1.0 - 0.5 * (l1 + l2))
        ours = np.asarray(losses.tanimoto_dual_loss(jnp.asarray(label), jnp.asarray(pred)))
        np.testing.assert_allclose(ours, golden, rtol=1e-6)
        # and the asymmetry is real: swapping would give a different value
        swapped = np.asarray(losses.tanimoto_loss(jnp.asarray(label), jnp.asarray(pred)))
        assert not np.allclose(l1, swapped)

    def test_empty_class_inf_handling(self, tf):
        rng = np.random.default_rng(2)
        label = _rand_onehot(rng, 2, 8, 8, 4)
        label[..., 3] = 0.0  # class 3 absent -> Vli = 0 -> inf weight path
        pred = _rand_probs(rng, (2, 8, 8, 4))
        ours = np.asarray(losses.tanimoto_loss(jnp.asarray(label), jnp.asarray(pred)))
        assert np.all(np.isfinite(ours))


class TestKerasLosses:
    def test_wce_matches_formula(self):
        rng = np.random.default_rng(0)
        w = np.array([1.0, 2.0, 0.5], np.float32)
        y = _rand_onehot(rng, 2, 4, 4, 3)
        p = _rand_probs(rng, (2, 4, 4, 3))
        eps = 1e-7
        pn = p / p.sum(-1, keepdims=True)
        pn = np.clip(pn, eps, 1 - eps)
        golden = np.mean(-np.sum(y * np.log(pn) * w, -1))
        ours = np.asarray(losses.weighted_categorical_crossentropy(w)(jnp.asarray(y), jnp.asarray(p)))
        np.testing.assert_allclose(ours, golden, rtol=1e-4)

    def test_bce_mse_reductions(self):
        rng = np.random.default_rng(1)
        y = rng.uniform(0, 1, (2, 4, 4, 3)).astype(np.float32)
        p = rng.uniform(0.01, 0.99, (2, 4, 4, 3)).astype(np.float32)
        mse = np.asarray(losses.mean_squared_error(jnp.asarray(y), jnp.asarray(p)))
        np.testing.assert_allclose(mse, np.mean((y - p) ** 2), rtol=1e-6)
        bce = np.asarray(losses.binary_crossentropy(jnp.asarray(y), jnp.asarray(p)))
        golden = np.mean(-(y * np.log(p) + (1 - y) * np.log(1 - p)))
        np.testing.assert_allclose(bce, golden, rtol=1e-5)


class TestMetrics:
    def test_compute_metrics_vs_sklearn(self):
        skm = pytest.importorskip("sklearn.metrics")
        rng = np.random.default_rng(0)
        t = rng.integers(0, 5, 10000)
        p = rng.integers(0, 5, 10000)
        acc, f1, rec, prec = metrics.compute_metrics(t, p)
        np.testing.assert_allclose(acc, 100 * skm.accuracy_score(t, p), rtol=1e-9)
        np.testing.assert_allclose(f1, 100 * skm.f1_score(t, p, average=None), rtol=1e-9)
        np.testing.assert_allclose(rec, 100 * skm.recall_score(t, p, average=None), rtol=1e-9)
        np.testing.assert_allclose(prec, 100 * skm.precision_score(t, p, average=None), rtol=1e-9)
        np.testing.assert_array_equal(
            metrics.confusion_matrix(t, p), skm.confusion_matrix(t, p)
        )

    def test_miou_vs_sklearn_jaccard(self):
        skm = pytest.importorskip("sklearn.metrics")
        rng = np.random.default_rng(2)
        t = rng.integers(0, 5, 10000)
        p = rng.integers(0, 5, 10000)
        miou, ious = metrics.mean_iou(t, p)
        np.testing.assert_allclose(
            ious, skm.jaccard_score(t, p, average=None), rtol=1e-12)
        np.testing.assert_allclose(
            miou, skm.jaccard_score(t, p, average="macro"), rtol=1e-12)
        # absent class -> IoU 0 (sklearn zero_division=0), perfect class -> 1
        miou2, ious2 = metrics.mean_iou(
            np.zeros(64, int), np.zeros(64, int), labels=[0, 1])
        assert ious2[0] == 1.0 and ious2[1] == 0.0 and miou2 == 0.5

    def test_binary_counts_and_mcc(self):
        rng = np.random.default_rng(1)
        y = _rand_onehot(rng, 2, 8, 8, 5)
        p = _rand_probs(rng, (2, 8, 8, 5))
        tp, fp, tn, fn = (np.asarray(v) for v in metrics.binary_counts(jnp.asarray(y), jnp.asarray(p)))
        pt = p > 0.5
        yt = y > 0.5
        assert tp == np.sum(pt & yt)
        assert fp == np.sum(pt & ~yt)
        assert tn == np.sum(~pt & ~yt)
        assert fn == np.sum(~pt & yt)
        mcc = np.asarray(metrics.compute_mcc(tp, tn, fp, fn))
        denom = np.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
        np.testing.assert_allclose(mcc, (tp * tn - fp * fn) / denom, rtol=1e-6)

    def test_mcc_degenerate_batch_is_zero_not_nan(self):
        # all-one-class batch: every marginal but TP is 0 -> sklearn returns 0
        y = np.zeros((1, 4, 4, 2), np.float32)
        y[..., 1] = 1.0
        p = y.copy()
        tp, fp, tn, fn = metrics.binary_counts(jnp.asarray(y), jnp.asarray(p))
        mcc = np.asarray(metrics.compute_mcc(tp, tn, fp, fn))
        assert np.isfinite(mcc)
        # fp = fn = 0 but tn > 0 here (the 0-channel), so take a harder case too:
        mcc0 = np.asarray(metrics.compute_mcc(10.0, 0.0, 0.0, 0.0))
        assert mcc0 == 0.0

    def test_confusion_matrix_device(self):
        rng = np.random.default_rng(2)
        t = rng.integers(0, 4, 1000)
        p = rng.integers(0, 4, 1000)
        cm = np.asarray(metrics.confusion_matrix_device(jnp.asarray(t), jnp.asarray(p), 4))
        np.testing.assert_array_equal(cm, metrics.confusion_matrix(t, p, labels=range(4)))
