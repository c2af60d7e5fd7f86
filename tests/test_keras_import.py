"""Keras->Flax weight-import forward parity (tools/import_keras.py).

Builds the reference's own Keras graph (ResUnet_a/model2.py, imported read-only
from /root/reference), random-initializes it, imports the weights into
resuneta_tpu.models.ResUnetA, and asserts all four heads agree on random
inputs. This is the harness that makes the reference's trained .h5 checkpoints
and recorded quality anchors (infos_training_train_on_batch.txt:65-117)
checkable without retraining.
"""

import os
import sys

os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")  # keep TF convs bit-stable

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

tf = pytest.importorskip("tensorflow")

from tools.import_keras import (build_reference_model, import_keras_weights,
                                keras_layer_order, flax_layer_order)


PS, NC = 64, 5


@pytest.fixture(scope="module")
def pair():
    from resuneta_tpu.models import ResUnetA
    kmodel = build_reference_model(patch_size=PS, num_classes=NC,
                                   multitasking=True)
    model = ResUnetA(num_classes=NC, img_size=PS, multitasking=True)
    return kmodel, model


def test_layer_counts_match(pair):
    kmodel, model = pair
    kconvs, kbns = keras_layer_order(kmodel, multitasking=True)
    convs, bns, _ = flax_layer_order(model, (1, PS, PS, 3))
    assert len(kconvs) == len(convs)
    assert len(kbns) == len(bns)


def test_forward_parity_all_heads(pair):
    kmodel, model = pair
    # randomize the Keras BN statistics too, so eval mode is a real test
    rng = np.random.default_rng(0)
    for layer in kmodel.layers:
        if type(layer).__name__ == "BatchNormalization":
            g, b, m, v = layer.get_weights()
            layer.set_weights([
                1 + 0.1 * rng.standard_normal(g.shape).astype(np.float32),
                0.1 * rng.standard_normal(b.shape).astype(np.float32),
                0.2 * rng.standard_normal(m.shape).astype(np.float32),
                (1 + 0.1 * rng.standard_normal(v.shape)).astype(np.float32),
            ])

    variables = import_keras_weights(kmodel, model, (1, PS, PS, 3),
                                     multitasking=True)

    x = rng.random((2, PS, PS, 3), np.float32)
    kout = kmodel(tf.constant(x), training=False)
    kout = {k: np.asarray(v) for k, v in kout.items()}

    import jax.numpy as jnp
    ours = model.apply(variables, jnp.asarray(x), train=False)
    ours = {k: np.asarray(v) for k, v in ours.items()}

    assert set(kout) == set(ours) == {"seg", "bound", "dist", "color"}
    for head in ("seg", "bound", "dist", "color"):
        np.testing.assert_allclose(ours[head], kout[head], rtol=5e-3, atol=2e-3,
                                   err_msg=head)
    # the decision surface must agree exactly almost everywhere
    agree = np.mean(np.argmax(ours["seg"], -1) == np.argmax(kout["seg"], -1))
    assert agree > 0.999, agree


def test_end_to_end_eval_parity(pair):
    """Given the reference's weights, our whole eval chain (patch chop ->
    batched prediction -> argmax -> confusion matrix) must reproduce the
    reference's own flow (Keras predict, test_ISPRS.py semantics) — the §6
    quality-anchor machinery, demonstrated without trained checkpoints."""
    kmodel, model = pair
    rng = np.random.default_rng(42)
    for layer in kmodel.layers:
        if type(layer).__name__ == "BatchNormalization":
            g, b, m, v = layer.get_weights()
            layer.set_weights([
                1 + 0.1 * rng.standard_normal(g.shape).astype(np.float32),
                0.1 * rng.standard_normal(b.shape).astype(np.float32),
                0.1 * rng.standard_normal(m.shape).astype(np.float32),
                (1 + 0.1 * np.abs(rng.standard_normal(v.shape))).astype(np.float32),
            ])
    variables = import_keras_weights(kmodel, model, (1, PS, PS, 3),
                                     multitasking=True)

    # synthetic normalized scene, chopped exactly like test_ISPRS.py (non-overlap)
    import jax
    import jax.numpy as jnp
    from resuneta_tpu.ops.patches import extract_patches_nonoverlap
    from resuneta_tpu.infer import predict_patches
    from resuneta_tpu.metrics import confusion_matrix

    scene = rng.random((2 * PS, 3 * PS, 3), np.float32)
    truth = rng.integers(0, NC, (2 * PS, 3 * PS))
    patches = extract_patches_nonoverlap(scene, PS, order="row")
    truth_p = extract_patches_nonoverlap(truth, PS, order="row")

    # reference flow: Keras predict + argmax
    kpred = np.asarray(kmodel(tf.constant(patches), training=False)["seg"])
    kids = np.argmax(kpred, -1)

    # our flow: batched jitted prediction + device argmax
    apply_fn = jax.jit(lambda x: model.apply(variables, x, train=False))
    preds = predict_patches(apply_fn, patches, batch_size=4)
    ours = np.argmax(preds["seg"], -1)

    agree = np.mean(kids == ours)
    assert agree > 0.999, agree

    cm_ref = np.asarray(confusion_matrix(truth_p.reshape(-1), kids.reshape(-1)))
    cm_ours = np.asarray(confusion_matrix(truth_p.reshape(-1), ours.reshape(-1)))
    total = cm_ref.sum()
    assert np.abs(cm_ref - cm_ours).sum() / total < 2e-3


class TestExportRoundTrip:
    """Flax -> Keras .h5 export (tools/export_keras.py, the reverse of the
    importer): a framework checkpoint written into the reference graph and
    saved as a legacy full-model .h5 must (a) survive the reference's own
    load path (`load_model(path, compile=False)`, test_ISPRS.py:276-279) and
    (b) predict identically to the Flax model it came from — train here,
    evaluate there."""

    def test_h5_round_trip_forward_parity(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from resuneta_tpu.models import ResUnetA
        from tools.export_keras import export_keras_weights

        rng = np.random.default_rng(7)
        model = ResUnetA(num_classes=NC, img_size=PS, multitasking=True)
        variables = model.init(
            jax.random.PRNGKey(3), jnp.zeros((1, PS, PS, 3)), train=False)
        # perturb BN stats away from init so eval mode is a real test
        variables = jax.tree_util.tree_map(
            lambda v: v + jnp.asarray(
                0.05 * rng.standard_normal(v.shape), v.dtype),
            variables)

        kmodel = build_reference_model(patch_size=PS, num_classes=NC,
                                       multitasking=True)
        export_keras_weights(variables, model, (1, PS, PS, 3), kmodel,
                             multitasking=True)
        path = str(tmp_path / "exported.h5")
        kmodel.save(path)

        loaded = tf.keras.models.load_model(path, compile=False)
        x = rng.random((2, PS, PS, 3), np.float32)
        kout = loaded(tf.constant(x), training=False)
        ours = model.apply(variables, jnp.asarray(x), train=False)
        # atol 2e-2: the randomly-perturbed init saturates the softmax, and a
        # handful of near-boundary logits land on different sides of TF's vs
        # XLA's conv rounding (observed: 2/40960 elements at |diff| ~1.3e-2);
        # the decision surface below is the strict check
        for head in ("seg", "bound", "dist", "color"):
            np.testing.assert_allclose(
                np.asarray(ours[head]), np.asarray(kout[head]),
                rtol=5e-3, atol=2e-2, err_msg=head)
        agree = np.mean(np.argmax(np.asarray(ours["seg"]), -1) ==
                        np.argmax(np.asarray(kout["seg"]), -1))
        assert agree > 0.999, agree

    def test_import_export_import_fixed_point(self, pair):
        """importer(exporter(v)) == v exactly: weights written into Keras and
        read back must be bit-identical (pure permutation, no arithmetic)."""
        import jax
        import jax.numpy as jnp
        from resuneta_tpu.models import ResUnetA
        from tools.export_keras import export_keras_weights

        kmodel, model = pair
        rng = np.random.default_rng(11)
        variables = model.init(
            jax.random.PRNGKey(5), jnp.zeros((1, PS, PS, 3)), train=False)
        variables = jax.tree_util.tree_map(
            lambda v: v + jnp.asarray(
                0.03 * rng.standard_normal(v.shape), v.dtype),
            variables)
        export_keras_weights(variables, model, (1, PS, PS, 3), kmodel,
                             multitasking=True)
        back = import_keras_weights(kmodel, model, (1, PS, PS, 3),
                                    multitasking=True)
        for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(back)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
