"""Model topology tests: output shapes/ranges at several patch sizes, and exact
parameter-count parity with the reference Keras graphs.

Parameter anchors were computed once from the reference implementation
(ResUnet_a/model2.py via tf.keras count_params(), incl. BN moving stats;
utils.py:98-133 UNet likewise):
    ResUnet-a multitask  ps=64 : 41,684,434
    ResUnet-a multitask  ps=128: 42,210,554
    ResUnet-a multitask  ps=256: 42,736,674
    ResUnet-a single     ps=256: 42,690,005  (ps=64: 41,637,765)
    UNet (256, 5 classes):        3,523,173
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from resuneta_tpu.models import ResUnetA, UNet


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def _init(model, ps, in_ch=3):
    x = jnp.zeros((1, ps, ps, in_ch), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return variables, x


class TestResUnetA:
    @pytest.mark.parametrize("ps,expected", [(64, 41_684_434), (128, 42_210_554)])
    def test_param_count_multitask(self, ps, expected):
        model = ResUnetA(num_classes=5, img_size=ps, multitasking=True)
        variables, _ = _init(model, ps)
        total = _count(variables["params"]) + _count(variables["batch_stats"])
        assert total == expected

    def test_param_count_singletask(self):
        model = ResUnetA(num_classes=5, img_size=64, multitasking=False)
        variables, _ = _init(model, 64)
        total = _count(variables["params"]) + _count(variables["batch_stats"])
        assert total == 41_637_765

    def test_multitask_outputs(self):
        ps = 64
        model = ResUnetA(num_classes=5, img_size=ps, multitasking=True)
        variables, x = _init(model, ps)
        out = model.apply(variables, jnp.ones_like(x), train=False)
        assert set(out.keys()) == {"seg", "bound", "dist", "color"}
        assert out["seg"].shape == (1, ps, ps, 5)
        assert out["bound"].shape == (1, ps, ps, 5)
        assert out["dist"].shape == (1, ps, ps, 5)
        assert out["color"].shape == (1, ps, ps, 3)
        # softmax heads sum to 1; sigmoid heads within (0, 1)
        np.testing.assert_allclose(np.asarray(out["seg"]).sum(-1), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["dist"]).sum(-1), 1.0, atol=1e-5)
        assert np.all((np.asarray(out["bound"]) > 0) & (np.asarray(out["bound"]) < 1))
        assert np.all((np.asarray(out["color"]) > 0) & (np.asarray(out["color"]) < 1))

    def test_train_mode_updates_batch_stats(self):
        ps = 64
        model = ResUnetA(num_classes=5, img_size=ps, multitasking=False)
        variables, x = _init(model, ps)
        out, mutated = model.apply(
            variables, jnp.ones_like(x), train=True, mutable=["batch_stats"]
        )
        # running stats must actually change
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        changed = any(not np.allclose(b, a) for b, a in zip(before, after))
        assert changed

    def test_14_channel_input(self):
        # Amazon workload: two-year 7-band stacks (amazon_py/main_tcc.py:31-38)
        ps = 64
        model = ResUnetA(num_classes=3, img_size=ps, multitasking=False)
        variables, x = _init(model, ps, in_ch=14)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, ps, ps, 3)

    def test_bfloat16_compute(self):
        ps = 64
        model = ResUnetA(num_classes=5, img_size=ps, multitasking=True,
                         dtype=jnp.bfloat16)
        variables, x = _init(model, ps)
        out = model.apply(variables, jnp.ones_like(x), train=False)
        # heads cast back to f32 and stay finite
        assert out["seg"].dtype == jnp.float32
        assert np.all(np.isfinite(np.asarray(out["seg"])))


class TestUNet:
    def test_param_count(self):
        model = UNet(num_classes=5)
        variables, _ = _init(model, 64)
        assert _count(variables["params"]) == 3_523_173

    def test_output(self):
        model = UNet(num_classes=5)
        variables, x = _init(model, 64)
        out = model.apply(variables, jnp.ones_like(x))
        assert out.shape == (1, 64, 64, 5)
        np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)
