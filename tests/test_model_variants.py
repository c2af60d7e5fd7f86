"""Historical model variants + experimental ResNet50-UNet: param parity and shapes.

Anchors from the reference Keras graphs (tf count_params incl. BN stats):
  ResUnet_a/model.py v1, ps=64: multitask 42,196,290; single-task 42,149,621.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from resuneta_tpu.models import ResUnetAV1, ResUnetALegacy, ResNet50UNet
from resuneta_tpu.utils.config import UnetConfig


def _count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


class TestV1:
    @pytest.mark.parametrize("multitask,expected",
                             [(True, 42_196_290), (False, 42_149_621)])
    def test_param_count(self, multitask, expected):
        model = ResUnetAV1(num_classes=5, img_size=64, multitasking=multitask)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
        total = _count(v["params"]) + _count(v["batch_stats"])
        assert total == expected

    def test_forward_multitask(self):
        model = ResUnetAV1(num_classes=5, img_size=64, multitasking=True)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
        out = model.apply(v, jnp.ones((1, 64, 64, 3)), train=False)
        assert out["seg"].shape == (1, 64, 64, 5)
        assert out["color"].shape == (1, 64, 64, 3)


class TestLegacy:
    @pytest.mark.parametrize("ps", [64, 128])
    def test_adaptive_depth_forward(self, ps):
        model = ResUnetALegacy(num_classes=5, img_size=ps)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, 3)), train=False)
        out = model.apply(v, jnp.ones((1, ps, ps, 3)), train=False)
        assert out.shape == (1, ps, ps, 5)
        np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)

    def test_depth_depends_on_size(self):
        # fewer encoder stages at 64 than at 128 -> fewer params
        v64 = ResUnetALegacy(num_classes=5, img_size=64).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
        v128 = ResUnetALegacy(num_classes=5, img_size=128).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 128, 128, 3)), train=False)
        assert _count(v64["params"]) < _count(v128["params"])

    def test_predict_ids_mean_subtract(self):
        model = ResUnetALegacy(num_classes=3, img_size=64)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
        ids = model.predict_ids(v, np.zeros((64, 64, 3), np.float32))
        assert ids.shape == (64, 64)

    def test_unet_config(self, capsys):
        cfg = UnetConfig()
        assert cfg.CLASSES_NUM == 5 and cfg.MEAN == [82.0, 92.0, 88.0]
        cfg.displayConfiguration()
        assert "CLASSES_NUM" in capsys.readouterr().out


class TestResNet50UNet:
    def test_forward(self):
        model = ResNet50UNet(num_classes=3)
        v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 14)), train=False)
        out = model.apply(v, jnp.ones((1, 64, 64, 14)), train=False)
        assert out.shape == (1, 64, 64, 3)
