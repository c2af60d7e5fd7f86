"""compat.UNet — the legacy config-driven driver the reference's
ResUnet_a/train.py / test.py stubs call (`from model import UNet`) but
upstream never shipped (both stubs are broken as committed; see
/root/reference/ResUnet_a/train.py:1-10, test.py:1-18).

End-to-end: train on a tiny directory-pair dataset (PNG images + npy class-id
labels), reload the best checkpoint with loadWeight, predict (mean-subtract +
argmax, model_old.py:176-185), and render with visual()."""

import os

import numpy as np
import pytest
from PIL import Image

from resuneta_tpu.compat import UNet
from resuneta_tpu.utils.config import UnetConfig


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("postdam")
    rng = np.random.default_rng(0)
    os.makedirs(root / "train")
    os.makedirs(root / "label")
    os.makedirs(root / "test")
    for i in range(6):
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        Image.fromarray(img).save(root / "train" / f"p{i}.png")
        # same-named label (class-id map as .npy won't pair by name with
        # .png — the generator pairs by FILENAME, utils.py:27-35 — so save
        # labels as single-channel PNGs, exercising the channel-0 path)
        lab = rng.integers(0, 3, (64, 64), dtype=np.uint8)
        Image.fromarray(np.stack([lab] * 3, -1)).save(
            root / "label" / f"p{i}.png")
    Image.fromarray(rng.integers(0, 256, (96, 80, 3), dtype=np.uint8)).save(
        root / "test" / "t0.png")
    return root


def _config():
    c = UnetConfig()
    c.IMAGE_H = c.IMAGE_W = 64
    c.CLASSES_NUM = 3
    c.EPOCHS = 2
    c.BATCH_SIZE = 2
    return c


def test_train_load_predict_visual(dataset, tmp_path):
    logdir = str(tmp_path / "logs")
    unet = UNet(config=_config())
    history = unet.train(str(dataset), logdir)
    assert len(history) == 2
    assert np.isfinite(history[-1]["train"]["loss"])
    assert os.path.isdir(os.path.join(logdir, "best_model.ckpt"))

    # fresh driver: loadWeight(logdir) then the reference test.py loop body
    unet2 = UNet(config=_config())
    unet2.loadWeight(logdir)
    from resuneta_tpu.data.dataset import _resize_bilinear

    img = np.asarray(Image.open(dataset / "test" / "t0.png"))
    img = _resize_bilinear(img, 64, 64)
    result = unet2.predict(img)
    assert result.shape == (64, 64)
    assert result.min() >= 0 and result.max() < 3

    out = tmp_path / "test-result" / "0.png"
    unet2.visual(result, str(out))
    rendered = np.asarray(Image.open(out))
    assert rendered.shape == (64, 64, 3)

    # the restored params predict identically to the trainer's final best
    r1 = unet.predict(img)
    # (trainer state is the LAST state; best checkpoint may differ — only
    # check the restored prediction is a valid class map, done above.)
    assert r1.shape == result.shape
