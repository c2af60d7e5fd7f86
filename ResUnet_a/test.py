#!/usr/bin/env python
"""Legacy postdam testing driver (reference ResUnet_a/test.py:1-18).

Upstream is broken as committed (imports a nonexistent UNet; uses `os`
without importing it); this is the working equivalent: restore the best
checkpoint from the train driver's logdir, predict every image under
`dataset-postdam/test` resized to the config shape, and render the class
maps to `test-result/{i}.png` (mean-subtract + argmax semantics of
ResUnet_a/model_old.py:176-185). Env overrides: RESUNETA_DATASET,
RESUNETA_LOGS, RESUNETA_OUT."""

import os

import numpy as np
from PIL import Image

from resuneta_tpu.compat import UNet
from resuneta_tpu.data.dataset import _resize_bilinear
from resuneta_tpu.utils.config import UnetConfig

if __name__ == "__main__":
    config = UnetConfig()
    unet = UNet(config=config)
    unet.loadWeight(os.environ.get("RESUNETA_LOGS", "./logs"))
    dataset = os.environ.get("RESUNETA_DATASET", "./dataset-postdam")
    out = os.environ.get("RESUNETA_OUT", "./test-result")
    imgdir = sorted(os.listdir(os.path.join(dataset, "test")))
    for index, name in enumerate(imgdir):
        img = np.asarray(Image.open(os.path.join(dataset, "test", name)))
        img = _resize_bilinear(img, config.IMAGE_H, config.IMAGE_W)
        result = unet.predict(img)
        unet.visual(result, os.path.join(out, f"{index}.png"))
