#!/usr/bin/env python
"""Legacy postdam training driver (reference ResUnet_a/train.py:1-10).

The upstream stub is broken as committed (`from model import UNet` — model.py
defines only Resunet_a); this is the working equivalent on the TPU framework:
the size-adaptive legacy model (ResUnet_a/model_old.py) trained with
Adam(1e-3) + Tanimoto over `dataset-postdam/{train,label}` image pairs.
Env overrides: RESUNETA_DATASET, RESUNETA_LOGS."""

import os

from resuneta_tpu.compat import UNet
from resuneta_tpu.utils.config import UnetConfig

if __name__ == "__main__":
    config = UnetConfig()
    config.displayConfiguration()
    unet = UNet(config=config)
    unet.train(os.environ.get("RESUNETA_DATASET", "dataset-postdam"),
               os.environ.get("RESUNETA_LOGS", "logs"))
