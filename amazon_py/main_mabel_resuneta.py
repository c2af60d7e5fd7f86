#!/usr/bin/env python
"""ResUnet-a multitask-on-Amazon variant (reference: amazon_py/main_mabel_resuneta.py,
stale as committed — its label helpers are called on image patches and reference
undefined names). Equivalent run: train_amazon with --resunet_a True
--multitasking True (bound/dist heads derived on-device from the one-hot labels;
no HSV head on 14-channel input)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from resuneta_tpu.cli.train_amazon import main

if __name__ == "__main__":
    main(["--resunet_a", "True", "--multitasking", "True"] + sys.argv[1:])
