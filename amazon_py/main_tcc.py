#!/usr/bin/env python
"""ResUnet-a-on-Amazon training variant (reference: amazon_py/main_tcc.py, which is
stale as committed — imports a nonexistent Resunet_a2). Equivalent run:
train_amazon with --resunet_a True and the tcc tile selection."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from resuneta_tpu.cli.train_amazon import main

if __name__ == "__main__":
    main(["--resunet_a", "True"] + sys.argv[1:])
