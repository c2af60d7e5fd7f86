#!/usr/bin/env python
"""No-tile-split Amazon training variant (reference: amazon_py/main2_no_tiles.py):
whole-scene strided extraction with the valid-footprint filter."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from resuneta_tpu.cli.train_amazon import main

if __name__ == "__main__":
    main(["--use_tiles", "False"] + sys.argv[1:])
