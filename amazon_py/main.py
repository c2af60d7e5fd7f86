#!/usr/bin/env python
"""Amazon deforestation training entry point (the runnable equivalent of the
reference's amazon_py/main.py). See resuneta_tpu/cli/train_amazon.py."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from resuneta_tpu.cli.train_amazon import main

if __name__ == "__main__":
    main()
