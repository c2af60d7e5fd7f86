#!/usr/bin/env python
"""Amazon deforestation eval entry point (reference: amazon_py/test_amazon.py).
See resuneta_tpu/cli/test_amazon.py."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from resuneta_tpu.cli.test_amazon import main

if __name__ == "__main__":
    main()
