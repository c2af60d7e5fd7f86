#!/usr/bin/env python
"""Amazon preprocessing entry point (reference CLI contract:
preprocess_save_patches_Amazon.py --norm_type --patch_size --stride --num_classes
--data_aug --def_percent). See resuneta_tpu/cli/preprocess_amazon.py."""
from resuneta_tpu.cli.preprocess_amazon import main

if __name__ == "__main__":
    main()
