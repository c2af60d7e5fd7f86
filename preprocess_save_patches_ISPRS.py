#!/usr/bin/env python
"""ISPRS preprocessing entry point (reference CLI contract:
preprocess_save_patches_ISPRS.py --norm_type --patch_size --stride --num_classes
--data_aug). See resuneta_tpu/cli/preprocess_isprs.py."""

from resuneta_tpu.cli.preprocess_isprs import main

if __name__ == "__main__":
    main()
