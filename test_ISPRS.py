#!/usr/bin/env python
"""ISPRS inference/eval entry point (reference CLI contract: test_ISPRS.py
--use_multitasking --model_path --dataset_path -ps --norm_type --num_classes
--output_path). See resuneta_tpu/cli/test_isprs.py."""

from resuneta_tpu.cli.test_isprs import main

if __name__ == "__main__":
    main()
