#!/usr/bin/env python
"""ISPRS training entry point (reference CLI contract: train_ISPRS.py --resunet_a
--multitasking --gpu_parallel -rp -cp -dp -bs -lr --loss -optm --num_classes
--epochs -ps --bound_weight --dist_weight --color_weight).
See resuneta_tpu/cli/train_isprs.py."""

from resuneta_tpu.cli.train_isprs import main

if __name__ == "__main__":
    main()
