"""CLI helpers shared by entry points (str2bool matches train_ISPRS.py:19-27)."""

import argparse
import os


def setup_platform():
    """Honor RESUNETA_PLATFORM=cpu|tpu for CLI runs. (The axon TPU plugin ignores
    the standard JAX_PLATFORMS env var, so tests/CI force CPU through jax.config.)"""
    plat = os.environ.get("RESUNETA_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    elif v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")
