#!/usr/bin/env python
"""GeoTIFF -> npy converter (reference: save_tif2npy.py — one-shot GDAL read of the
ISPRS train/test images + references, saved CHW).

Host-side offline tool, explicitly outside the perf path (README workflow step 1).
GDAL is not required: PIL/tifffile are tried in order; SAR rasters can apply the
dB -> linear conversion of utils.py:44-50 (10 ** (db / 10)) with --sar.
"""

import argparse
import os

import numpy as np


def load_tiff_image(path):
    """Read a TIFF into a CHW numpy array (multi-band aware)."""
    try:
        import tifffile

        img = tifffile.imread(path)
        if img.ndim == 3 and img.shape[-1] <= 16:
            img = img.transpose(2, 0, 1)
        return img
    except ImportError:
        pass
    try:
        from PIL import Image

        img = np.array(Image.open(path))
        if img.ndim == 3:
            img = img.transpose(2, 0, 1)
        return img
    except Exception as e:
        raise RuntimeError(
            f"could not read {path}: install tifffile or Pillow with TIFF support"
        ) from e


def load_SAR_image(path):
    """utils.py:44-50: SAR raster stored in dB -> linear power."""
    db_img = load_tiff_image(path).astype(np.float64)
    return 10 ** (db_img / 10)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", "-i", type=str, nargs="+", required=True,
                        help="TIFF file(s) to convert")
    parser.add_argument("--output_dir", "-o", type=str, default=".")
    parser.add_argument("--sar", action="store_true",
                        help="apply the dB->linear SAR conversion")
    args = parser.parse_args(argv)

    os.makedirs(args.output_dir, exist_ok=True)
    for path in args.input:
        img = load_SAR_image(path) if args.sar else load_tiff_image(path)
        base = os.path.splitext(os.path.basename(path))[0]
        out = os.path.join(args.output_dir, base + ".npy")
        np.save(out, img)
        print(f"{path} -> {out} shape={img.shape} dtype={img.dtype}")


if __name__ == "__main__":
    main()
