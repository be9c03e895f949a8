#!/usr/bin/env python
"""Labelme label.png -> binary mask.png (reference scripts/generate_mask.py)."""

import sys

import numpy as np
from PIL import Image


def main(label_path: str, out_path: str):
    label = np.asarray(Image.open(label_path).convert("RGB"))
    mask = (label.sum(-1) > 0).astype(np.uint8) * 255
    Image.fromarray(mask).save(out_path)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
