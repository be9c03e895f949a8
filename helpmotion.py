#!/usr/bin/env python
"""Flow visualization CLI + SceneFlow helper (reference helpmotion.py):
renders the Middlebury color-wheel visualization of the dense flows stored in
a stage-1 train_data artifact.

Usage: python helpmotion.py --input_dir demo/scene_0 [--which our_flow|T2C_flow]
"""

import os
import sys
from argparse import ArgumentParser

import numpy as np

from mom_tpu.motion.flow_viz import flow2img, flow_to_color, make_colorwheel  # noqa: F401


class SceneFlow:
    """Per-point 3D flow parameter (reference helpmotion.py:23-30); the
    actual optimization lives in mom_tpu/motion/sceneflow.py — this class is
    retained for API parity."""

    def __init__(self, coord):
        self.flow = np.zeros_like(np.asarray(coord, np.float32))

    def __call__(self):
        return self.flow


def save_image(img: np.ndarray, path: str):
    from PIL import Image
    Image.fromarray(np.asarray(img)).save(path)


def main(argv=None):
    parser = ArgumentParser(description="Flow visualization")
    parser.add_argument("--input_dir", type=str, required=True)
    parser.add_argument("--which", type=str, default="our_flow",
                        choices=["our_flow", "T2C_flow"])
    parser.add_argument("--out_dir", type=str, default=None)
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    from mom_tpu.data.scene import load_train_data
    data = load_train_data(os.path.join(args.input_dir, "MOM",
                                        "train_data.pth"))
    out_dir = args.out_dir or os.path.join(args.input_dir, "MOM", "Flow_viz")
    os.makedirs(out_dir, exist_ok=True)
    for idx, frame in enumerate(data["frames"]):
        flows = frame.get(args.which)
        if not flows:
            continue
        flow = np.asarray(flows[0])[0]
        save_image(flow2img(flow), os.path.join(out_dir,
                                                str(idx).zfill(3) + ".png"))
    print(f"wrote visualizations to {out_dir}")


if __name__ == "__main__":
    main()
