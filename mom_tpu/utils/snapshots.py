"""Debug training snapshots — render_training_image equivalent
(utils/scene_utils.py:10-77, active when model.render_process=True):
gt | render | normalized-depth triptychs with stage/iter/time labels."""

from __future__ import annotations

import os

import numpy as np


def render_training_image(model_path: str, stage: str, iteration: int,
                          elapsed_s: float, gt: np.ndarray,
                          rendered: np.ndarray, depth: np.ndarray,
                          tag: str = ""):
    from PIL import Image, ImageDraw
    out_dir = os.path.join(model_path, f"{stage}_render", "images")
    os.makedirs(out_dir, exist_ok=True)

    depth_n = np.asarray(depth, np.float32)
    depth_n = depth_n / max(float(depth_n.max()), 1e-8)
    depth3 = np.repeat(depth_n[..., None], 3, axis=-1)
    trip = np.concatenate([np.asarray(gt, np.float32),
                           np.asarray(rendered, np.float32), depth3], axis=1)
    img = Image.fromarray((np.clip(trip, 0, 1) * 255).astype(np.uint8))
    draw = ImageDraw.Draw(img)
    mins = elapsed_s / 60.0
    unit = "min" if mins < 1 else "mins"
    draw.text((10, 10), f"stage:{stage},iter:{iteration}", fill=(255, 0, 0))
    draw.text((img.width - 180, 10), f"time:{mins:.2f}{unit}",
              fill=(255, 0, 0))
    img.save(os.path.join(out_dir, f"{iteration}_{tag}.jpg"))
