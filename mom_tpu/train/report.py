"""Training eval / observability — the training_report equivalent
(train_4DGS.py:354-404): periodic L1/PSNR (+SSIM) on test/train camera
subsets, scalar logging to TensorBoard when importable (train_4DGS.py:43-47)
and always to a JSONL metrics file."""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax.numpy as jnp

from . import losses


class MetricsLogger:
    """JSONL + optional TensorBoard scalar sink."""

    def __init__(self, model_path: str, enable_tb: bool = True):
        os.makedirs(model_path, exist_ok=True)
        self.jsonl = open(os.path.join(model_path, "metrics.jsonl"), "a")
        self.tb = None
        if enable_tb:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.tb = SummaryWriter(model_path)
            except Exception:
                print("Tensorboard not available: not logging progress")

    def scalar(self, tag: str, value: float, step: int):
        self.jsonl.write(json.dumps({"tag": tag, "value": float(value),
                                     "step": int(step),
                                     "t": time.time()}) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            self.tb.add_scalar(tag, float(value), step)

    def histogram(self, tag: str, values, step: int):
        if self.tb is not None:
            self.tb.add_histogram(tag, np.asarray(values), step)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


def evaluate(render_fn, cams, gts_uint8, every: int = 1,
             max_views: int | None = None):
    """L1/PSNR/SSIM over the test cameras (training_report's eval,
    train_4DGS.py:362-391; full coverage by default).
    render_fn(index) -> (H, W, 3) in [0, 1]."""
    idxs = list(range(0, len(cams), every))
    if max_views is not None:
        idxs = idxs[:max_views]
    l1s, psnrs, ssims = [], [], []
    for i in idxs:
        img = jnp.clip(render_fn(i), 0.0, 1.0)
        gt = jnp.clip(jnp.asarray(gts_uint8[i], jnp.float32) / 255.0, 0.0, 1.0)
        l1s.append(float(losses.l1_loss(img, gt)))
        psnrs.append(float(losses.psnr(img, gt)))
        ssims.append(float(losses.ssim(img, gt)))
    return {"l1": float(np.mean(l1s)), "psnr": float(np.mean(psnrs)),
            "ssim": float(np.mean(ssims)), "n_views": len(idxs)}


def training_report(logger: MetricsLogger, iteration: int, stage: str,
                    metrics: dict, eval_result: dict | None = None,
                    num_points: int | None = None):
    for k, v in metrics.items():
        logger.scalar(f"{stage}/train/{k}", v, iteration)
    if num_points is not None:
        logger.scalar(f"{stage}/total_points", num_points, iteration)
    if eval_result:
        for k, v in eval_result.items():
            logger.scalar(f"{stage}/test/{k}", v, iteration)
        print(f"\n[ITER {iteration}] Evaluating test: "
              f"L1 {eval_result['l1']:.5f} PSNR {eval_result['psnr']:.2f} "
              f"SSIM {eval_result['ssim']:.4f}")
