"""Multi-camera batch sampling — the FineSampler / get_stamp_list equivalents
(utils/loader_utils.py:13-52, active when opt.dataloader is on)."""

from __future__ import annotations

import random

import numpy as np


def get_stamp_list(n_total: int, n_poses: int, timestamp: int) -> list[int]:
    """Indices of all poses at one timestamp (loader_utils.py:13-19)."""
    frame_length = n_total // n_poses
    if timestamp > frame_length:
        raise IndexError("input timestamp bigger than total timestamp.")
    return [i * frame_length + timestamp for i in range(n_poses)]


class FineSampler:
    """Temporal curriculum sampler (loader_utils.py:20-52): per timestamp,
    4 shuffled passes over the poses, interleaving pairs of previously seen
    samples for replay."""

    def __init__(self, n_total: int, n_poses: int, seed: int = 0):
        rng = random.Random(seed)
        nprng = np.random.RandomState(seed)
        frame_length = n_total // n_poses
        sample_list: list[int] = []
        for i in range(frame_length):
            now_list: list[int] = []
            for _ in range(4):
                idx = nprng.permutation(n_poses) * frame_length + i
                now_list = []
                cnt = 0
                for item in idx.tolist():
                    now_list.append(int(item))
                    cnt += 1
                    if cnt % 2 == 0 and len(sample_list) > 2:
                        now_list += rng.sample(sample_list, 2)
            sample_list += now_list
        self.sample_list = sample_list

    def __iter__(self):
        return iter(self.sample_list)

    def __len__(self):
        return len(self.sample_list)
