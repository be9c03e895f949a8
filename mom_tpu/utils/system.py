"""Filesystem helpers (reference utils/system_utils.py:16-28)."""

from __future__ import annotations

import os


def mkdir_p(path: str):
    os.makedirs(path, exist_ok=True)


def search_for_max_iteration(folder: str) -> int:
    saved = [int(fname.split("_")[-1]) for fname in os.listdir(folder)]
    return max(saved)
