#!/usr/bin/env python
"""Summarize a training run's metrics.jsonl into final numbers."""

import json
import sys
from collections import defaultdict


def main(path):
    by_tag = defaultdict(list)
    for line in open(path):
        rec = json.loads(line)
        by_tag[rec["tag"]].append((rec["step"], rec["value"]))
    for tag in sorted(by_tag):
        steps = by_tag[tag]
        last_step, last_val = steps[-1]
        print(f"{tag:45s} last@{last_step}: {last_val:.5f}  (n={len(steps)})")


if __name__ == "__main__":
    main(sys.argv[1])
