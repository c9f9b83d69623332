"""Seeded batch collection from a dataset (reference: inference/utils.py:58-71).

Draws one item per seed (seed → deterministic index) and stacks the fields —
used to build conditional-sampling demo batches from real data."""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def collect_data(dataset, seeds: Sequence[int]) -> Dict[str, np.ndarray]:
    out: Dict[str, list] = {}
    for seed in seeds:
        idx = int(np.random.default_rng(seed).integers(0, len(dataset)))
        item = dataset[idx]
        for k, v in item.items():
            out.setdefault(k, []).append(np.asarray(v))
    return {k: np.stack(v, axis=0) for k, v in out.items()}
