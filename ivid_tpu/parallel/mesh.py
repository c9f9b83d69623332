"""Device-mesh construction for data/model parallel training.

The reference's only parallelism is process-per-GPU DDP over NCCL
(reference: train.py:40-47,159-162; basic.py:115-122). The TPU-native
equivalent is a ``jax.sharding.Mesh`` with a ``data`` axis (and an optional
``model`` axis for tensor parallelism — the mesh stays open for TP as a config
change, SURVEY.md §2 parallelism accounting). Gradients reduce over ICI via the
XLA partitioner; no explicit collectives are written here.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh. ``data`` defaults to
    ``len(devices) // model``."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model == len(devices), (
        f"mesh {data}x{model} != {len(devices)} devices"
    )
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))
