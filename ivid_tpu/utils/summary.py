"""Model summary: per-module parameter counts and forward FLOPs.

The reference writes a torchinfo summary with per-layer mult-adds into the run
directory (reference: train.py:50-66,146-147); this produces the equivalent
``model_summary.txt`` from the flax param tree and the XLA cost model."""

from __future__ import annotations

from typing import Optional

import numpy as np


def model_summary(model, params, example_inputs: tuple, flops: Optional[float] = None) -> str:
    import jax

    lines = [f"{model.__class__.__name__}", "=" * 72]
    total = 0
    groups: dict = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = path[0].key if hasattr(path[0], "key") else str(path[0])
        n = int(np.prod(np.shape(leaf)))
        groups[key] = groups.get(key, 0) + n
        total += n
    width = max(len(k) for k in groups)
    for key in sorted(groups):
        lines.append(f"{key:<{width}}  {groups[key]:>14,}")
    lines.append("=" * 72)
    lines.append(f"Total params: {total:,} ({total * 4 / 1e6:.1f} MB fp32)")
    if flops is None:
        try:
            fn = jax.jit(lambda p, *a: model.apply({"params": p}, *a))
            cost = fn.lower(params, *example_inputs).compile().cost_analysis()
            flops = float(cost.get("flops", 0.0))
        except Exception:  # noqa: BLE001 — cost analysis is best-effort
            flops = None
    if flops:
        lines.append(f"Forward FLOPs (XLA cost model): {flops / 1e9:.2f} GFLOP")
    return "\n".join(lines)
