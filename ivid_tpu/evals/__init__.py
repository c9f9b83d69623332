from ivid_tpu.evals.metrics import (
    compute_metrics,
    frechet_distance,
    inception_score,
    kernel_inception_distance,
)

__all__ = [
    "compute_metrics",
    "frechet_distance",
    "inception_score",
    "kernel_inception_distance",
]
