from ivid_tpu.parallel.mesh import make_mesh
from ivid_tpu.parallel.sharding import (
    batch_sharding,
    check_replication,
    param_shardings,
    replicated,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "check_replication",
    "param_shardings",
    "replicated",
]
