"""Sharding rules: data-parallel batches, tensor-parallel parameter layouts.

Parameters are replicated by default (pure DP — the functional equivalent of
DDP, reference: basic.py:115-122). With a non-trivial ``model`` mesh axis,
matmul-heavy parameters shard over it: attention qkv/proj kernels and ResBlock
conv kernels split on channel dimensions when divisible; the XLA partitioner
inserts the required collectives (all-gather/reduce-scatter over ICI). Norm
scales, biases, and embeddings stay replicated.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; scalars replicate
    (a rank-1 spec on a 0-d value would make device_put raise)."""
    if ndim == 0:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(("data",), *([None] * (ndim - 1))))


def _param_spec(path: str, shape, model_size: int) -> P:
    """TP layout for one parameter. ``path`` is the '/'-joined tree path."""
    if model_size <= 1 or len(shape) < 2:
        return P()
    name = path.split("/")[-2] if "/" in path else path
    last = shape[-1]
    second = shape[-2]
    # Column-parallel: qkv and the widening convs/denses split output features.
    if name in ("qkv", "in_conv", "emb_proj") and last % model_size == 0:
        return P(*([None] * (len(shape) - 1)), "model")
    # Row-parallel: projections back to the residual stream split input features.
    if name in ("proj", "out_conv", "skip_conv") and second % model_size == 0:
        return P(*([None] * (len(shape) - 2)), "model", None)
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding tree for a parameter pytree under ``mesh``."""
    model_size = mesh.shape.get("model", 1)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    specs = {}
    for path, leaf in flat:
        key = "/".join(
            p.key if hasattr(p, "key") else str(p) for p in path
        )
        specs[key] = NamedSharding(
            mesh, _param_spec(key, np.shape(leaf), model_size)
        )

    def lookup(path, leaf):
        key = "/".join(p.key if hasattr(p, "key") else str(p) for p in path)
        return specs[key]

    return jax.tree_util.tree_map_with_path(lookup, params)


def check_replication(params: Any) -> None:
    """Assert replicated parameters are bitwise identical across devices — the
    TPU-native analog of the reference's distributed self-check
    (reference: diffusion/trainers/basic.py:294-336 ``check_ddp``).

    Collective on multi-host meshes: local shards are compared directly, then
    a crc32 digest per replicated leaf is allgathered and compared across
    processes (every process must call this — the trainer does, at init/load
    and every ``i_ddpcheck`` steps)."""
    import zlib

    digests = []

    def check(path, leaf):
        if not hasattr(leaf, "addressable_shards"):
            return
        shards = leaf.addressable_shards
        if not leaf.sharding.is_fully_replicated:
            return
        if len(shards) > 1:
            base = np.asarray(shards[0].data)
            for s in shards[1:]:
                if not np.array_equal(base, np.asarray(s.data), equal_nan=True):
                    name = "/".join(str(p) for p in path)
                    raise AssertionError(
                        f"replicated param {name} differs across devices"
                    )
        if shards:
            digests.append(
                zlib.crc32(np.ascontiguousarray(
                    np.asarray(shards[0].data)
                ).tobytes())
            )

    jax.tree_util.tree_map_with_path(check, params)

    if jax.process_count() > 1 and digests:
        from jax.experimental import multihost_utils

        local = np.asarray(digests, np.uint32)
        all_digests = multihost_utils.process_allgather(local)
        if not (all_digests == local[None]).all():
            bad = int(np.argwhere((all_digests != local[None]).any(0))[0, 0])
            raise AssertionError(
                f"replicated param digest #{bad} differs across processes"
            )
