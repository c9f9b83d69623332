"""Host-side warp-conditioning synthesis in dataloader workers.

The reference hides its warp-data synthesis cost inside CPU dataloader
workers (reference: datasets/base.py:215-238 — the warp runs in torch
DataLoader worker processes while the GPU trains on the previous batch).
`HostWarpDataset` is the TPU-native equivalent: it wraps a base RGBD dataset
and attaches `y`/`mask`/`pose`(/`mask_rgb`) to every item by running the SAME
`ivid_tpu.training.warp_cond.synthesize_single` program the device trainer
uses, jitted on the host CPU backend. With `IVID_TPU_LOADER_MODE=process` and
enough workers, conditioning for batch k+1 is synthesized while the chip runs
batch k's fwd/bwd — the cond step costs the same as the uncond step.

Sizing: the warp raster is ~O(100 ms)/sample on one CPU core; workers must
sustain `batch_size / uncond_step_time` samples/s, so a batch-16 · 224 ms
step needs roughly `16 · 0.1 / 0.224 ≈ 8` worker processes. On hosts without
spare cores (this dev box has 1), keep the default on-device synthesis — the
loader would starve the chip. This trade is the reference's too; it ships the
same knob as `num_workers`.

RNG: each item draw folds (seed, index, visit-count) — deterministic within a
worker's lifetime, fresh augments every epoch (visit increments). Unlike the
on-device path (rng folded from the global step), a mid-epoch resume restarts
visit counters, so post-resume conditioning noise differs from the unresumed
run; the DATA stream stays exact (loader cursor), only augmentation
randomness re-rolls. The reference's numpy-global-rng workers have the same
property (base.py:220-235).
"""

from __future__ import annotations

from functools import partial

import numpy as np


class HostWarpDataset:
    """Wrap a warp dataset so `__getitem__` returns items WITH conditioning.

    Picklable (spawned process workers pickle the dataset over): the jitted
    synthesis function and the CPU device handle are rebuilt lazily per
    process and dropped from `__getstate__`.
    """

    def __init__(self, base, *, augments, pose_std, near, far, seed=0):
        self.base = base
        self.augments = tuple(augments)
        self.pose_std = float(pose_std)
        self.near = float(near)
        self.far = float(far)
        self.seed = int(seed)
        self._fn = None
        self._cpu = None
        self._visits = {}

    # -- dataset surface the loader/trainer relies on --
    def __len__(self):
        return len(self.base)

    @property
    def image_size(self):
        return self.base.image_size

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_fn"] = None
        state["_cpu"] = None
        state["_visits"] = {}  # fresh per worker process
        return state

    def _ensure_fn(self):
        if self._fn is None:
            import multiprocessing

            import jax

            from ivid_tpu.training import warp_cond

            if multiprocessing.parent_process() is not None:
                # Spawned loader worker: pin the CPU platform BEFORE any
                # backend initializes. Without this, jax.devices("cpu") spins
                # up the whole backend registry — every worker would dial the
                # TPU (the axon plugin self-registers from sitecustomize).
                jax.config.update("jax_platforms", "cpu")
            self._cpu = jax.devices("cpu")[0]
            self._fn = jax.jit(
                partial(
                    warp_cond.synthesize_single,
                    augments=self.augments, pose_std=self.pose_std,
                    near=self.near, far=self.far,
                )
            )

    def synthesize(self, rgbd01, rng):
        """Run the shared synthesis program on the host CPU backend.

        `jax.default_device` scopes the placement: in thread-mode loaders this
        runs inside the trainer process without touching the TPU stream; in
        spawned workers it is the only backend ever initialized."""
        import jax

        self._ensure_fn()
        with jax.default_device(self._cpu):
            return self._fn(rgbd01, rng)

    def get_with_rng(self, index, rng):
        """Deterministic fetch: base item + conditioning drawn from `rng`."""
        item = dict(self.base[index])
        x01 = np.asarray(item["x_0"], np.float32) * 0.5 + 0.5
        out = self.synthesize(x01, rng)
        item.update({k: np.asarray(v) for k, v in out.items()})
        return item

    def __getitem__(self, index):
        import jax

        visit = self._visits.get(index, 0)
        self._visits[index] = visit + 1
        self._ensure_fn()
        with jax.default_device(self._cpu):
            rng = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(self.seed), index), visit
            )
            return self.get_with_rng(index, rng)
