"""Trainers: data-parallel diffusion training with EMA, checkpointing, logging.

TPU-native re-design of the reference trainer stack
(reference: diffusion/trainers/{basic,inpaint,superres}.py):

- The train step is ONE jitted program over a ``(data, model)`` mesh: batch
  sharded over ``data``, params replicated (or TP-sharded over ``model``);
  the XLA partitioner inserts the gradient all-reduce that DDP's backward hooks
  provide in the reference (basic.py:115-122). Gradient accumulation
  (``batch_split``) is a ``lax.scan`` over microbatches inside the same program
  (reference: basic.py:349-361 no_sync loop).
- bf16 torso + fp32 params need no loss scaling: the reference's fp16
  master-param machinery (trainers/utils.py:43-89, basic.py:359-374) is
  intentionally dropped; ``fp16_mode``/``fp16_scale_growth`` config keys are
  accepted and ignored for config compatibility.
- EMA runs on-device for each configured rate (basic.py:284-292).
- The Inpaint trainer synthesizes its warp conditioning ON DEVICE inside the
  train step (vmapped forward-backward warp + augments) instead of the
  reference's per-worker OpenGL rendering (datasets/base.py:215-267).
- ``check_replication`` is the ``check_ddp`` analog (basic.py:294-336), run at
  init, after loads, and every ``i_ddpcheck`` steps.
"""

from __future__ import annotations

import json
import os
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization

from ivid_tpu.data.loader import DataLoader
from ivid_tpu.diffusion import samplers
from ivid_tpu.ops import warp as warp_ops
from ivid_tpu.training import warp_cond
from ivid_tpu.parallel import (
    batch_sharding,
    check_replication,
    make_mesh,
    param_shardings,
    replicated,
)
from ivid_tpu.training import checkpoint as ckpt_io
from ivid_tpu.utils import save_image_grid


def _host_array(x) -> np.ndarray:
    """Fetch a (possibly multi-host-sharded) jax.Array as host numpy.

    Sampling is collective — every process enters the jitted program — but
    only the master writes files. With model-sharded params the sampler
    output may come back sharded rather than fully replicated, and
    ``np.asarray`` on a non-fully-addressable global array raises on every
    process; gather it explicitly first."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        x = multihost_utils.process_allgather(x, tiled=True)
    return np.asarray(x)


class BasicTrainer:
    """(reference: diffusion/trainers/basic.py:22-453)."""

    def __init__(
        self,
        framework,
        dataset,
        output_dir: str,
        *,
        max_steps: int,
        batch_size: Optional[int] = None,
        batch_size_per_gpu: Optional[int] = None,
        batch_split: Optional[int] = None,
        learning_rate: float = 1e-4,
        weight_decay: float = 0.0,
        ema_rate=0.9999,
        i_print: int = 1000,
        i_log: int = 500,
        i_sample: int = 10000,
        i_save: int = 10000,
        i_ddpcheck: int = 10000,
        sample_at_init: bool = True,
        model_parallel: int = 1,
        seed: int = 0,
        # Accepted for reference-config compatibility; no-ops on TPU (bf16).
        fp16_mode: Optional[str] = None,
        fp16_scale_growth: float = 1e-3,
    ):
        del fp16_mode, fp16_scale_growth
        assert batch_size is not None or batch_size_per_gpu is not None
        self.framework = framework
        self.model = framework.model
        self.dataset = dataset
        self.output_dir = output_dir
        self.max_steps = max_steps
        self.learning_rate = learning_rate
        self.weight_decay = weight_decay
        self.ema_rate = [ema_rate] if isinstance(ema_rate, float) else list(ema_rate)
        self.i_print = i_print
        self.i_log = i_log
        self.i_sample = i_sample
        self.i_save = i_save
        self.i_ddpcheck = i_ddpcheck
        self.sample_at_init = sample_at_init
        self.seed = seed

        self.mesh = make_mesh(model=model_parallel)
        n_data = self.mesh.shape["data"]
        # batch_size_per_gpu maps to per-data-mesh-slice batch (basic.py:74-76).
        self.batch_size = (
            batch_size if batch_size_per_gpu is None else batch_size_per_gpu * n_data
        )
        self.batch_size_per_device = self.batch_size // n_data
        self.batch_split = batch_split or 1
        assert self.batch_size % n_data == 0
        assert self.batch_size % self.batch_split == 0

        os.makedirs(os.path.join(output_dir, "ckpts"), exist_ok=True)
        os.makedirs(os.path.join(output_dir, "samples"), exist_ok=True)

        self.step = 0
        self._init_params_and_opt()
        self._build_loader()
        self._compile()
        check_replication(self.params)
        self._print_banner()

    # ---- setup ----

    def _init_params_and_opt(self):
        s = self.dataset.image_size
        c = self.model.in_channels
        x = jnp.zeros((1, s, s, c))
        t = jnp.zeros((1,), jnp.int32)
        cl = jnp.zeros((1,), jnp.int32) if self.model.num_classes else None
        params = self.model.init(jax.random.PRNGKey(self.seed), x, t, cl)["params"]

        self.tx = optax.adamw(
            self.learning_rate, weight_decay=self.weight_decay
        )
        opt_state = self.tx.init(params)

        self.param_sharding = param_shardings(params, self.mesh)
        self.params = jax.device_put(params, self.param_sharding)
        # Optimizer state follows the param layout: adam's mu/nu subtrees are
        # params-shaped, so they take param_sharding wholesale (keeping TP'd
        # moments TP'd); scalars (count) replicate.
        pstruct = jax.tree_util.tree_structure(params)
        is_param_tree = lambda n: jax.tree_util.tree_structure(n) == pstruct
        self._opt_sharding = jax.tree.map(
            lambda n: self.param_sharding if is_param_tree(n)
            else replicated(self.mesh),
            opt_state, is_leaf=is_param_tree,
        )
        self.opt_state = jax.device_put(opt_state, self._opt_sharding)
        # Explicit copies: device_put of an already-placed array with the same
        # sharding aliases the buffer, which would break jit donation.
        self.ema_params = [
            jax.tree.map(
                lambda x: jnp.array(x, copy=True),
                jax.device_put(params, replicated(self.mesh)),
            )
            for _ in self.ema_rate
        ]
        self.rng = jax.random.PRNGKey(self.seed + 1)

    def _loader_dataset(self):
        """Hook: the dataset handed to the DataLoader (trainers may wrap it,
        e.g. host-side warp synthesis in loader workers)."""
        return self.dataset

    def _build_loader(self, start=(0, 0)):
        self._loader_obj = DataLoader(
            self._loader_dataset(),
            batch_size=self.batch_size,
            num_workers=int(os.environ.get("IVID_TPU_LOADER_WORKERS", "4")),
            worker_mode=os.environ.get("IVID_TPU_LOADER_MODE", "thread"),
            seed=self.seed,
            shard_index=jax.process_index(),
            num_shards=jax.process_count(),
            start=tuple(int(x) for x in start),
        )
        self.loader = iter(self._loader_obj)

    def prepare_batch(self, batch: dict, rng: jax.Array) -> dict:
        """Hook: trainers transform the raw host batch on device (e.g. warp)."""
        del rng
        return batch

    def _loss_fn(self, params, rng, batch):
        return self.framework.training_loss(params, rng, batch)

    def _train_step(self, params, opt_state, ema_params, rng, batch):
        rng_prep, rng_loss = jax.random.split(rng)
        batch = self.prepare_batch(batch, rng_prep)

        if self.batch_split > 1:
            # Microbatch gradient accumulation as an in-program scan
            # (reference: basic.py:349-361).
            split = lambda x: x.reshape((self.batch_split, -1) + x.shape[1:])
            micro = jax.tree.map(split, batch)

            def body(acc, inp):
                i, mb = inp
                (loss, metrics), grads = jax.value_and_grad(
                    self._loss_fn, has_aux=True
                )(params, jax.random.fold_in(rng_loss, i), mb)
                acc_grads, acc_loss = acc
                return (
                    jax.tree.map(jnp.add, acc_grads, grads),
                    acc_loss + loss,
                ), metrics

            zero_grads = jax.tree.map(jnp.zeros_like, params)
            (grads, loss_sum), metrics = jax.lax.scan(
                body, (zero_grads, 0.0), (jnp.arange(self.batch_split), micro)
            )
            grads = jax.tree.map(lambda g: g / self.batch_split, grads)
            metrics = jax.tree.map(lambda m: m.mean(), metrics)
        else:
            (loss_sum, metrics), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True
            )(params, rng_loss, batch)

        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = [
            jax.tree.map(
                lambda e, p: e * rate + p.astype(e.dtype) * (1.0 - rate),
                ema, params,
            )
            for rate, ema in zip(self.ema_rate, ema_params)
        ]
        return params, opt_state, ema_params, metrics

    def _compile(self):
        self._step_fn = jax.jit(
            self._train_step,
            donate_argnums=(0, 1, 2),
        )

    # ---- checkpointing (reference: basic.py:196-252) ----

    def save(self):
        # EMA + misc first, model LAST: latest-step discovery keys on
        # model_step*, so a mid-save kill leaves either a complete step or one
        # whose missing model file makes resume fall back to the previous
        # step — never a step that loads partially (all writes are atomic
        # tmp+rename in ckpt_io.save_params).
        for rate, ema in zip(self.ema_rate, self.ema_params):
            ckpt_io.save_params(
                ckpt_io.ema_path(self.output_dir, rate, self.step), ema
            )
        # Besides optimizer state + step (reference: basic.py:244-252 persists
        # opt state, step and the fp16 log_scale), persist the PRNG state and
        # the loader cursor so a killed-and-resumed run reproduces the exact
        # loss sequence of an uninterrupted one (tested).
        misc = {
            "opt_state": jax.device_get(self.opt_state),
            "step": self.step,
            "rng": jax.device_get(self.rng),
            "loader_pos": np.asarray(self._loader_obj.position, np.int64),
            "ema_rates": np.asarray(self.ema_rate, np.float64),
        }
        misc_file = ckpt_io.misc_path(self.output_dir, self.step)
        with open(misc_file + ".tmp", "wb") as f:
            f.write(serialization.to_bytes(misc))
        os.replace(misc_file + ".tmp", misc_file)
        ckpt_io.save_params(
            ckpt_io.model_path(self.output_dir, self.step), self.params
        )

    def load(self, load_dir: str, step: int = 0):
        params = ckpt_io.load_native_params(
            ckpt_io.model_path(load_dir, step), jax.device_get(self.params)
        )
        self.params = jax.device_put(params, self.param_sharding)
        for i, rate in enumerate(self.ema_rate):
            ema = ckpt_io.load_native_params(
                ckpt_io.ema_path(load_dir, rate, step),
                jax.device_get(self.ema_params[i]),
            )
            self.ema_params[i] = jax.device_put(ema, replicated(self.mesh))
        template = {
            "opt_state": jax.device_get(self.opt_state),
            "step": 0,
            "rng": jax.device_get(self.rng),
            "loader_pos": np.zeros((2,), np.int64),
            "ema_rates": np.asarray(self.ema_rate, np.float64),
        }
        with open(ckpt_io.misc_path(load_dir, step), "rb") as f:
            raw = f.read()
        try:
            misc = serialization.from_bytes(template, raw)
        except (KeyError, ValueError):
            # Older misc checkpoints carry only opt_state + step.
            misc = serialization.from_bytes(
                {"opt_state": template["opt_state"], "step": 0}, raw
            )
        self.opt_state = jax.device_put(misc["opt_state"], self._opt_sharding)
        self.step = int(misc["step"])
        if "rng" in misc:
            self.rng = jnp.asarray(misc["rng"])
            saved_rates = [float(r) for r in np.asarray(misc["ema_rates"])]
            assert saved_rates == [float(r) for r in self.ema_rate], (
                f"checkpoint EMA rates {saved_rates} != trainer {self.ema_rate}"
            )
            self._build_loader(start=misc["loader_pos"])
        check_replication(self.params)

    # ---- periodic eval sampling (reference: basic.py:254-282) ----

    def _visualization_batch(self, num_samples: int) -> dict:
        """Fetch a random item batch directly for sampling visualization.

        A throwaway prefetching DataLoader here would load ~5x the items and
        abandon its worker pool to GC; direct indexed fetch is exact."""
        idx = np.random.default_rng(1234 + self.step).choice(
            len(self.dataset), size=min(num_samples, len(self.dataset)),
            replace=False,
        )
        items = [self.dataset[int(i)] for i in idx]
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    def _replicated_batch(self, batch: dict) -> dict:
        """Lift a host batch (identical on every process) to globally-replicated
        device arrays, so sampling programs can run collectively over the
        global mesh in multi-controller runs."""
        if jax.process_count() == 1:
            return {k: jnp.asarray(v) for k, v in batch.items()}
        rep = replicated(self.mesh)
        return {
            k: jax.make_array_from_callback(
                np.shape(v), rep, lambda idx, a=np.asarray(v): a[idx]
            )
            for k, v in batch.items()
        }

    def sample(self, suffix: Optional[str] = None, num_samples: int = 25, batch_size: int = 25):
        if suffix is None:
            suffix = f"step{self.step:07d}"
        s = self.dataset.image_size
        outs = []
        for i in range(0, num_samples, batch_size):
            b = min(batch_size, num_samples - i)
            rng = jax.random.fold_in(self.rng, 10_000 + i)
            if self.model.num_classes:
                classes = jax.random.randint(
                    jax.random.fold_in(rng, 1), (b,), 0, self.model.num_classes
                )
                cond = {"classes": classes}
                guidance = 3.0
            else:
                cond, guidance = None, 0.0
            out = samplers.ddim_sample(
                self.framework, self.params, rng,
                num=b, image_size=s, cond=cond, guidance=guidance,
                steps=min(250, self.framework.schedule.timesteps),
            )
            outs.append(_host_array(out["samples"]))
        if jax.process_index() != 0:
            return  # computation above was collective; file IO is master-only
        imgs = np.concatenate(outs, axis=0)
        nrow = int(np.sqrt(num_samples))
        save_image_grid(
            os.path.join(self.output_dir, "samples", f"rgb_{suffix}.png"),
            imgs[..., :3], nrow=nrow,
        )
        if imgs.shape[-1] == 4:
            save_image_grid(
                os.path.join(self.output_dir, "samples", f"depth_{suffix}.png"),
                imgs[..., 3:], nrow=nrow,
            )

    # ---- the loop (reference: basic.py:338-453) ----

    def _global_batch(self, batch: dict) -> dict:
        """Assemble the globally-sharded device batch from this process's
        local rows. The loader yields only the ``batch_size/process_count``
        block this process contributes (reference DistributedSampler semantics,
        basic.py:140-154), so multi-host assembly must go through
        ``make_array_from_process_local_data`` — a plain device_put would
        reinterpret the local block as the whole global batch."""
        if jax.process_count() == 1:
            return {
                k: jax.device_put(v, batch_sharding(self.mesh, np.ndim(v)))
                for k, v in batch.items()
            }
        return {
            k: jax.make_array_from_process_local_data(
                batch_sharding(self.mesh, np.ndim(v)), np.asarray(v)
            )
            for k, v in batch.items()
        }

    def run_step(self):
        batch = next(self.loader)
        device_batch = self._global_batch(batch)
        self.rng, step_rng = jax.random.split(self.rng)
        self.params, self.opt_state, self.ema_params, metrics = self._step_fn(
            self.params, self.opt_state, self.ema_params, step_rng, device_batch
        )
        return metrics

    def run(self):
        log_file = open(os.path.join(self.output_dir, "log.txt"), "a")
        is_master = jax.process_index() == 0
        if self.step == 0 and self.sample_at_init:
            # Initial sample grid (reference: basic.py:389-391); disable for
            # smoke runs where a 250-step DDIM at init dwarfs the training.
            # Entered by ALL processes: sampling launches programs over the
            # global mesh, which multi-controller JAX requires every process
            # to join (file writes inside are master-gated).
            self.sample(suffix="init")
        log = []
        time_elapsed = 0.0
        while self.step < self.max_steps:
            t0 = time.time()
            metrics = self.run_step()
            if (self.step + 1) % self.i_log == 0 or (
                self.i_print and (self.step + 1) % self.i_print == 0
            ):
                metrics = jax.device_get(metrics)  # sync point
            dt = time.time() - t0
            time_elapsed += dt
            self.step += 1

            if self.i_ddpcheck and self.step % self.i_ddpcheck == 0:
                check_replication(self.params)

            if is_master:
                log.append(
                    (self.step, {
                        "time": {"step": dt, "elapsed": time_elapsed},
                        "loss": (
                            {k: float(v) for k, v in metrics.items()}
                            if self.step % self.i_log == 0 else None
                        ),
                    })
                )
                if self.i_print and self.step % self.i_print == 0:
                    # Console progress (reference: basic.py prints every
                    # i_print steps; log.txt/mlflow stay on the i_log cadence).
                    print(
                        f"step {self.step}/{self.max_steps} "
                        f"loss {float(metrics['loss']):.4f} "
                        f"({dt * 1000:.0f} ms/step, {time_elapsed:.0f}s elapsed)",
                        flush=True,
                    )
                if self.step % self.i_log == 0:
                    for st, rec in log:
                        print(f"{st}: {json.dumps(rec)}", file=log_file)
                    log_file.flush()
                    self._log_metrics(log)
                    log = []
                if self.step % self.i_save == 0:
                    self.save()
            if self.step % self.i_sample == 0:
                # Collective (see sample_at_init note): all processes enter.
                self.sample()

    def _log_metrics(self, log):
        try:
            import mlflow

            mlflow.log_metric(
                "step_time", float(np.mean([r["time"]["step"] for _, r in log])),
                self.step,
            )
            losses = [r["loss"]["loss"] for _, r in log if r["loss"]]
            if losses:
                mlflow.log_metric("loss", float(np.mean(losses)), self.step)
        except Exception:  # noqa: BLE001 — mlflow is optional
            pass

    def _print_banner(self):
        if jax.process_index() != 0:
            return
        print("\nTrainer initialized.")
        print(f"  - Backbone: {self.model.__class__.__name__}")
        print(f"  - Framework: {self.framework.__class__.__name__}")
        print(f"  - Dataset: {self.dataset.__class__.__name__}")
        print(f"  - Mesh: {dict(self.mesh.shape)}")
        print(f"  - Batch size: {self.batch_size}")
        print(f"  - Batch split: {self.batch_split}")
        print(f"  - LR / WD: {self.learning_rate} / {self.weight_decay}")
        print(f"  - EMA rates: {self.ema_rate}")


class FinetuneMixin:
    """Channel-pad finetune loading (reference: inpaint.py:68-94)."""

    def finetune_from(self, finetune_ckpt: str):
        backbone_args = getattr(self, "_backbone_args", None) or {}
        params = ckpt_io.finetune_load(
            finetune_ckpt, jax.device_get(self.params), backbone_args
        )
        self.params = jax.device_put(params, self.param_sharding)
        check_replication(self.params)


class InpaintTrainer(FinetuneMixin, BasicTrainer):
    """Conditional-completion trainer with on-device warp conditioning
    (reference: diffusion/trainers/inpaint.py + datasets/base.py:197-267)."""

    def __init__(self, framework, dataset, output_dir, *, finetune_ckpt=None,
                 backbone_args=None, warp_host=None, **kwargs):
        self._backbone_args = backbone_args
        self.augments = list(getattr(dataset, "augments", []))
        self.pose_std = float(getattr(dataset, "std", 0.15))
        self.near = float(getattr(dataset, "near", 0.5))
        self.far = float(getattr(dataset, "far", 100.0))
        #: synthesize warp conditioning in dataloader workers on the CPU
        #: backend (the reference's architecture, datasets/base.py:215-238:
        #: warp cost overlaps the train step instead of serializing with it
        #: inside the jitted program). Needs enough host cores to keep up —
        #: see data/warp_host.py. Env IVID_TPU_WARP_HOST overrides the config.
        if os.environ.get("IVID_TPU_WARP_HOST"):
            warp_host = os.environ["IVID_TPU_WARP_HOST"] not in ("0", "")
        self.warp_host = bool(warp_host)
        super().__init__(framework, dataset, output_dir, **kwargs)
        if finetune_ckpt:
            self.finetune_from(finetune_ckpt)

    def _loader_dataset(self):
        if not self.warp_host:
            return self.dataset
        from ivid_tpu.data.warp_host import HostWarpDataset

        return HostWarpDataset(
            self.dataset, augments=self.augments, pose_std=self.pose_std,
            near=self.near, far=self.far, seed=self.seed,
        )

    def prepare_batch(self, batch, rng):
        """Train-step conditioning hook: on-device synthesis by default, a
        pass-through when the loader already attached host-synthesized
        conditioning (``warp_host``)."""
        if self.warp_host:
            del rng  # loader workers drew the augment/pose randomness
            return batch
        return self.synthesize_cond(batch, rng)

    def synthesize_cond(self, batch, rng):
        """On-device warp-data synthesis (reference: datasets/base.py:215-267):
        random orbit pose, forward-backward warp, noise/blur/erode augments.

        The warp runs through `forward_backward_warp_batch` in groups of
        ``IVID_TPU_WARP_GROUP`` samples (default 8): grouping fuses the
        per-sample raster sorts/kernels and pixel glue into batched ops
        (a vmapped Pallas raster is ~2.4x SLOWER — the batched path instead
        gives fragments global pixel ids and resolves ONE wide framebuffer)
        while bounding fragment-buffer memory (~130 MB of sort arrays per
        8-sample group at 128²·3 SSAA). Outputs are identical to a
        per-sample ``lax.map`` up to fragment summation order inside
        equal-depth ties."""
        x01 = batch["x_0"] * 0.5 + 0.5  # datasets normalize to [-1,1]
        b = x01.shape[0]
        rngs = jax.random.split(rng, b)

        pre = partial(
            warp_cond.presample,
            augments=tuple(self.augments), pose_std=self.pose_std,
        )
        rgbd_in, mv1, pose = jax.vmap(pre)(x01, rngs)

        g = int(os.environ.get("IVID_TPU_WARP_GROUP", "8"))
        g = max(d for d in range(1, min(g, b) + 1) if b % d == 0)
        res = jax.lax.map(
            lambda args: warp_ops.forward_backward_warp_batch(
                args[0], args[1], padding=self.dataset.image_size,
                near=self.near, far=self.far,
            ),
            (
                rgbd_in.reshape((b // g, g) + rgbd_in.shape[1:]),
                mv1.reshape(b // g, g, 4, 4),
            ),
        )
        res = jax.tree.map(lambda x: x.reshape((b,) + x.shape[2:]), res)

        post = partial(warp_cond.postprocess, augments=tuple(self.augments))
        warped = jax.vmap(post)(
            x01, rngs, res["color"], res["depth"], res["mask"]
        )
        warped["pose"] = pose
        out = dict(batch)
        out.update(warped)
        return out

    def sample(self, suffix: Optional[str] = None, num_samples: int = 25, batch_size: int = 25):
        """Conditional sampling visualization (reference: inpaint.py:96-137).

        Collective: every process enters. ``_visualization_batch`` is
        deterministic in ``step``, so all processes build the SAME host batch;
        it is lifted to globally-replicated arrays, warp + sampling run as
        lockstep programs over the global mesh, and only the master writes
        files (the reference saves rank-0 grids under DDP,
        inpaint.py:96-137)."""
        if suffix is None:
            suffix = f"step{self.step:07d}"
        batch = self._visualization_batch(num_samples)
        # _visualization_batch clamps to the dataset size; the sampler's noise
        # batch must match the conditioning rows or pack_inputs shape-errors.
        num_samples = len(next(iter(batch.values())))
        device_batch = self._replicated_batch(batch)
        rng = jax.random.fold_in(self.rng, 20_000 + self.step)
        if not hasattr(self, "_synthesize_cond_jit"):
            # Jitted once: a fresh jax.jit wrapper per call would re-trace the
            # warp pipeline (minutes of remote lowering) on every sampling.
            # Always the DEVICE synthesis, even under warp_host: visualization
            # must be deterministic in `step` and identical on every process
            # (collective lockstep), which the loader workers' stateful host
            # rng cannot guarantee.
            self._synthesize_cond_jit = jax.jit(self.synthesize_cond)
        cond = self._synthesize_cond_jit(device_batch, jax.random.fold_in(rng, 0))
        guidance = 3.0 if self.model.num_classes else 0.0
        out = samplers.ddim_sample(
            self.framework, self.params, rng,
            num=num_samples, image_size=self.dataset.image_size,
            cond=cond, guidance=guidance,
            steps=min(250, self.framework.schedule.timesteps),
        )
        # _host_array may allgather (a collective program): every process must
        # make these calls, not just the master that writes the files.
        imgs = _host_array(out["samples"])
        mask = _host_array(cond["mask"])
        y = _host_array(cond["y"])
        mask_rgb = (
            _host_array(cond["mask_rgb"]) if "mask_rgb" in cond else None
        )
        if jax.process_index() != 0:
            return  # computation above was collective; file IO is master-only
        nrow = int(np.sqrt(num_samples))
        d = os.path.join(self.output_dir, "samples")
        g = partial(save_image_grid, nrow=nrow)
        g(os.path.join(d, f"mask_{suffix}.png"), mask, value_range=(0, 1))
        g(os.path.join(d, f"rgb_gt_{suffix}.png"), np.asarray(batch["x_0"])[..., :3])
        g(os.path.join(d, f"rgb_cond_{suffix}.png"), y[..., :3])
        g(os.path.join(d, f"rgb_{suffix}.png"), imgs[..., :3])
        g(os.path.join(d, f"depth_gt_{suffix}.png"), np.asarray(batch["x_0"])[..., 3:])
        g(os.path.join(d, f"depth_cond_{suffix}.png"), y[..., 3:])
        g(os.path.join(d, f"depth_{suffix}.png"), imgs[..., 3:])
        if mask_rgb is not None:
            g(os.path.join(d, f"mask_rgb_{suffix}.png"), mask_rgb, value_range=(0, 1))


class SuperResTrainer(FinetuneMixin, BasicTrainer):
    """Super-resolution trainer (reference: diffusion/trainers/superres.py)."""

    def __init__(self, framework, dataset, output_dir, *, finetune_ckpt=None,
                 backbone_args=None, **kwargs):
        self._backbone_args = backbone_args
        super().__init__(framework, dataset, output_dir, **kwargs)
        if finetune_ckpt:
            self.finetune_from(finetune_ckpt)

    def sample(self, suffix: Optional[str] = None, num_samples: int = 9, batch_size: int = 9):
        """(reference: superres.py:96-134) — 50 DDIM steps. Collective like
        InpaintTrainer.sample: all processes enter, master writes."""
        if suffix is None:
            suffix = f"step{self.step:07d}"
        batch = self._visualization_batch(num_samples)
        num_samples = len(next(iter(batch.values())))  # clamped to dataset
        cond = self._replicated_batch(
            {k: v for k, v in batch.items() if k != "x_0"}
        )
        rng = jax.random.fold_in(self.rng, 30_000 + self.step)
        guidance = 3.0 if self.model.num_classes else 0.0
        out = samplers.ddim_sample(
            self.framework, self.params, rng,
            num=num_samples, image_size=self.dataset.image_size,
            cond=cond, guidance=guidance,
            steps=min(50, self.framework.schedule.timesteps),
        )
        imgs = _host_array(out["samples"])
        if jax.process_index() != 0:
            return  # computation above was collective; file IO is master-only
        nrow = int(np.sqrt(num_samples))
        d = os.path.join(self.output_dir, "samples")
        g = partial(save_image_grid, nrow=nrow)
        g(os.path.join(d, f"rgb_gt_{suffix}.png"), np.asarray(batch["x_0"])[..., :3])
        g(os.path.join(d, f"rgb_cond_{suffix}.png"), np.asarray(batch["y"])[..., :3])
        g(os.path.join(d, f"rgb_{suffix}.png"), imgs[..., :3])
        g(os.path.join(d, f"depth_gt_{suffix}.png"), np.asarray(batch["x_0"])[..., 3:])
        g(os.path.join(d, f"depth_cond_{suffix}.png"), np.asarray(batch["y"])[..., 3:])
        g(os.path.join(d, f"depth_{suffix}.png"), imgs[..., 3:])


TRAINERS = {
    "BasicTrainer": BasicTrainer,
    "InpaintTrainer": InpaintTrainer,
    "SuperResTrainer": SuperResTrainer,
}
