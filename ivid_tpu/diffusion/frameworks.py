"""Diffusion frameworks: forward process, losses, and conditioning protocols.

A framework bundles a backbone (flax module) with a noise schedule and defines

- ``training_loss(params, rng, batch)``   — the training objective, and
- ``model_inference(params, rng, x, t, cond, guidance)`` — how conditional inputs
  are packed and classifier-free guidance is composed at sampling time.

Both are pure functions of their inputs, designed to be jitted / scanned. The
reference reflects on the backbone's Python signature to route kwargs
(reference: diffusion/frameworks/gaussian_diffusion.py:31,90); here conditioning is
an explicit dict pytree with documented keys instead.

Classifier-free guidance runs the conditional and unconditional branches as ONE
batched forward over ``concat([cond, uncond])`` rather than two sequential model
calls (reference: diffusion/frameworks/classifier_free_guidance.py:39-42) — on TPU
this doubles MXU utilization of the sampling hot loop instead of doubling latency.

Batch/cond dict keys (all NHWC):
- ``x_0``:      [B,H,W,4] RGBD target in [-1,1]
- ``classes``:  [B] int32 labels, -1 = null class (optional)
- ``y``:        conditioning image; partial RGBD for inpainting, low-res RGBD for SR
- ``mask``:     [B,H,W,1] visibility of ``y``'s depth (inpainting)
- ``mask_rgb``: [B,H,W,1] visibility of ``y``'s RGB (inpainting, optional)
"""

from __future__ import annotations

import dataclasses
from typing import Any, ClassVar, Dict, Optional

import jax
import jax.numpy as jnp

from ivid_tpu.diffusion import schedules as sched


Batch = Dict[str, jax.Array]


def _tile2(x):
    """Duplicate the batch dim for the fused CFG forward."""
    return None if x is None else jnp.concatenate([x, x], axis=0)


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Base eps-prediction DDPM framework
    (reference: diffusion/frameworks/gaussian_diffusion.py:12-116)."""

    model: Any  # flax linen module with __call__(x, t, classes)
    schedule: sched.Schedule

    # The base framework has no guidance concept — its reference counterpart
    # takes no strength argument (gaussian_diffusion.py:76-91); only the CFG
    # subclasses compose the two-branch prediction.
    supports_cfg: ClassVar[bool] = False

    # ---- conditioning protocol (overridden by subclasses) ----

    def pack_inputs(self, rng: jax.Array, x: jax.Array, cond: Batch) -> jax.Array:
        """Concatenate conditional channels onto the noisy input."""
        del rng, cond
        return x

    def _classes(self, cond: Batch) -> Optional[jax.Array]:
        return cond.get("classes") if cond else None

    def apply(self, params, x, t, classes) -> jax.Array:
        return self.model.apply({"params": params}, x, t, classes)

    # ---- inference ----

    def model_inference(
        self,
        params,
        rng: jax.Array,
        x: jax.Array,
        t: jax.Array,
        cond: Optional[Batch] = None,
        guidance: float = 0.0,
    ) -> jax.Array:
        """Predict eps(x_t, t). With ``guidance > 0`` and class labels present,
        compose ``(1+s)·eps(cond) − s·eps(null)`` via one batched forward."""
        cond = cond or {}
        packed = self.pack_inputs(rng, x, cond)
        classes = self._classes(cond)
        if self.supports_cfg and guidance and guidance > 0 and classes is not None:
            x2 = _tile2(packed)
            t2 = _tile2(t)
            c2 = jnp.concatenate([classes, -jnp.ones_like(classes)], axis=0)
            eps2 = self.apply(params, x2, t2, c2)
            eps_c, eps_u = jnp.split(eps2, 2, axis=0)
            return (1 + guidance) * eps_c - guidance * eps_u
        return self.apply(params, packed, t, classes)

    # ---- training ----

    def _drop_classes(self, rng, classes, p_uncond):
        if classes is None or not p_uncond:
            return classes
        drop = jax.random.uniform(rng, classes.shape) < p_uncond
        return jnp.where(drop, -jnp.ones_like(classes), classes)

    def training_loss(self, params, rng: jax.Array, batch: Batch):
        """MSE between predicted and true noise at a uniform random timestep
        (reference: diffusion/frameworks/gaussian_diffusion.py:93-116)."""
        x_0 = batch["x_0"]
        rng_t, rng_n, rng_pack, rng_drop = jax.random.split(rng, 4)
        t = jax.random.randint(rng_t, (x_0.shape[0],), 0, self.schedule.timesteps)
        noise = jax.random.normal(rng_n, x_0.shape, x_0.dtype)
        x_t = sched.diffuse(self.schedule, x_0, t, noise)
        classes = self._drop_classes(rng_drop, batch.get("classes"), self.p_uncond_train())
        packed = self.pack_inputs(rng_pack, x_t, batch)
        pred_eps = self.apply(params, packed, t, classes)
        mse = jnp.mean(jnp.square(pred_eps - noise))
        return mse, {"loss": mse, "mse": mse}

    def p_uncond_train(self) -> float:
        return 0.0


@dataclasses.dataclass(frozen=True)
class ClassifierFreeGuidance(GaussianDiffusion):
    """CFG: drop labels to -1 with probability ``p_uncond`` during training
    (reference: diffusion/frameworks/classifier_free_guidance.py:12-75)."""

    p_uncond: float = 0.1
    supports_cfg: ClassVar[bool] = True

    def p_uncond_train(self) -> float:
        return self.p_uncond


@dataclasses.dataclass(frozen=True)
class InpaintCFG(GaussianDiffusion):
    """RGBD-conditioned completion (inpainting) with CFG
    (reference: diffusion/frameworks/inpaint_cfg.py:11-128).

    Packs a 10-channel input ``[x_t(4), mask_rgb(1), y_rgb·m_rgb + n·(1−m_rgb)(3),
    y_depth·m + n·(1−m)(1), mask(1)]``; unseen regions are filled with FRESH
    Gaussian noise at every call (inpaint_cfg.py:24-49). Without ``mask_rgb`` the
    packing is 9 channels (mask_rgb slot omitted, rgb masked by ``mask``).
    """

    p_uncond: float = 0.1
    p_uncond_img: float = 0.0
    supports_cfg: ClassVar[bool] = True

    def p_uncond_train(self) -> float:
        return self.p_uncond

    def pack_inputs(self, rng, x, cond):
        y, mask = cond["y"], cond["mask"]
        y_rgb, y_depth = y[..., :3], y[..., 3:]
        mask_rgb = cond.get("mask_rgb")
        rng_rgb, rng_depth = jax.random.split(rng)
        parts = [x]
        if mask_rgb is not None:
            parts.append(mask_rgb)
        else:
            mask_rgb = mask
        noise_rgb = jax.random.normal(rng_rgb, y_rgb.shape, y_rgb.dtype)
        parts.append(y_rgb * mask_rgb + noise_rgb * (1 - mask_rgb))
        noise_depth = jax.random.normal(rng_depth, y_depth.shape, y_depth.dtype)
        parts.append(y_depth * mask + noise_depth * (1 - mask))
        parts.append(mask)
        return jnp.concatenate(parts, axis=-1)

    def pack_uncond_inputs(self, rng, x):
        """9-channel fully-unconditioned packing (reference: inpaint_cfg.py:51-58)."""
        noise = jax.random.normal(rng, x.shape, x.dtype)
        return jnp.concatenate([x, noise, jnp.zeros_like(x[..., :1])], axis=-1)

    def training_loss(self, params, rng, batch):
        if self.p_uncond_img and self.p_uncond_img > 0:
            # Image-cond dropout path (reference: inpaint_cfg.py:112-117; the
            # shipped configs set p_uncond_img=0 so this is off by default).
            x_0 = batch["x_0"]
            rng_t, rng_n, rng_pack, rng_drop, rng_img, rng_u = jax.random.split(rng, 6)
            t = jax.random.randint(rng_t, (x_0.shape[0],), 0, self.schedule.timesteps)
            noise = jax.random.normal(rng_n, x_0.shape, x_0.dtype)
            x_t = sched.diffuse(self.schedule, x_0, t, noise)
            classes = self._drop_classes(rng_drop, batch.get("classes"), self.p_uncond)
            cond_in = self.pack_inputs(
                rng_pack, x_t, {"y": batch["y"], "mask": batch["mask"]}
            )
            uncond_in = self.pack_uncond_inputs(rng_u, x_t)
            drop = jax.random.uniform(rng_img, (x_0.shape[0], 1, 1, 1)) < self.p_uncond_img
            packed = jnp.where(drop, uncond_in, cond_in)
            pred_eps = self.apply(params, packed, t, classes)
            mse = jnp.mean(jnp.square(pred_eps - noise))
            return mse, {"loss": mse, "mse": mse}
        return super().training_loss(params, rng, batch)


@dataclasses.dataclass(frozen=True)
class SuperResCFG(GaussianDiffusion):
    """Super-resolution conditioning with CFG: bilinear-upsample the low-res RGBD
    and concatenate → 8 channels (reference: diffusion/frameworks/sr_cfg.py:11-96)."""

    p_uncond: float = 0.1
    supports_cfg: ClassVar[bool] = True

    def p_uncond_train(self) -> float:
        return self.p_uncond

    def pack_inputs(self, rng, x, cond):
        del rng
        y = cond["y"]
        b, h, w, c = x.shape
        # Half-pixel-centered bilinear == torch align_corners=False
        # (reference: sr_cfg.py:33).
        y_up = jax.image.resize(y, (y.shape[0], h, w, y.shape[-1]), method="bilinear")
        return jnp.concatenate([x, y_up], axis=-1)


FRAMEWORKS = {
    "GaussianDiffusion": GaussianDiffusion,
    "ClassifierFreeGuidance": ClassifierFreeGuidance,
    "InpaintCFG": InpaintCFG,
    "SuperResCFG": SuperResCFG,
}


def build_framework(name: str, model, args: dict):
    """Instantiate a framework from a reference-schema config section
    (reference: train.py:82, configs/*.json "framework")."""
    args = dict(args)
    timesteps = args.pop("timesteps", 1000)
    beta_schedule = args.pop("beta_schedule", "linear")
    schedule = sched.Schedule.create(beta_schedule, timesteps)
    return FRAMEWORKS[name](model=model, schedule=schedule, **args)
