"""Reverse-process samplers compiled to single ``lax.scan`` programs.

The reference runs its samplers as Python loops of 50–1000 individually-launched
model calls (reference: diffusion/samplers/ddpm.py:176-187, ddim.py:152-165). Here
each sampler traces ONE scan over the timestep axis, so a full 1000-step DDPM chain
(with fused CFG) is a single XLA program — launch overhead is paid once and XLA can
pipeline/fuse across steps.

The DDIM sampler carries the guided-completion hooks of the 3D pipeline —
``replace_rgb`` / ``replace_depth`` / ``constrain_depth`` edits to the predicted
x_0 each step, with eps recomputed from the edited x_0
(reference: diffusion/samplers/ddim.py:48-103).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ivid_tpu.diffusion import schedules as sched


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PredX0Edits:
    """3D-consistency edits applied to pred_x_0 at every DDIM step
    (reference: diffusion/samplers/ddim.py:86-95; weights set at
    inference/sample.py:104-119: rgb 0.1, depth 0.2, constrain 0.5).

    - ``replace_rgb``:   (weight, rgb [B,H,W,3], mask [B,H,W,1]) — blend known RGB
      into pred_x0 over unmasked pixels (skipped on the final step).
    - ``replace_depth``: (weight, depth [B,H,W,1], mask [B,H,W,1]).
    - ``constrain_depth``: (weight, convex [B,H,W,1]) — outside the depth mask,
      pull pred depth up to at least the convex-hull depth.
    """

    replace_rgb: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None
    replace_depth: Optional[Tuple[jax.Array, jax.Array, jax.Array]] = None
    constrain_depth: Optional[Tuple[jax.Array, jax.Array]] = None


def apply_pred_x0_edits(
    pred_x_0: jax.Array, edits: Optional[PredX0Edits], nonzero_mask: jax.Array
) -> jax.Array:
    """(reference: diffusion/samplers/ddim.py:86-95)."""
    if edits is None:
        return pred_x_0
    rgb, depth = pred_x_0[..., :3], pred_x_0[..., 3:]
    if edits.replace_rgb is not None:
        w, tgt, mask = edits.replace_rgb
        blended = (w * tgt + (1 - w) * rgb) * mask + rgb * (1 - mask)
        rgb = (1 - nonzero_mask) * rgb + nonzero_mask * blended
    if edits.replace_depth is not None:
        w, tgt, mask = edits.replace_depth
        depth = (w * tgt + (1 - w) * depth) * mask + depth * (1 - mask)
        if edits.constrain_depth is not None:
            cw, convex = edits.constrain_depth
            constrained = cw * jnp.maximum(depth, convex) + (1 - cw) * depth
            depth = depth * mask + constrained * (1 - mask)
    return jnp.concatenate([rgb, depth], axis=-1)


def _nonzero_mask(t: jax.Array, ndim: int) -> jax.Array:
    return (t != 0).astype(jnp.float32).reshape((-1,) + (1,) * (ndim - 1))


def ddpm_sample(
    framework,
    params,
    rng: jax.Array,
    *,
    num: Optional[int] = None,
    image_size: Optional[int] = None,
    channels: int = 4,
    noise: Optional[jax.Array] = None,
    cond=None,
    guidance: float = 0.0,
    clip_denoised: bool = False,
    steps: Optional[int] = None,
    return_trajectory: bool = False,
    num_steps: Optional[int] = None,
    i_start=None,
) -> dict:
    """Full-T ancestral (DDPM) sampling as one scan
    (reference: diffusion/samplers/ddpm.py:133-187). ``steps`` is accepted for
    interface parity but must equal the schedule length (DDPM has no striding).

    Chunked dispatch: ``num_steps`` (static) + ``i_start`` (may be traced)
    scan timesteps ``i_start-1 … i_start-num_steps`` instead of the full
    chain; passing the previous chunk's output as ``noise`` continues the
    chain BIT-IDENTICALLY (per-step rngs fold the absolute timestep into the
    same base ``rng``). Lets a 1000-step chain run as a few shorter device
    dispatches — one compiled program serves every chunk since only the
    traced ``i_start`` changes (see ``ScenePipeline._run_uncond``)."""
    s = framework.schedule
    T = s.timesteps
    assert steps is None or steps == T, "DDPM sampler runs the full schedule"
    if noise is None:
        # Chunking requires an explicit carry: the noise=None path SPLITS the
        # rng before the step loop, so a chunked chain seeded this way would
        # silently diverge from the unchunked run (different per-step rngs).
        assert num_steps is None and i_start is None, (
            "chunked sampling (num_steps/i_start) requires explicit noise"
        )
        assert num is not None and image_size is not None
        rng, rng_init = jax.random.split(rng)
        noise = jax.random.normal(rng_init, (num, image_size, image_size, channels))
    x = noise
    nd = x.ndim
    if num_steps is None:
        num_steps = T
    if i_start is None:
        i_start = T

    def step(x, k):
        # absolute timestep, counting down: i_start-1 ... i_start-num_steps.
        i = i_start - 1 - k
        t = jnp.full((x.shape[0],), i, jnp.int32)
        step_rng = jax.random.fold_in(rng, i)
        rng_model, rng_noise = jax.random.split(step_rng)
        eps = framework.model_inference(params, rng_model, x, t, cond, guidance)
        pred_x_0 = sched.predict_xstart_from_eps(s, x, t, eps)
        if clip_denoised:
            pred_x_0 = jnp.clip(pred_x_0, -1.0, 1.0)
        mean, _, log_var = sched.q_posterior_mean_variance(s, pred_x_0, x, t)
        z = jax.random.normal(rng_noise, x.shape, x.dtype)
        x_prev = mean + _nonzero_mask(t, nd) * jnp.exp(0.5 * log_var) * z
        out = (x_prev, pred_x_0) if return_trajectory else None
        return x_prev, out

    x, traj = jax.lax.scan(step, x, jnp.arange(num_steps))
    ret = {"samples": x}
    if return_trajectory:
        # Stacked per-step [T, B, ...] arrays, matching the reference's
        # pred_x_t / pred_x_0 lists (reference: ddpm.py:177-186).
        ret["pred_x_t"], ret["pred_x_0"] = traj
    return ret


def ddim_sample(
    framework,
    params,
    rng: jax.Array,
    *,
    num: Optional[int] = None,
    image_size: Optional[int] = None,
    channels: int = 4,
    noise: Optional[jax.Array] = None,
    cond=None,
    guidance: float = 0.0,
    steps: Optional[int] = None,
    eta: float = 0.0,
    clip_denoised: bool = False,
    edits: Optional[PredX0Edits] = None,
    return_trajectory: bool = False,
    num_steps: Optional[int] = None,
    i_start=None,
) -> dict:
    """Strided DDIM sampling as one scan, with guided pred_x_0 editing
    (reference: diffusion/samplers/ddim.py:105-165). Step pairs are
    ``(jump·(i+1), jump·i)`` for ``i = steps-1 … 0`` with ``jump = T // steps``;
    the model is evaluated at ``t - 1`` (ddim.py:81,152-154).

    ``num_steps``/``i_start`` chunk the scan exactly like :func:`ddpm_sample`
    (DDIM-step indices rather than timesteps)."""
    s = framework.schedule
    T = s.timesteps
    steps = T if steps is None else steps
    assert 1 <= steps <= T, (
        f"steps={steps} outside [1, {T}]"  # steps > T would give jump=0 and
        # silently evaluate the model at timestep -1 every step
    )
    jump = T // steps
    if noise is None:
        # See ddpm_sample: chunking with noise=None would silently diverge.
        assert num_steps is None and i_start is None, (
            "chunked sampling (num_steps/i_start) requires explicit noise"
        )
        assert num is not None and image_size is not None
        rng, rng_init = jax.random.split(rng)
        noise = jax.random.normal(rng_init, (num, image_size, image_size, channels))
    x = noise
    nd = x.ndim
    if num_steps is None:
        num_steps = steps
    if i_start is None:
        i_start = steps

    def step(x, k):
        i = i_start - 1 - k
        t = jnp.full((x.shape[0],), jump * (i + 1), jnp.int32)
        t_prev = jnp.full((x.shape[0],), jump * i, jnp.int32)
        nz = _nonzero_mask(t_prev, nd)
        step_rng = jax.random.fold_in(rng, i)
        rng_model, rng_noise = jax.random.split(step_rng)
        eps = framework.model_inference(params, rng_model, x, t - 1, cond, guidance)
        pred_x_0 = sched.predict_xstart_from_eps(s, x, t - 1, eps)
        if clip_denoised:
            pred_x_0 = jnp.clip(pred_x_0, -1.0, 1.0)
        pred_x_0 = apply_pred_x0_edits(pred_x_0, edits, nz)
        eps = sched.predict_eps_from_xstart(s, x, t - 1, pred_x_0)

        alpha_bar = sched.extract(s.alphas_cumprod, t - 1, nd)
        alpha_bar_prev = sched.extract(s.alphas_cumprod_prev, t_prev, nd)
        sigma = (
            eta
            * jnp.sqrt((1 - alpha_bar_prev) / (1 - alpha_bar))
            * jnp.sqrt(1 - alpha_bar / alpha_bar_prev)
        )
        mean = (
            jnp.sqrt(alpha_bar_prev) * pred_x_0
            + jnp.sqrt(1 - alpha_bar_prev - sigma**2) * eps
        )
        z = jax.random.normal(rng_noise, x.shape, x.dtype)
        x_prev = mean + nz * sigma * z
        out = (x_prev, pred_x_0) if return_trajectory else None
        return x_prev, out

    x, traj = jax.lax.scan(step, x, jnp.arange(num_steps))
    ret = {"samples": x}
    if return_trajectory:
        ret["pred_x_t"], ret["pred_x_0"] = traj
    return ret



def default_chunk() -> int:
    """Max scan steps per device dispatch for LONG sampling chains.

    The relayed single-chip TPU backend kills dispatches that run for more
    than ~1-2 minutes (observed: a 115 s 1000-step DDPM dispatch crashes the
    worker REGARDLESS of attention implementation; 50-step/6 s programs are
    fine). Chunking a 1000-step chain into four 250-step dispatches costs 3
    extra dispatch round trips (~0.1 s) on 115 s of work and is bit-identical
    (absolute-timestep rng folding). 0 disables chunking.
    Override with ``IVID_TPU_SAMPLER_CHUNK``."""
    import os

    return int(os.environ.get("IVID_TPU_SAMPLER_CHUNK", "250"))
