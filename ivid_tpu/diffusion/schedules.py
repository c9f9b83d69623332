"""Diffusion noise schedules and per-timestep coefficient tables.

All tables are computed in float64 on the host (numpy) for accuracy and stored as
float32 device arrays, mirroring the reference's float64 schedule construction
(reference: diffusion/frameworks/gaussian_diffusion.py:33-43,
diffusion/frameworks/utils.py:7-61, diffusion/samplers/ddpm.py:26-41).

The full table set needed by every sampler lives in one frozen dataclass so a
``lax.scan`` over timesteps can index into it with traced step indices.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def linear_betas(timesteps: int) -> np.ndarray:
    """Linear beta schedule from Ho et al., scaled so the limiting process is
    invariant to the number of steps (reference: diffusion/frameworks/utils.py:22-30)."""
    scale = 1000 / timesteps
    return np.linspace(scale * 0.0001, scale * 0.02, timesteps, dtype=np.float64)


def betas_for_alpha_bar(
    timesteps: int, alpha_bar: Callable[[float], float], max_beta: float = 0.999
) -> np.ndarray:
    """Discretize a continuous alpha-bar function into betas
    (reference: diffusion/frameworks/utils.py:40-61)."""
    t = np.arange(timesteps, dtype=np.float64)
    a1 = np.array([alpha_bar(x) for x in t / timesteps])
    a2 = np.array([alpha_bar(x) for x in (t + 1) / timesteps])
    return np.minimum(1 - a2 / a1, max_beta)


def cosine_betas(timesteps: int) -> np.ndarray:
    """Improved-DDPM cosine schedule (reference: diffusion/frameworks/utils.py:31-35)."""
    return betas_for_alpha_bar(
        timesteps, lambda t: np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
    )


def get_betas(name: str, timesteps: int) -> np.ndarray:
    if name == "linear":
        return linear_betas(timesteps)
    if name == "cosine":
        return cosine_betas(timesteps)
    raise ValueError(f"unknown beta schedule: {name!r}")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Schedule:
    """Precomputed coefficient tables for the forward process q(x_t | x_0), the
    posterior q(x_{t-1} | x_t, x_0), and eps <-> x_0 conversions.

    Shapes are all ``[T]`` float32. Index convention matches the reference: ``t``
    ranges over ``[0, T)`` where ``t = 0`` means one diffusion step
    (reference: diffusion/frameworks/gaussian_diffusion.py:45-64,
    diffusion/samplers/ddpm.py:26-41, diffusion/samplers/ddim.py:25-31).
    """

    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array

    @property
    def timesteps(self) -> int:
        return self.betas.shape[0]

    @classmethod
    def create(cls, name: str = "linear", timesteps: int = 1000) -> "Schedule":
        betas = get_betas(name, timesteps)
        assert betas.ndim == 1
        assert ((betas > 0) & (betas <= 1)).all()
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        post_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            alphas_cumprod=f32(acp),
            alphas_cumprod_prev=f32(acp_prev),
            sqrt_alphas_cumprod=f32(np.sqrt(acp)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - acp)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / acp)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / acp - 1.0)),
            posterior_variance=f32(post_var),
            # Clipped because the posterior variance is 0 at t=0.
            posterior_log_variance_clipped=f32(
                np.log(np.append(post_var[1], post_var[1:]))
            ),
            posterior_mean_coef1=f32(betas * np.sqrt(acp_prev) / (1.0 - acp)),
            posterior_mean_coef2=f32((1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp)),
        )


def extract(table: jax.Array, t: jax.Array, ndim: int) -> jax.Array:
    """Gather a per-timestep coefficient and reshape for NHWC broadcast.

    ``table`` is ``[T]``, ``t`` is ``[B]`` int32; the result is
    ``[B, 1, ..., 1]`` with ``ndim`` dims total
    (reference: diffusion/frameworks/utils.py:64-80).
    """
    out = jnp.take(table, t, axis=0)
    return out.reshape(out.shape + (1,) * (ndim - 1))


def diffuse(schedule: Schedule, x_0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
    """Sample from q(x_t | x_0) (reference: diffusion/frameworks/gaussian_diffusion.py:45-64)."""
    nd = x_0.ndim
    return (
        extract(schedule.sqrt_alphas_cumprod, t, nd) * x_0
        + extract(schedule.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    )


def reverse_diffuse(schedule: Schedule, x_t: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
    """Recover x_0 from x_t given the noise that produced it
    (reference: diffusion/frameworks/gaussian_diffusion.py:66-74)."""
    nd = x_t.ndim
    return (
        x_t - extract(schedule.sqrt_one_minus_alphas_cumprod, t, nd) * noise
    ) / extract(schedule.sqrt_alphas_cumprod, t, nd)


def predict_xstart_from_eps(schedule: Schedule, x_t: jax.Array, t: jax.Array, eps: jax.Array) -> jax.Array:
    """(reference: diffusion/samplers/ddpm.py:103-108)."""
    nd = x_t.ndim
    return (
        extract(schedule.sqrt_recip_alphas_cumprod, t, nd) * x_t
        - extract(schedule.sqrt_recipm1_alphas_cumprod, t, nd) * eps
    )


def predict_eps_from_xstart(schedule: Schedule, x_t: jax.Array, t: jax.Array, x_0: jax.Array) -> jax.Array:
    """(reference: diffusion/samplers/ddim.py:39-44)."""
    nd = x_t.ndim
    return (
        extract(schedule.sqrt_recip_alphas_cumprod, t, nd) * x_t - x_0
    ) / extract(schedule.sqrt_recipm1_alphas_cumprod, t, nd)


def q_posterior_mean_variance(
    schedule: Schedule, x_0: jax.Array, x_t: jax.Array, t: jax.Array
):
    """Mean/variance of q(x_{t-1} | x_t, x_0) (reference: diffusion/samplers/ddpm.py:43-66)."""
    nd = x_t.ndim
    mean = (
        extract(schedule.posterior_mean_coef1, t, nd) * x_0
        + extract(schedule.posterior_mean_coef2, t, nd) * x_t
    )
    var = extract(schedule.posterior_variance, t, nd)
    log_var = extract(schedule.posterior_log_variance_clipped, t, nd)
    return mean, var, log_var
