"""Image resampling/filter ops used by the warp pipeline and datasets.

These reproduce the reference's PIL/cv2 post-processing on-device:
8-bit-quantized LANCZOS downsample (reference: rgbd_3d/utils.py:34-35,381,403),
strided SSAA subsampling, coverage-threshold mask downsample
(reference: utils.py:387,405), and separable Gaussian blur
(reference: diffusion/samplers/utils.py:28-35, datasets/base.py:181,247).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def resize_lanczos_8bit(img: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Emulate ``PIL.Image.fromarray(to8b(x)).resize(s, LANCZOS) / 255``:
    quantize to uint8, Lanczos-3 resample, re-quantize (reference:
    rgbd_3d/utils.py:381,403, inference/sample... to8b round-trips)."""
    img8 = jnp.round(jnp.clip(img, 0.0, 1.0) * 255.0)
    out = jax.image.resize(
        img8, (out_size, out_size) + img.shape[2:], method="lanczos3"
    )
    return jnp.round(jnp.clip(out, 0.0, 255.0)) / 255.0


def ssaa_subsample(img: jnp.ndarray, ssaa: int) -> jnp.ndarray:
    """Center-strided pick of a supersampled buffer
    (reference: rgbd_3d/utils.py:335-346 ``ssaa_offset = (ssaa-1)//2``)."""
    off = (ssaa - 1) // 2
    return img[off::ssaa, off::ssaa]


def coverage_mask(mask: jnp.ndarray, ssaa: int, threshold: float = 0.75) -> jnp.ndarray:
    """Downsample a supersampled boolean mask by coverage fraction
    (reference: rgbd_3d/utils.py:387,404-405)."""
    r = mask.shape[0]
    s = r // ssaa
    m = mask.reshape(s, ssaa, s, ssaa, -1).astype(jnp.float32).sum(axis=(1, 3))
    return m > threshold * ssaa * ssaa


def gaussian_blur(x: jnp.ndarray, sigma: float, kernel_size: int = 3) -> jnp.ndarray:
    """Separable Gaussian blur with replicate padding on [H,W,C]
    (reference: diffusion/samplers/utils.py:28-35)."""
    half = kernel_size // 2
    k = np.exp(-np.arange(-half, half + 1, dtype=np.float64) ** 2 / (2 * sigma**2))
    k = jnp.asarray((k / k.sum()).astype(np.float32))
    pad = [(half, half), (half, half), (0, 0)]
    xp = jnp.pad(x, pad, mode="edge")
    xp = sum(k[i] * xp[i : i + x.shape[0], :, :] for i in range(kernel_size))
    xp = sum(k[i] * xp[:, i : i + x.shape[1], :] for i in range(kernel_size))
    return xp


def gaussian_blur_random_sigma(rng, x: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    """cv2.GaussianBlur with sigma ~ U(0,1)+1e-3 as used by the augmentations
    (reference: datasets/base.py:181,247). Implemented with a traced sigma."""
    sigma = jax.random.uniform(rng, ()) + 1e-3
    half = kernel_size // 2
    offs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    k = jnp.exp(-(offs**2) / (2 * sigma**2))
    k = k / k.sum()
    pad = [(half, half), (half, half), (0, 0)]
    # cv2.GaussianBlur's default border is BORDER_REFLECT_101 — mirror
    # WITHOUT repeating the edge pixel (jnp.pad "reflect"), unlike the
    # sampler blur above which replicates (torch F.pad mode='replicate').
    xp = jnp.pad(x, pad, mode="reflect")
    # Depthwise separable conv via broadcasting.
    xp = sum(k[i] * xp[i : i + x.shape[0], :, :] for i in range(kernel_size))
    xp = sum(k[i] * xp[:, i : i + x.shape[1], :] for i in range(kernel_size))
    return xp
