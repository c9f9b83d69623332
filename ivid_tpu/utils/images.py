"""Host-side image utilities: grid montages, depth colorization, int-list parsing.

Replacements for the reference's torchvision ``utils.save_image`` grids and
cv2-based depth colormap (reference: inference/utils.py:13-55,
inference/sample.py async_save grids). These run on host numpy after device
compute — they are IO, not compute.
"""

from __future__ import annotations

import numpy as np


def parse_int_list(s: str):
    """Parse "0-8,12" style ranges (reference: inference/utils.py:13-22)."""
    out = []
    for part in s.split(","):
        if "-" in part:
            start, end = part.split("-")
            out += list(range(int(start), int(end) + 1))
        else:
            out.append(int(part))
    return out


def to8b(x: np.ndarray) -> np.ndarray:
    return (np.clip(x, 0, 1) * 255).astype(np.uint8)


def colorize_depth(depth: np.ndarray, vmin=-1.0, vmax=1.0) -> np.ndarray:
    """INFERNO-colormapped inverted depth (reference: inference/utils.py:25-41).
    Input [..., H, W] or [..., H, W, 1]; output [..., H, W, 3] in [vmin, vmax]."""
    import cv2

    d = np.asarray(depth)
    if d.shape[-1] == 1:
        d = d[..., 0]
    single = d.ndim == 2
    if single:
        d = d[None]
    d = (d - vmin) / (vmax - vmin)
    d = np.clip(1 - d, 0, 1)
    frames = []
    for i in range(d.shape[0]):
        c = cv2.applyColorMap((d[i] * 255).astype(np.uint8), cv2.COLORMAP_INFERNO)
        frames.append(cv2.cvtColor(c, cv2.COLOR_BGR2RGB))
    out = np.stack(frames, axis=0).astype(np.float32) / 255.0
    out = out * (vmax - vmin) + vmin
    return out[0] if single else out


def make_grid(
    images: np.ndarray, nrow: int = 8, normalize: bool = False,
    value_range=(-1.0, 1.0), pad: int = 2, pad_value: float = 0.0,
) -> np.ndarray:
    """Tile [N,H,W,C] into a torchvision-style grid montage [GH,GW,C]."""
    imgs = np.asarray(images, dtype=np.float32)
    if normalize:
        lo, hi = value_range
        imgs = np.clip((imgs - lo) / max(hi - lo, 1e-12), 0, 1)
    n, h, w, c = imgs.shape
    ncol = nrow
    nrow_out = int(np.ceil(n / ncol))
    grid = np.full(
        (nrow_out * (h + pad) + pad, ncol * (w + pad) + pad, c), pad_value, np.float32
    )
    for idx in range(n):
        r, col = divmod(idx, ncol)
        y0 = pad + r * (h + pad)
        x0 = pad + col * (w + pad)
        grid[y0 : y0 + h, x0 : x0 + w] = imgs[idx]
    return grid


def save_image(path: str, image: np.ndarray) -> None:
    import imageio.v2 as imageio

    image = np.asarray(image)
    if image.ndim == 3 and image.shape[-1] == 1:
        image = image[..., 0]  # single-channel → grayscale 2D
    imageio.imwrite(path, to8b(image))


def save_image_grid(
    path: str, images: np.ndarray, nrow: int = 8, normalize: bool = True,
    value_range=(-1.0, 1.0),
) -> None:
    save_image(path, make_grid(images, nrow, normalize, value_range))
