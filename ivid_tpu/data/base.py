"""RGBD dataset loading: images + disparity npz → normalized RGBD tensors.

Host-side NHWC numpy re-design of the reference datasets
(reference: datasets/base.py:17-194). Returns dicts with ``x_0`` [H,W,4] (and
``classes`` / ``y`` where applicable). The Warp datasets differ from the
reference ON PURPOSE: the reference renders warps inside CPU dataloader workers
with per-worker EGL contexts (reference: datasets/base.py:215-238); here the
warp runs batched ON DEVICE inside the train step
(:meth:`ivid_tpu.training.trainer.InpaintTrainer`), so the host side only
yields clean ``x_0``.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np


def _lanczos_resize_center_crop(img, size: int, resample):
    """torchvision Resize(size, LANCZOS) + CenterCrop(size)
    (reference: base.py:66-74)."""
    from PIL import Image

    w, h = img.size
    scale = size / min(w, h)
    nw, nh = max(size, round(w * scale)), max(size, round(h * scale))
    img = img.resize((nw, nh), resample)
    left = (nw - size) // 2
    top = (nh - size) // 2
    return img.crop((left, top, left + size, top + size))


class BaseDataset:
    """(reference: datasets/base.py:17-149).

    ``prepocess_depth`` modes (sic, reference spelling kept for config compat):
    none | to_depth | disparity_minmax | depth_minmax | z_buffer.
    """

    def __init__(
        self,
        root_path: str,
        image_size: int,
        normalize: bool = False,
        normalize_depth: bool = False,
        prepocess_depth: str = "none",
        near: float = 0.5,
        far: float = 100.0,
    ):
        assert prepocess_depth in (
            "none", "to_depth", "disparity_minmax", "depth_minmax", "z_buffer"
        )
        assert not (normalize_depth and prepocess_depth in ("none", "to_depth"))
        self.root_path = root_path
        self.image_size = image_size
        self.normalize = normalize
        self.normalize_depth = normalize_depth
        self.prepocess_depth = prepocess_depth
        self.near = near
        self.far = far
        self.images: List[str] = []
        self.depths: List[str] = []
        self.labels = None
        self.get_fileinfo()
        self.num_classes = len(self.labels) if self.labels is not None else None

    def get_fileinfo(self):
        raise NotImplementedError

    def __len__(self):
        return len(self.images)

    def get_file(self, index: int):
        """(reference: base.py:89-115)."""
        from PIL import Image

        image = Image.open(os.path.join(self.root_path, self.images[index]))
        depth = np.load(os.path.join(self.root_path, self.depths[index]))[
            "arr_0"
        ].astype(np.float32)
        depth /= 6250
        if depth.max() > 1 / self.near:
            depth /= depth.max() * self.near
        depth = np.maximum(depth, 1e-3)

        if self.prepocess_depth == "to_depth":
            depth = 1 / depth
        elif self.prepocess_depth == "disparity_minmax":
            depth = (depth - depth.min()) / (depth.max() - depth.min())
        elif self.prepocess_depth == "depth_minmax":
            depth = 1 / depth
            depth = (depth - depth.min()) / (depth.max() - depth.min())
        elif self.prepocess_depth == "z_buffer":
            depth = (depth - 1 / self.near) / (1 / self.far - 1 / self.near)
            depth = np.clip(depth, 0, 1)

        label = (
            self.labels[self.images[index].split("/")[-2]]
            if self.num_classes is not None
            else None
        )
        return image, depth, label

    def process_file(self, image, depth, label):
        """(reference: base.py:117-139). Output NHWC float32. Uses the native
        C++ resampler (native/image_ops.cpp, bit-exact with PIL) when built."""
        from PIL import Image

        from ivid_tpu.data import native

        img = None
        if native.available():
            arr = np.asarray(image)
            if arr.dtype == np.uint8 and arr.ndim in (2, 3):
                img = native.lanczos_resize_center_crop(arr, self.image_size)
        if img is None:
            pil = _lanczos_resize_center_crop(image, self.image_size, Image.LANCZOS)
            img = np.asarray(pil, np.float32) / 255.0
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        if img.shape[-1] == 1:
            img = np.concatenate([img] * 3, -1)
        if img.shape[-1] == 4:
            img = img[..., :3]
        if self.normalize:
            img = img * 2 - 1

        # Depth stays on the PIL path: PIL's NEAREST tie-breaking follows its
        # internal float accumulation and is not worth replicating bit-for-bit;
        # depth resize is cheap relative to decode + Lanczos.
        d = _lanczos_resize_center_crop(
            Image.fromarray(depth), self.image_size, Image.NEAREST
        )
        d = np.asarray(d, np.float32)[..., None]
        if self.normalize_depth:
            d = d * 2 - 1

        data = {"x_0": np.concatenate([img, d], axis=-1)}
        if label is not None:
            data["classes"] = np.int32(label)
        return data

    def getitem(self, index: int):
        return self.process_file(*self.get_file(index))

    def __getitem__(self, index: int):
        """Exception → random-retry, like the reference (base.py:144-149)."""
        for _ in range(100):
            try:
                return self.getitem(index)
            except Exception as e:  # noqa: BLE001
                print(f"dataset error at {index}: {e}")
                index = np.random.randint(len(self))
        raise RuntimeError("dataset failed 100 consecutive loads")


class SRDataset(BaseDataset):
    """Adds a blurred low-resolution conditioning pair ``y``
    (reference: datasets/base.py:152-194)."""

    def __init__(self, root_path, image_size, image_size_lr, **kwargs):
        super().__init__(root_path, image_size, **kwargs)
        self.image_size_lr = image_size_lr

    def process_file(self, image, depth, label):
        import cv2
        from PIL import Image

        data = super().process_file(image, depth, label)
        img = _lanczos_resize_center_crop(image, self.image_size_lr, Image.LANCZOS)
        img = np.asarray(img, np.float32)
        img = cv2.GaussianBlur(img, (3, 3), np.random.rand() + 1e-3)
        img = img / 255.0
        if img.ndim == 2:
            img = np.stack([img] * 3, -1)
        if img.shape[-1] == 4:
            img = img[..., :3]
        if self.normalize:
            img = img * 2 - 1

        d = _lanczos_resize_center_crop(
            Image.fromarray(depth), self.image_size_lr, Image.NEAREST
        )
        d = np.asarray(d, np.float32)[..., None]
        if self.normalize_depth:
            d = d * 2 - 1
        data["y"] = np.concatenate([img, d], axis=-1)
        return data


class WarpDataset(BaseDataset):
    """Marker class: clean RGBD plus warp hyperparameters. The actual
    forward-backward warp + augmentations run on-device in the train step
    (TPU-native replacement for the reference's in-worker GL rendering,
    datasets/base.py:197-267)."""

    def __init__(self, root_path, image_size, augments=(), std=0.15, **kwargs):
        super().__init__(root_path, image_size, **kwargs)
        self.augments = list(augments)
        self.std = std


class SyntheticRGBD(BaseDataset):
    """Procedural RGBD dataset for tests and benchmarks (no files on disk):
    random smooth blobs over a background plane."""

    def __init__(
        self, root_path="", image_size=128, length=256, num_classes=None, **kwargs
    ):
        self._length = length
        self._num_classes_cfg = num_classes
        super().__init__(root_path, image_size, **kwargs)

    def get_fileinfo(self):
        self.images = [str(i) for i in range(self._length)]
        self.depths = self.images
        self.labels = (
            {str(i): i for i in range(self._num_classes_cfg)}
            if self._num_classes_cfg
            else None
        )

    def getitem(self, index: int):
        s = self.image_size
        rng = np.random.default_rng(index)
        i, j = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
        img = np.zeros((s, s, 3), np.float32)
        disp = np.full((s, s), 1.0, np.float32)
        for _ in range(3):
            cx, cy = rng.uniform(0.2 * s, 0.8 * s, 2)
            r = rng.uniform(0.1 * s, 0.3 * s)
            blob = np.exp(-(((i - cx) ** 2 + (j - cy) ** 2) / r**2))
            img += blob[..., None] * rng.uniform(0.2, 1.0, 3)
            disp += blob * rng.uniform(0.2, 0.8)
        img = np.clip(img, 0, 1)
        depth = 1.0 / disp  # metric-ish in [0.36, 1]
        stored = (1 / depth - 1 / self.near) / (1 / self.far - 1 / self.near)
        stored = np.clip(stored, 0, 1).astype(np.float32)
        if self.normalize:
            img = img * 2 - 1
        d = stored[..., None]
        if self.normalize_depth:
            d = d * 2 - 1
        data = {"x_0": np.concatenate([img, d], axis=-1).astype(np.float32)}
        if self.num_classes:
            data["classes"] = np.int32(index % self.num_classes)
        return data


class SyntheticRGBDWarp(SyntheticRGBD, WarpDataset):
    def __init__(self, root_path="", image_size=128, length=256, num_classes=None,
                 augments=(), std=0.15, **kwargs):
        SyntheticRGBD.__init__(
            self, root_path, image_size, length, num_classes, **kwargs
        )
        self.augments = list(augments)
        self.std = std


class SyntheticRGBDSR(SyntheticRGBD):
    def __init__(self, root_path="", image_size=256, image_size_lr=128,
                 length=256, num_classes=None, **kwargs):
        self.image_size_lr = image_size_lr
        SyntheticRGBD.__init__(self, root_path, image_size, length, num_classes, **kwargs)

    def getitem(self, index: int):
        data = SyntheticRGBD.getitem(self, index)
        x = data["x_0"]
        lr = x[:: self.image_size // self.image_size_lr, :: self.image_size // self.image_size_lr]
        data["y"] = np.ascontiguousarray(lr)
        return data
