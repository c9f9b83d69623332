#!/usr/bin/env python
"""Evaluation CLI: FID / IS / KID between generated and real image sets.

Mirrors the reference CLI and caching behavior (reference: eval.py): sample up
to ``num_samples`` fakes, center-crop-and-resize reals, cache processed sets
and feature statistics under ``tmp_dir``, interactive overwrite confirm, write
``metrics/{fake_cache_name}.txt``. The metric backend is native
(:mod:`ivid_tpu.evals.metrics`) with a pluggable feature extractor — see that
module for the no-pretrained-weights caveat of the default ``randconv``.
"""

import argparse
import os
from glob import glob

import numpy as np


def center_crop_and_resize(image, image_size):
    """(reference: eval.py:41-47)."""
    from PIL import Image

    w, h = image.size
    if w > h:
        image = image.crop(((w - h) // 2, 0, (w + h) // 2, h))
    elif h > w:
        image = image.crop((0, (h - w) // 2, w, (h + w) // 2))
    return image.resize((image_size, image_size), Image.LANCZOS)


def load_fake_images(fake_dir, image_size, num_samples):
    """(reference: eval.py:50-71)."""
    from PIL import Image

    paths = sorted(glob(os.path.join(fake_dir, "*.png")))
    print(f"Found {len(paths)} fake images")
    rng = np.random.default_rng(0)
    paths = [paths[i] for i in rng.permutation(len(paths))]
    out = []
    for p in paths:
        try:
            img = Image.open(p).convert("RGB")
            assert img.size == (image_size, image_size), img.size
            out.append(np.asarray(img, np.float32) / 255.0)
            if len(out) == num_samples:
                break
        except Exception as e:  # noqa: BLE001 — skip unreadable, like reference
            print(e)
    print(f"Loaded {len(out)} fake images")
    return np.stack(out)


def load_real_images(real_dir, image_size, num_samples=None):
    """(reference: eval.py:74-90)."""
    from PIL import Image

    paths = []
    for ext in ["png", "jpg", "jpeg", "PNG", "JPG", "JPEG"]:
        paths += glob(os.path.join(real_dir, "**", f"*.{ext}"), recursive=True)
    if num_samples is not None and len(paths) > num_samples:
        rng = np.random.default_rng(0)
        paths = [paths[i] for i in rng.choice(len(paths), num_samples, replace=False)]
    out = []
    for p in paths:
        try:
            img = Image.open(p)
            if img.mode == "CMYK":
                img = img.convert("RGB")
            img = center_crop_and_resize(img, image_size).convert("RGB")
            out.append(np.asarray(img, np.float32) / 255.0)
        except Exception as e:  # noqa: BLE001
            print(e)
    print(f"Loaded {len(out)} real images")
    return np.stack(out)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--real_images_dir", type=str, default=None)
    p.add_argument("--fake_images_dir", type=str, default=None)
    p.add_argument("--tmp_dir", type=str, default="metrics/cache")
    p.add_argument("--metrics_dir", type=str, default=None,
                   help="where the <fake_cache_name>.txt result lands; "
                        "defaults to the parent of --tmp_dir")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--num_samples", type=int, default=10000)
    p.add_argument(
        "--max_real_images", type=int, default=None,
        help="cap the real set (random subset, seeded). The full set is the "
             "reference protocol, but it is materialized in RAM as float32 "
             "(~200 KB per 128px image) — cap for very large directories",
    )
    p.add_argument("--real_images_cache_name", type=str, default=None)
    p.add_argument("--fake_images_cache_name", type=str, default=None)
    p.add_argument("--use_real_images_cache", action="store_true")
    p.add_argument("--extractor", type=str, default="randconv")
    p.add_argument("--yes", action="store_true", help="non-interactive overwrite")
    opt = p.parse_args()

    from ivid_tpu.utils.runtime import enable_compilation_cache, setup_platform

    setup_platform()  # honor IVID_TPU_PLATFORM before any jax backend init
    enable_compilation_cache()

    from ivid_tpu.evals import compute_metrics

    # Default cache names carry the image size: a cache written at one
    # --image_size must never be silently reused at another (the count-based
    # staleness check in metrics.extract_features can't catch a resolution
    # change on the same directory).
    opt.real_images_cache_name = (
        f"{opt.real_images_dir.replace('/', '_')}-{opt.image_size}"
        if opt.real_images_cache_name is None else opt.real_images_cache_name
    )
    opt.fake_images_cache_name = (
        f"{opt.fake_images_dir.replace('/', '_')}-{opt.image_size}"
        if opt.fake_images_cache_name is None else opt.fake_images_cache_name
    )
    os.makedirs(opt.tmp_dir, exist_ok=True)
    real_cache = os.path.join(opt.tmp_dir, f"{opt.real_images_cache_name}-images.npz")

    if opt.use_real_images_cache and os.path.exists(real_cache):
        print("Using cached real images")
        real = np.load(real_cache)["images"]
    else:
        if os.path.exists(real_cache) and not opt.yes:
            resp = input("Real images cache found. Overwrite? (y/n)\n")
            if resp != "y":
                real = np.load(real_cache)["images"]
            else:
                real = None
        else:
            real = None
        if real is None:
            real = load_real_images(
                opt.real_images_dir, opt.image_size,
                num_samples=opt.max_real_images,
            )
            np.savez_compressed(real_cache, images=(real * 255).astype(np.uint8))
    if real.dtype == np.uint8:
        real = real.astype(np.float32) / 255.0

    fake = load_fake_images(opt.fake_images_dir, opt.image_size, opt.num_samples)

    # Real-set features are cached (reference: eval.py:11-23 caches the
    # torch-fidelity stats); fake features are always fresh — the fake dir is
    # regenerated between evals under the same name.
    metrics = compute_metrics(
        fake, real, extractor=opt.extractor,
        cache_dir=opt.tmp_dir,
        # Real-set features always cache (the expensive half at 10k+ images;
        # reference: eval.py always passes input2_cache_name). The staleness
        # guard in extract_features fingerprints the image content, so an
        # in-place regeneration with the same count still recomputes.
        real_name=opt.real_images_cache_name,
    )
    print(metrics)
    metrics_dir = opt.metrics_dir or os.path.dirname(opt.tmp_dir.rstrip("/")) or "metrics"
    os.makedirs(metrics_dir, exist_ok=True)
    with open(os.path.join(metrics_dir, f"{opt.fake_images_cache_name}.txt"), "w") as f:
        f.write(str(metrics))


if __name__ == "__main__":
    main()
