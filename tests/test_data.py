"""Dataset, loader, and native-resampler tests."""

import os

import numpy as np
import pytest

from ivid_tpu.data import DataLoader, SyntheticRGBD, SyntheticRGBDSR
from ivid_tpu.data import native


def test_synthetic_dataset_and_loader():
    ds = SyntheticRGBD(
        image_size=32, length=40, num_classes=7, normalize=True,
        normalize_depth=True, prepocess_depth="z_buffer",
    )
    item = ds[0]
    assert item["x_0"].shape == (32, 32, 4)
    assert item["x_0"].dtype == np.float32
    assert -1.0 <= item["x_0"].min() and item["x_0"].max() <= 1.0
    assert item["classes"] == 0

    loader = iter(DataLoader(ds, batch_size=8, num_workers=2, seed=1))
    b1 = next(loader)
    assert b1["x_0"].shape == (8, 32, 32, 4)
    assert b1["classes"].shape == (8,)
    # Infinite cycling: more batches than one epoch.
    for _ in range(10):
        next(loader)


def test_loader_sharding_disjoint():
    ds = SyntheticRGBD(image_size=16, length=64, normalize=True,
                       normalize_depth=True, prepocess_depth="z_buffer")
    l0 = DataLoader(ds, batch_size=4, shuffle=False, shard_index=0, num_shards=2)
    l1 = DataLoader(ds, batch_size=4, shuffle=False, shard_index=1, num_shards=2)
    b0 = l0._epoch_indices(0)
    b1 = l1._epoch_indices(0)
    # batch_size is GLOBAL: each shard loads only its local row block.
    assert b0.shape == b1.shape == (16, 2)
    i0 = set(b0.reshape(-1).tolist())
    i1 = set(b1.reshape(-1).tolist())
    assert not (i0 & i1)
    assert len(i0) == len(i1) == 32
    # Together the shards reconstruct every global batch exactly.
    assert np.array_equal(np.concatenate([b0, b1], axis=1).reshape(-1), np.arange(64))


def test_sr_dataset():
    ds = SyntheticRGBDSR(
        image_size=32, image_size_lr=16, length=8, normalize=True,
        normalize_depth=True, prepocess_depth="z_buffer",
    )
    item = ds[0]
    assert item["x_0"].shape == (32, 32, 4)
    assert item["y"].shape == (16, 16, 4)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_native_resampler_matches_pil():
    from PIL import Image

    from ivid_tpu.data.base import _lanczos_resize_center_crop

    rng = np.random.default_rng(0)
    for h, w in [(200, 130), (64, 200), (129, 77)]:
        img8 = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        ref = np.asarray(
            _lanczos_resize_center_crop(Image.fromarray(img8), 48, Image.LANCZOS),
            np.float32,
        ) / 255.0
        got = native.lanczos_resize_center_crop(img8, 48)
        np.testing.assert_allclose(got, ref, atol=1.01 / 255)

        d = rng.uniform(size=(h, w)).astype(np.float32)
        refd = np.asarray(
            _lanczos_resize_center_crop(Image.fromarray(d), 48, Image.NEAREST),
            np.float32,
        )
        gotd = native.nearest_resize_center_crop(d, 48)
        # PIL's nearest tie-breaking differs at exact integer boundaries (its
        # internal float accumulation); values must agree except at such
        # boundary rows/cols. The production loader uses PIL for depth.
        mismatch = (gotd != refd).mean()
        assert mismatch < 0.4, mismatch


def test_loader_resume_cursor():
    """A loader restarted from a saved position reproduces the exact
    remaining batch sequence (exact-resume support; the reference replays
    data on restart, basic.py:196-228)."""
    from ivid_tpu.data.loader import DataLoader
    from ivid_tpu.data import SyntheticRGBD

    ds = SyntheticRGBD(image_size=8, length=20, normalize=True,
                       normalize_depth=True, prepocess_depth="z_buffer")
    ld = DataLoader(ds, batch_size=4, seed=3, num_workers=3, prefetch=2)
    it = iter(ld)
    seq = []
    for _ in range(9):  # crosses an epoch boundary (5 batches/epoch)
        seq.append(next(it)["x_0"])
    pos = ld.position
    tail = [next(it)["x_0"] for _ in range(4)]

    ld2 = DataLoader(ds, batch_size=4, seed=3, num_workers=1, prefetch=1,
                     start=pos)
    it2 = iter(ld2)
    tail2 = [next(it2)["x_0"] for _ in range(4)]
    for a, b in zip(tail, tail2):
        np.testing.assert_array_equal(a, b)


def test_loader_workers_parallel_and_ordered():
    """num_workers loads run concurrently; batch order is still deterministic."""
    import threading
    import time as _time

    from ivid_tpu.data.loader import DataLoader

    lock = threading.Lock()
    active = [0]
    peak = [0]

    class SlowDataset:
        image_size = 4

        def __len__(self):
            return 32

        def __getitem__(self, i):
            with lock:
                active[0] += 1
                peak[0] = max(peak[0], active[0])
            _time.sleep(0.05)
            with lock:
                active[0] -= 1
            return {"x_0": np.full((4, 4, 4), i, np.float32)}

    ld = DataLoader(SlowDataset(), batch_size=4, shuffle=False, num_workers=4,
                    prefetch=2, seed=0)
    it = iter(ld)
    b0 = next(it)["x_0"][:, 0, 0, 0]
    b1 = next(it)["x_0"][:, 0, 0, 0]
    np.testing.assert_array_equal(b0, [0, 1, 2, 3])
    np.testing.assert_array_equal(b1, [4, 5, 6, 7])
    assert peak[0] >= 3, f"expected concurrent item loads, peak={peak[0]}"


def test_loader_process_workers_match_threads():
    """worker_mode='process' (spawned, GIL-free) yields byte-identical
    batches and cursor positions to the thread pool."""
    ds = SyntheticRGBD(
        image_size=16, length=24, num_classes=3, normalize=True,
        normalize_depth=True, prepocess_depth="z_buffer",
    )
    lt = DataLoader(ds, batch_size=4, seed=5, num_workers=2, prefetch=2)
    lp = DataLoader(ds, batch_size=4, seed=5, num_workers=2, prefetch=2,
                    worker_mode="process")
    it_t, it_p = iter(lt), iter(lp)
    for _ in range(8):  # crosses an epoch boundary (6 batches/epoch)
        bt, bp = next(it_t), next(it_p)
        assert lt.position == lp.position
        for k in bt:
            np.testing.assert_array_equal(bt[k], bp[k])
