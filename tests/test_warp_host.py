"""Host-side warp-conditioning synthesis (data/warp_host.py).

The reference overlaps warp-data synthesis with training by running it in CPU
dataloader workers (reference: datasets/base.py:215-238). These tests pin:

1. The host per-sample synthesis and the trainer's grouped on-device
   synthesis are the SAME program (shared warp_cond helpers) — outputs match
   sample-for-sample given the same per-sample rngs, up to fragment-tie order.
2. HostWarpDataset's item contract (keys, ranges, determinism, visit rng).
3. An InpaintTrainer(warp_host=True) trains end-to-end with a pass-through
   prepare_batch, pulling conditioning from the (wrapped) loader dataset.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ivid_tpu.data import SyntheticRGBDWarp
from ivid_tpu.data.warp_host import HostWarpDataset
from ivid_tpu.training import warp_cond

ALL_AUGMENTS = ("prewarp_noise", "postwarp_noise", "blur", "erode_rgb")


def _dataset(s=32, length=16):
    return SyntheticRGBDWarp(
        image_size=s, length=length, augments=ALL_AUGMENTS, std=0.15,
        normalize=True, normalize_depth=True, prepocess_depth="z_buffer",
    )


def _wrap(ds, seed=0):
    return HostWarpDataset(
        ds, augments=ds.augments, pose_std=ds.std, near=ds.near, far=ds.far,
        seed=seed,
    )


def _trainer(tmp_path, ds, **kwargs):
    from tests.test_trainer import _make
    from ivid_tpu.training.trainer import InpaintTrainer

    return _make(
        tmp_path, trainer_cls=InpaintTrainer, framework="InpaintCFG",
        backbone={"in_channels": 10, "num_groups": 2, "model_channels": 16,
                  "num_head_channels": 8},
        dataset=ds, **kwargs,
    )


@pytest.mark.slow  # ~57s on the 1-core dev box; default tier budget is 20 min
def test_host_matches_device_synthesis(tmp_path):
    """synthesize_single (host path) == trainer.synthesize_cond (device path,
    grouped raster) per sample, same rng split layout."""
    ds = _dataset()
    tr = _trainer(tmp_path / "dev", ds)
    b = 4
    x0 = np.stack([ds[i]["x_0"] for i in range(b)])
    rng = jax.random.PRNGKey(7)

    dev = jax.jit(tr.synthesize_cond)({"x_0": jnp.asarray(x0)}, rng)

    rngs = jax.random.split(rng, b)
    x01 = x0 * 0.5 + 0.5
    host = [
        warp_cond.synthesize_single(
            jnp.asarray(x01[i]), rngs[i], augments=tuple(ds.augments),
            pose_std=ds.std, near=ds.near, far=ds.far,
        )
        for i in range(b)
    ]
    host = {k: jnp.stack([h[k] for h in host]) for k in host[0]}

    assert set(host) <= set(dev)
    for k in ("pose", "mask", "mask_rgb", "y"):
        np.testing.assert_allclose(
            np.asarray(dev[k]), np.asarray(host[k]), atol=3e-5, rtol=0,
            err_msg=k,
        )


def test_host_warp_dataset_items():
    ds = _dataset()
    hw = _wrap(ds)
    assert len(hw) == len(ds)
    assert hw.image_size == ds.image_size
    it = hw[3]
    s = ds.image_size
    assert it["y"].shape == (s, s, 4)
    assert it["mask"].shape == (s, s, 1)
    assert it["mask_rgb"].shape == (s, s, 1)
    assert it["pose"].shape == (2,)
    assert it["x_0"].shape == (s, s, 4)
    assert np.all(np.isin(np.asarray(it["mask"]), [0.0, 1.0]))
    assert np.abs(it["y"]).max() <= 1.0 + 1e-4
    # masked-out pixels are exactly the -1 floor (y in [-1,1], zeros pre-scale)
    m = np.asarray(it["mask"])[..., 0] == 0
    assert np.allclose(np.asarray(it["y"])[m][..., 3], -1.0)

    # visit counter: a refetch of the same index re-rolls the augments
    it2 = hw[3]
    assert not np.allclose(it["pose"], it2["pose"])

    # deterministic given the rng
    rng = jax.random.PRNGKey(5)
    a = hw.get_with_rng(3, rng)
    b = hw.get_with_rng(3, rng)
    np.testing.assert_array_equal(a["y"], b["y"])
    np.testing.assert_array_equal(a["pose"], b["pose"])


def test_host_warp_dataset_pickles():
    """Spawned process workers pickle the dataset over; the lazy jit/device
    handles and visit counters must not travel."""
    import pickle

    hw = _wrap(_dataset())
    hw[0]  # populate lazy state
    hw2 = pickle.loads(pickle.dumps(hw))
    assert hw2._fn is None and hw2._cpu is None and hw2._visits == {}
    it = hw2[0]
    assert it["y"].shape == (32, 32, 4)


@pytest.mark.slow  # ~126s on the 1-core dev box; default tier budget is 20 min
def test_trainer_warp_host_step(tmp_path):
    ds = _dataset(length=32)
    tr = _trainer(tmp_path, ds, warp_host=True)
    assert tr.warp_host
    assert isinstance(tr._loader_obj.dataset, HostWarpDataset)
    # the trainer's own dataset stays unwrapped (visualization fetches it
    # directly and synthesizes cond on device, collectively)
    assert tr.dataset is ds

    m = tr.run_step()
    assert np.isfinite(float(m["loss"]))
    # Zero-init output conv → first loss ≈ E||eps||² = 1.
    assert abs(float(m["loss"]) - 1.0) < 0.2

    # pass-through prepare_batch: conditioning keys flow from the loader
    batch = {"x_0": jnp.zeros((2, 32, 32, 4)), "y": jnp.ones((2, 32, 32, 4))}
    out = tr.prepare_batch(batch, jax.random.PRNGKey(0))
    assert out is batch
