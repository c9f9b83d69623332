"""Per-sample warp-conditioning synthesis shared by the device and host paths.

The inpaint trainer synthesizes its conditioning (a forward-backward warp of
the ground-truth RGBD plus augments — reference: datasets/base.py:215-267)
either ON DEVICE inside the jitted train step (`InpaintTrainer.synthesize_cond`
vmaps/groups these helpers) or ON HOST in dataloader workers
(`ivid_tpu.data.warp_host.HostWarpDataset` jits `synthesize_single` on the CPU
backend — the reference's architecture, where warp cost overlaps the train
step instead of serializing with it, base.py:215-238).

Both paths compose the SAME `presample`/`postprocess` functions around the
warp raster, so they agree to fragment-tie order (the grouped device raster
sums equal-depth fragments in a different order than the per-sample one);
`tests/test_warp_host.py` pins the parity.

RNG contract: one key `r` per sample. `presample` consumes split(r, 8)[0:6],
`postprocess` consumes split(r, 8)[6:8] plus split(fold_in(r, 99), 4) — the
exact layout the round-2 device path shipped with, kept stable so host- and
device-synthesized conditioning are interchangeable sample-for-sample.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ivid_tpu.ops import camera as cam
from ivid_tpu.ops import geometry as geom
from ivid_tpu.ops import image as im_ops
from ivid_tpu.ops import warp as warp_ops


def presample(rgbd01, r, *, augments, pose_std):
    """Pre-warp augment + random orbit pose for ONE sample
    (reference: datasets/base.py:215-236).

    Returns (rgbd_in, modelview1, pose[theta, phi])."""
    rs = jax.random.split(r, 8)
    rgbd_in = rgbd01
    if "prewarp_noise" in augments:
        sigma = 0.005 * jax.random.uniform(rs[0], ())
        rgbd_in = rgbd_in + sigma * jax.random.normal(rs[1], rgbd_in.shape)
    theta = pose_std * jax.random.normal(rs[2], ())
    phi = pose_std * jax.random.normal(rs[3], ())
    radius = 1.0 + 0.1 * jax.random.normal(rs[4], ())
    center = 0.05 * jax.random.normal(rs[5], (3,))
    eye = jnp.stack([
        radius * jnp.cos(phi) * jnp.sin(theta),
        radius * jnp.sin(phi),
        radius * jnp.cos(phi) * jnp.cos(theta),
    ])
    mv1 = cam.look_at(eye, center, jnp.array([0.0, 1.0, 0.0]))
    return rgbd_in, mv1, jnp.stack([theta, phi])


def postprocess(rgbd01, r, color, depth, mask, *, augments):
    """Post-warp augments for ONE sample: noise, blur, RGB-mask erosion,
    masking and [-1,1] rescale (reference: datasets/base.py:239-263).

    Returns {"y", "mask"[, "mask_rgb"]}."""
    rs = jax.random.split(r, 8)
    y = jnp.concatenate([color, depth], axis=-1)

    if "postwarp_noise" in augments:
        sigma = 0.03 * jax.random.uniform(rs[6], ())
        y = y + sigma * jax.random.normal(rs[7], y.shape)

    extra = jax.random.split(jax.random.fold_in(r, 99), 4)
    if "blur" in augments:
        blurred = im_ops.gaussian_blur_random_sigma(extra[0], rgbd01[..., :3])
        use_blur = jax.random.uniform(extra[1], ()) < 0.8
        y = y.at[..., :3].set(jnp.where(use_blur, blurred, y[..., :3]))

    out = {}
    if "erode_rgb" in augments:
        # radius ∈ {0..4} uniformly (reference: base.py:250-255).
        radius = jax.random.randint(extra[2], (), 0, 5)
        branches = [partial(geom.erode, radius=rr) for rr in range(5)]
        mask_rgb = jax.lax.switch(radius, branches, mask)
        y = y.at[..., :3].multiply(mask_rgb)
        out["mask_rgb"] = mask_rgb

    y = y * mask
    # All four channels rescale [0,1] → [-1,1] (the reference's per-slice
    # form, base.py:262-263, actually rescales CHW columns — see the compat
    # note in checkpoint.finetune_load).
    y = y * 2 - 1
    out.update({"y": y, "mask": mask})
    return out


def synthesize_single(rgbd01, r, *, augments, pose_std, near, far):
    """Full conditioning synthesis for ONE [s,s,4] sample in [0,1]: pose draw,
    per-sample forward-backward warp (padding = image size, base.py:238),
    post augments. Returns {"y", "mask", "pose"[, "mask_rgb"]}.

    This is the host-worker entry point; the device trainer instead groups the
    warp raster across samples (`forward_backward_warp_batch`) around the same
    presample/postprocess."""
    augments = tuple(augments)
    s = rgbd01.shape[0]
    rgbd_in, mv1, pose = presample(
        rgbd01, r, augments=augments, pose_std=pose_std
    )
    res = warp_ops.forward_backward_warp(
        rgbd_in, mv1, padding=s, near=near, far=far
    )
    out = postprocess(
        rgbd01, r, res["color"], res["depth"], res["mask"], augments=augments
    )
    out["pose"] = pose
    return out
