"""Trainer tests on the 8-device virtual CPU mesh: data-parallel step, EMA,
checkpoint round-trip, replication check, warp-in-step conditioning, TP mesh.

This is the test coverage the reference only gets on a live cluster
(SURVEY.md §4: check_ddp runs inside production training)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ivid_tpu.config import Config
from ivid_tpu.data import SyntheticRGBD, SyntheticRGBDSR, SyntheticRGBDWarp
from ivid_tpu.diffusion import build_framework
from ivid_tpu.models import build_adm_unet
from ivid_tpu.training.trainer import BasicTrainer, InpaintTrainer, SuperResTrainer

SMALL_BACKBONE = dict(
    image_size=32, in_channels=4, out_channels=4, model_channels=32,
    num_res_blocks=1, channel_mult=[1, 2], attention_resolutions=[16],
    num_groups=8, num_heads=None, num_head_channels=16,
    num_classes=None, has_null_class=False, dropout=0.0, use_fp16=False,
)


def _make(tmp_path, *, trainer_cls=BasicTrainer, framework="GaussianDiffusion",
          fw_args=None, dataset=None, backbone=None, **kwargs):
    backbone_args = dict(SMALL_BACKBONE, **(backbone or {}))
    model = build_adm_unet(backbone_args)
    fw = build_framework(
        framework, model, fw_args or {"timesteps": 100, "beta_schedule": "linear"}
    )
    ds = dataset or SyntheticRGBD(
        image_size=32, length=64, normalize=True, normalize_depth=True,
        prepocess_depth="z_buffer",
    )
    extra = {}
    if trainer_cls is not BasicTrainer:
        extra["backbone_args"] = backbone_args
    return trainer_cls(
        fw, ds, str(tmp_path), max_steps=4, batch_size=8,
        i_log=2, i_sample=10**9, i_save=10**9, i_ddpcheck=2, **extra, **kwargs
    )


def test_basic_trainer_steps_and_replication(tmp_path):
    assert len(jax.devices()) == 8
    tr = _make(tmp_path)
    m0 = tr.run_step()
    m1 = tr.run_step()
    l0, l1 = float(m0["loss"]), float(m1["loss"])
    assert np.isfinite(l0) and np.isfinite(l1)
    # Zero-init output conv → first loss ≈ E||eps||² = 1.
    assert abs(l0 - 1.0) < 0.2
    from ivid_tpu.parallel import check_replication

    check_replication(tr.params)
    # EMA drifted from init by a tiny amount and differs from params.
    diff = jax.tree.map(
        lambda e, p: float(jnp.abs(e - p).max()), tr.ema_params[0], tr.params
    )
    assert max(jax.tree.leaves(diff)) > 0


@pytest.mark.slow  # fresh bf16-variant compile ~2 min on the 1-core dev box;
# the fast-tier bug gate is tests/test_adm.py::test_head_bf16_train_grad
def test_basic_trainer_bf16_torso(tmp_path):
    """Production configs train with use_fp16=True (bf16 torso on TPU) —
    the round-4 IVID_TPU_HEAD_BF16 default broke exactly this path while
    every trainer test ran f32 (caught by the round-5 host-warp demo).
    Gate the full jitted train step (grads + optimizer + EMA) in bf16."""
    tr = _make(tmp_path, backbone={"use_fp16": True})
    l0 = float(tr.run_step()["loss"])
    l1 = float(tr.run_step()["loss"])
    assert np.isfinite(l0) and np.isfinite(l1)
    assert abs(l0 - 1.0) < 0.2
    # Params stay f32 master copies under the bf16 compute policy.
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(tr.params))


@pytest.mark.slow  # ~116s on the 1-core dev box; default tier budget is 20 min
def test_gradient_accumulation_matches_single(tmp_path):
    """batch_split=2 must produce the same gradient as the full batch.

    Uses a deterministic (rng-independent) loss and plain SGD so the updated
    params are an affine function of the gradient — Adam would normalize away
    a wrong averaging factor; with SGD, dropping the /batch_split division
    doubles the step and fails the comparison."""
    import optax

    from ivid_tpu.parallel import replicated

    tr1 = _make(tmp_path / "a", seed=7)
    tr2 = _make(tmp_path / "b", seed=7, batch_split=2)

    for tr in (tr1, tr2):
        model = tr.model

        def det_loss(params, rng, batch, model=model):
            del rng
            x = batch["x_0"]
            t = jnp.full((x.shape[0],), 5, jnp.int32)
            out = model.apply({"params": params}, x, t)
            loss = jnp.mean((out - x) ** 2)
            return loss, {"loss": loss, "mse": loss}

        tr._loss_fn = det_loss
        tr.tx = optax.sgd(0.05)
        tr.opt_state = jax.device_put(
            tr.tx.init(jax.device_get(tr.params)), replicated(tr.mesh)
        )
        tr._compile()

    batch = {
        "x_0": np.random.default_rng(0).normal(size=(8, 32, 32, 4)).astype(np.float32)
    }
    rng = jax.random.PRNGKey(3)
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    p0 = jax.device_get(tr1.params)
    p1, _, _, m1 = tr1._step_fn(tr1.params, tr1.opt_state, tr1.ema_params, rng, db)
    p2, _, _, m2 = tr2._step_fn(tr2.params, tr2.opt_state, tr2.ema_params, rng, db)
    p1, p2 = jax.device_get(p1), jax.device_get(p2)
    # The step moved the params...
    moved = max(
        float(np.abs(a - b).max()) for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1))
    )
    assert moved > 1e-6
    # ...identically for split and unsplit gradients.
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)


def test_checkpoint_roundtrip(tmp_path):
    tr = _make(tmp_path)
    tr.run_step()
    tr.step = 3
    tr.save()
    tr2 = _make(tmp_path)
    tr2.load(str(tmp_path), 3)
    assert tr2.step == 3
    a = jax.tree.leaves(jax.device_get(tr.params))
    b = jax.tree.leaves(jax.device_get(tr2.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_finetune_channel_pad(tmp_path):
    """Uncond 4ch checkpoint initializes a 10ch cond model with zero-padded
    input conv (reference: inpaint.py:68-94)."""
    tr = _make(tmp_path / "uncond")
    tr.step = 1
    tr.save()
    ds = SyntheticRGBDWarp(
        image_size=32, length=64, normalize=True, normalize_depth=True,
        prepocess_depth="z_buffer", augments=["prewarp_noise", "blur", "erode_rgb"],
    )
    tr2 = _make(
        tmp_path / "cond", trainer_cls=InpaintTrainer, framework="InpaintCFG",
        fw_args={"timesteps": 100, "beta_schedule": "linear", "p_uncond": 0.1,
                 "p_uncond_img": 0},
        dataset=ds, backbone={"in_channels": 10},
    )
    from ivid_tpu.training.checkpoint import model_path

    tr2.finetune_from(model_path(str(tmp_path / "uncond"), 1))
    k = jax.device_get(tr2.params["in_conv"]["kernel"])
    src = jax.device_get(tr.params["in_conv"]["kernel"])
    np.testing.assert_array_equal(k[:, :, :4], src)
    np.testing.assert_array_equal(k[:, :, 4:], 0)


@pytest.mark.slow  # ~58s on the 1-core dev box; default tier budget is 20 min
def test_inpaint_trainer_warp_in_step(tmp_path):
    """The on-device warp produces a valid conditioning batch and a finite loss."""
    ds = SyntheticRGBDWarp(
        image_size=32, length=64, normalize=True, normalize_depth=True,
        prepocess_depth="z_buffer", augments=["prewarp_noise", "blur", "erode_rgb"],
    )
    tr = _make(
        tmp_path, trainer_cls=InpaintTrainer, framework="InpaintCFG",
        fw_args={"timesteps": 100, "beta_schedule": "linear", "p_uncond": 0.1,
                 "p_uncond_img": 0},
        dataset=ds, backbone={"in_channels": 10},
    )
    batch = next(tr.loader)
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    prepared = jax.jit(tr.prepare_batch)(db, jax.random.PRNGKey(0))
    assert prepared["y"].shape == (8, 32, 32, 4)
    assert prepared["mask"].shape == (8, 32, 32, 1)
    assert prepared["mask_rgb"].shape == (8, 32, 32, 1)
    assert prepared["pose"].shape == (8, 2)
    m = np.asarray(prepared["mask"])
    assert 0.1 < m.mean() <= 1.0
    loss = tr.run_step()
    assert np.isfinite(float(loss["loss"]))


def test_inpaint_prepare_batch_matches_per_sample(tmp_path):
    """The grouped batched-warp prepare_batch reproduces the per-sample
    forward_backward_warp composition (same rng schedule, same outputs up to
    tie summation order)."""
    from functools import partial

    from ivid_tpu.ops import camera as cam
    from ivid_tpu.ops import geometry as geom
    from ivid_tpu.ops import image as im_ops
    from ivid_tpu.ops import warp as warp_ops

    ds = SyntheticRGBDWarp(
        image_size=32, length=64, normalize=True, normalize_depth=True,
        prepocess_depth="z_buffer", augments=["prewarp_noise", "blur", "erode_rgb"],
    )
    tr = _make(
        tmp_path, trainer_cls=InpaintTrainer, framework="InpaintCFG",
        fw_args={"timesteps": 100, "beta_schedule": "linear", "p_uncond": 0.1,
                 "p_uncond_img": 0},
        dataset=ds, backbone={"in_channels": 10},
    )
    batch = next(tr.loader)
    db = {k: jnp.asarray(v) for k, v in batch.items()}
    rng = jax.random.PRNGKey(7)
    os.environ["IVID_TPU_WARP_GROUP"] = "4"
    try:
        prepared = jax.jit(tr.prepare_batch)(db, rng)
    finally:
        del os.environ["IVID_TPU_WARP_GROUP"]

    # Per-sample reference composition (the former lax.map body).
    def one(rgbd01, r):
        rs = jax.random.split(r, 8)
        sigma = 0.005 * jax.random.uniform(rs[0], ())
        rgbd_in = rgbd01 + sigma * jax.random.normal(rs[1], rgbd01.shape)
        theta = tr.pose_std * jax.random.normal(rs[2], ())
        phi = tr.pose_std * jax.random.normal(rs[3], ())
        radius = 1.0 + 0.1 * jax.random.normal(rs[4], ())
        center = 0.05 * jax.random.normal(rs[5], (3,))
        eye = jnp.stack([
            radius * jnp.cos(phi) * jnp.sin(theta),
            radius * jnp.sin(phi),
            radius * jnp.cos(phi) * jnp.cos(theta),
        ])
        mv1 = cam.look_at(eye, center, jnp.array([0.0, 1.0, 0.0]))
        res = warp_ops.forward_backward_warp(
            rgbd_in, mv1, padding=32, near=tr.near, far=tr.far,
        )
        y = jnp.concatenate([res["color"], res["depth"]], axis=-1)
        mask = res["mask"]
        extra = jax.random.split(jax.random.fold_in(r, 99), 4)
        blurred = im_ops.gaussian_blur_random_sigma(extra[0], rgbd01[..., :3])
        use_blur = jax.random.uniform(extra[1], ()) < 0.8
        y = y.at[..., :3].set(jnp.where(use_blur, blurred, y[..., :3]))
        radius = jax.random.randint(extra[2], (), 0, 5)
        mask_rgb = jax.lax.switch(
            radius, [partial(geom.erode, radius=rr) for rr in range(5)], mask
        )
        y = y.at[..., :3].multiply(mask_rgb)
        y = y * mask
        return {"y": y * 2 - 1, "mask": mask, "mask_rgb": mask_rgb,
                "pose": jnp.stack([theta, phi])}

    x01 = db["x_0"] * 0.5 + 0.5
    rngs = jax.random.split(rng, x01.shape[0])
    ref = jax.lax.map(lambda a: one(*a), (x01, rngs))
    for k in ("y", "mask", "mask_rgb", "pose"):
        np.testing.assert_allclose(
            np.asarray(prepared[k]), np.asarray(ref[k]), atol=1e-5, err_msg=k
        )


def test_superres_trainer(tmp_path):
    ds = SyntheticRGBDSR(
        image_size=32, image_size_lr=16, length=64, normalize=True,
        normalize_depth=True, prepocess_depth="z_buffer",
    )
    tr = _make(
        tmp_path, trainer_cls=SuperResTrainer, framework="SuperResCFG",
        fw_args={"timesteps": 100, "beta_schedule": "linear", "p_uncond": 0.1},
        dataset=ds, backbone={"in_channels": 8},
    )
    loss = tr.run_step()
    assert np.isfinite(float(loss["loss"]))


def test_tensor_parallel_mesh(tmp_path):
    """TP=2 over the model axis: step runs and params stay consistent."""
    tr = _make(tmp_path, model_parallel=2)
    assert dict(tr.mesh.shape) == {"data": 4, "model": 2}
    loss = tr.run_step()
    assert np.isfinite(float(loss["loss"]))
    # TP-sharded params exist (at least one param not fully replicated).
    shardings = jax.tree.leaves(
        jax.tree.map(lambda p: p.sharding.is_fully_replicated, tr.params)
    )
    assert not all(shardings)


@pytest.mark.slow  # two extra trainer builds; default tier budget is 20 min
@pytest.mark.parametrize("mp", [4, 8])
def test_tensor_parallel_wider_splits(tmp_path, mp):
    """The sharding rules must generalize beyond the dryrun's mp=2: a
    data=2 x model=4 and a pure-TP 1x8 mesh both step with finite loss
    and a consistent replicated view."""
    from ivid_tpu.parallel import check_replication

    tr = _make(tmp_path, model_parallel=mp)
    assert dict(tr.mesh.shape) == {"data": 8 // mp, "model": mp}
    loss = tr.run_step()
    assert np.isfinite(float(loss["loss"]))
    check_replication(tr.params)


@pytest.mark.slow  # ~92s on the 1-core dev box; default tier budget is 20 min
def test_kill_and_resume_reproduces_loss_sequence(tmp_path):
    """A trainer killed after step 2 and resumed from its checkpoint must
    reproduce the loss sequence of an uninterrupted run exactly — requires
    persisting opt state, PRNG state, and the loader cursor
    (reference persists opt state + fp16 log_scale only, basic.py:244-252)."""
    d1, d2 = tmp_path / "a", tmp_path / "b"

    def run_steps(tr, n):
        out = []
        for _ in range(n):
            out.append(float(tr.run_step()["loss"]))
            tr.step += 1
        return out

    tr_full = _make(d1)
    full = run_steps(tr_full, 5)

    tr_a = _make(d2)
    first = run_steps(tr_a, 2)
    tr_a.save()
    step_saved = tr_a.step
    del tr_a

    tr_b = _make(d2)
    tr_b.load(str(d2), step_saved)
    assert tr_b.step == step_saved
    rest = run_steps(tr_b, 3)

    np.testing.assert_allclose(first + rest, full, rtol=1e-5)


@pytest.mark.slow  # ~130s on the 1-core dev box; default tier budget is 20 min
def test_sample_visualization_with_small_dataset(tmp_path):
    """sample() must clamp the sampler batch to the rows _visualization_batch
    actually returned, or InpaintCFG.pack_inputs shape-errors whenever the
    dataset is smaller than num_samples (e.g. smoke configs + sample_at_init)."""
    ds = SyntheticRGBDWarp(
        image_size=32, length=4, normalize=True, normalize_depth=True,
        prepocess_depth="z_buffer", augments=["erode_rgb"],
    )
    tr = _make(
        tmp_path, trainer_cls=InpaintTrainer, framework="InpaintCFG",
        fw_args={"timesteps": 100, "beta_schedule": "linear", "p_uncond": 0.1,
                 "p_uncond_img": 0},
        dataset=ds, backbone={"in_channels": 10},
    )
    tr.sample(suffix="smoke", num_samples=9)  # > len(dataset)
    out = os.path.join(str(tmp_path), "samples", "rgb_smoke.png")
    assert os.path.exists(out)
