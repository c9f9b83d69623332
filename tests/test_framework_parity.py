"""Numeric parity with the reference frameworks/samplers (imported live).

These pin down the subtle conditioning-channel ORDER (a silent killer for
torch-checkpoint compatibility) and the sampler update math. Noise-dependent
paths are made deterministic by full-visibility masks / eta=0 / zeroed noise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ivid_tpu.diffusion import build_framework, samplers, schedules
from ref_loader import HAVE_REFERENCE, import_reference

pytestmark = pytest.mark.skipif(
    not HAVE_REFERENCE, reason="reference checkout not available"
)


class _EpsModel:
    """Analytic stand-in backbone: eps = 0.1 * x[..., :4]."""

    def apply(self, variables, x, t, classes=None):
        del variables, t, classes
        return 0.1 * x[..., :4]


def _nchw(x):
    import torch

    return torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)))


def _nhwc(x):
    return np.transpose(x.numpy(), (0, 2, 3, 1))


def test_inpaint_cond_packing_channel_order():
    """10-channel packing [x, mask_rgb, y_rgb, y_depth, mask]
    (reference: diffusion/frameworks/inpaint_cfg.py:24-49). With all-ones masks
    the noise fill vanishes and packing is deterministic."""
    import torch

    ref = import_reference()

    class TorchStub(torch.nn.Module):
        def forward(self, x, times, classes=None):
            return x[:, :4]

    rfw = ref.frameworks.InpaintCFG(TorchStub(), p_uncond=0.0, timesteps=100)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    y = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    ones = np.ones((2, 8, 8, 1), np.float32)
    mask_rgb = np.ones((2, 8, 8, 1), np.float32)

    ref_packed = rfw.make_cond_inputs(
        _nchw(x), _nchw(y), _nchw(ones), mask_rgb=_nchw(mask_rgb)
    )
    ours = build_framework(
        "InpaintCFG", _EpsModel(),
        {"timesteps": 100, "beta_schedule": "linear", "p_uncond": 0.0,
         "p_uncond_img": 0},
    )
    got = ours.pack_inputs(
        jax.random.PRNGKey(0), jnp.asarray(x),
        {"y": jnp.asarray(y), "mask": jnp.asarray(ones),
         "mask_rgb": jnp.asarray(mask_rgb)},
    )
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref_packed), atol=1e-6)


def test_sr_cond_packing_bilinear():
    """8-channel packing [x, bilinear-up y] with align_corners=False
    (reference: diffusion/frameworks/sr_cfg.py:23-36)."""
    import torch

    ref = import_reference()

    class TorchStub(torch.nn.Module):
        def forward(self, x, times, classes=None):
            return x[:, :4]

    rfw = ref.frameworks.SuperResCFG(TorchStub(), p_uncond=0.0, timesteps=100)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    y = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    ref_packed = rfw.make_cond_inputs(_nchw(x), _nchw(y))
    ours = build_framework(
        "SuperResCFG", _EpsModel(),
        {"timesteps": 100, "beta_schedule": "linear", "p_uncond": 0.0},
    )
    got = ours.pack_inputs(None, jnp.asarray(x), {"y": jnp.asarray(y)})
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref_packed), atol=2e-5)


def _torch_eps_framework(ref, timesteps=100):
    import torch

    class TorchStub(torch.nn.Module):
        def forward(self, x, times, classes=None):
            return 0.1 * x[:, :4]

    return ref.frameworks.GaussianDiffusion(TorchStub(), timesteps=timesteps)


def test_ddim_trajectory_parity():
    """Full deterministic (eta=0) DDIM trajectories must match
    (reference: diffusion/samplers/ddim.py:105-165)."""
    import torch

    ref = import_reference()
    rfw = _torch_eps_framework(ref)
    rsampler = ref.samplers.DdimSampler(rfw)

    rng = np.random.default_rng(0)
    noise = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)

    # Reference loop (bypassing its .sample() which needs backbone attrs).
    x = _nchw(noise)
    steps, T = 10, 100
    jump = T // steps
    for i in reversed(range(steps)):
        t = torch.full((2,), jump * (i + 1))
        t_prev = torch.full((2,), jump * i)
        out = rsampler.sample_once(x, t, t_prev, eta=0.0)
        x = out.pred_x_prev
    ref_final = _nhwc(x)

    ours = build_framework(
        "GaussianDiffusion", _EpsModel(), {"timesteps": T, "beta_schedule": "linear"}
    )
    got = samplers.ddim_sample(
        ours, {}, jax.random.PRNGKey(0), noise=jnp.asarray(noise), steps=steps,
        eta=0.0,
    )["samples"]
    np.testing.assert_allclose(np.asarray(got), ref_final, atol=2e-4, rtol=1e-4)


def test_ddim_guided_edits_parity():
    """replace_rgb / replace_depth / constrain_depth single-step parity
    (reference: diffusion/samplers/ddim.py:86-95)."""
    import torch

    ref = import_reference()
    rfw = _torch_eps_framework(ref)
    rsampler = ref.samplers.DdimSampler(rfw)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    tgt_rgb = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    tgt_d = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    convex = rng.normal(size=(2, 8, 8, 1)).astype(np.float32)
    mask = (rng.uniform(size=(2, 8, 8, 1)) > 0.5).astype(np.float32)

    t = torch.full((2,), 50)
    t_prev = torch.full((2,), 40)
    out = rsampler.sample_once(
        _nchw(x), t, t_prev, eta=0.0,
        replace_rgb=(0.1, _nchw(tgt_rgb), _nchw(mask)),
        replace_depth=(0.2, _nchw(tgt_d), _nchw(mask)),
        constrain_depth=(0.5, _nchw(convex)),
    )
    ref_prev = _nhwc(out.pred_x_prev)

    ours = build_framework(
        "GaussianDiffusion", _EpsModel(), {"timesteps": 100, "beta_schedule": "linear"}
    )
    s = ours.schedule
    tj = jnp.full((2,), 50, jnp.int32)
    tpj = jnp.full((2,), 40, jnp.int32)
    eps = 0.1 * jnp.asarray(x)
    pred_x0 = schedules.predict_xstart_from_eps(s, jnp.asarray(x), tj - 1, eps)
    edits = samplers.PredX0Edits(
        replace_rgb=(0.1, jnp.asarray(tgt_rgb), jnp.asarray(mask)),
        replace_depth=(0.2, jnp.asarray(tgt_d), jnp.asarray(mask)),
        constrain_depth=(0.5, jnp.asarray(convex)),
    )
    nz = (tpj != 0).astype(jnp.float32).reshape(-1, 1, 1, 1)
    pred_x0 = samplers.apply_pred_x0_edits(pred_x0, edits, nz)
    eps2 = schedules.predict_eps_from_xstart(s, jnp.asarray(x), tj - 1, pred_x0)
    ab = schedules.extract(s.alphas_cumprod, tj - 1, 4)
    abp = schedules.extract(s.alphas_cumprod_prev, tpj, 4)
    got_prev = jnp.sqrt(abp) * pred_x0 + jnp.sqrt(1 - abp) * eps2
    np.testing.assert_allclose(np.asarray(got_prev), ref_prev, atol=2e-4, rtol=1e-3)


def test_ddpm_posterior_parity():
    """p_mean_variance tables match the reference DDPM sampler
    (reference: diffusion/samplers/ddpm.py:43-101)."""
    import torch

    ref = import_reference()
    rfw = _torch_eps_framework(ref)
    rsampler = ref.samplers.DdpmSampler(rfw)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    t_np = np.array([7, 93])
    out = rsampler.p_mean_variance(_nchw(x), torch.from_numpy(t_np))

    ours = build_framework(
        "GaussianDiffusion", _EpsModel(), {"timesteps": 100, "beta_schedule": "linear"}
    )
    s = ours.schedule
    tj = jnp.asarray(t_np, jnp.int32)
    eps = 0.1 * jnp.asarray(x)
    pred_x0 = schedules.predict_xstart_from_eps(s, jnp.asarray(x), tj, eps)
    mean, var, logvar = schedules.q_posterior_mean_variance(
        s, pred_x0, jnp.asarray(x), tj
    )
    np.testing.assert_allclose(np.asarray(mean), _nhwc(out["mean"]), atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(logvar), (2, 8, 8, 4)),
        _nhwc(out["log_variance"]), atol=1e-5, rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(pred_x0), _nhwc(out["pred_x_0"]), atol=2e-5, rtol=1e-4
    )
