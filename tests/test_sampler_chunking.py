"""Chunked sampler dispatches must be bit-identical to the single scan.

The relayed single-chip TPU backend kills device dispatches beyond ~1-2
minutes, so long chains (the eval protocol's 1000-step uncond DDPM,
reference: README.md:90) run as host-chained chunks
(``ScenePipeline._run_uncond``). Correctness hinges on the samplers folding
ABSOLUTE step indices into the rng — these tests pin that contract."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivid_tpu.diffusion import build_framework, samplers
from ivid_tpu.models import build_adm_unet


@pytest.fixture(scope="module")
def small_model():
    cfg = dict(
        image_size=16, in_channels=4, out_channels=4, model_channels=32,
        num_res_blocks=1, channel_mult=[1, 2], attention_resolutions=[8],
        num_groups=8, num_heads=None, num_head_channels=16,
        num_classes=10, has_null_class=True, dropout=0.0, use_fp16=False,
    )
    model = build_adm_unet(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 4)),
        jnp.zeros((2,), jnp.int32), jnp.zeros((2,), jnp.int32),
    )["params"]
    fw = build_framework(
        "ClassifierFreeGuidance", model,
        {"timesteps": 100, "beta_schedule": "linear", "p_uncond": 0.1},
    )
    return fw, params


def _chain(sample, noise, plan, **kw):
    x = noise
    for i_start, k in plan:
        x = sample(noise=x, num_steps=k, i_start=jnp.int32(i_start), **kw)["samples"]
    return x


def test_ddpm_chunked_bit_identical(small_model):
    fw, params = small_model
    rng = jax.random.PRNGKey(5)
    noise = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 16, 4))
    cond = {"classes": jnp.array([1, 2])}
    full = samplers.ddpm_sample(
        fw, params, rng, noise=noise, cond=cond, guidance=0.5
    )["samples"]
    chunked = _chain(
        lambda **kw: samplers.ddpm_sample(fw, params, rng, cond=cond, guidance=0.5, **kw),
        noise, [(100, 40), (60, 40), (20, 20)],
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


def test_ddim_chunked_bit_identical(small_model):
    fw, params = small_model
    rng = jax.random.PRNGKey(5)
    noise = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 16, 4))
    cond = {"classes": jnp.array([1, 2])}
    full = samplers.ddim_sample(
        fw, params, rng, noise=noise, cond=cond, guidance=0.5, steps=10
    )["samples"]
    chunked = _chain(
        lambda **kw: samplers.ddim_sample(
            fw, params, rng, cond=cond, guidance=0.5, steps=10, **kw
        ),
        noise, [(10, 6), (4, 4)],
    )
    np.testing.assert_array_equal(np.asarray(full), np.asarray(chunked))


def test_pipeline_run_uncond_chunked_with_tail(small_model, monkeypatch):
    fw, params = small_model
    monkeypatch.setenv("IVID_TPU_SAMPLER_CHUNK", "33")  # 100 = 33*3 + 1 tail
    from ivid_tpu.inference.pipeline import ScenePipeline

    pipe = ScenePipeline(fw, None, image_size=16, steps_uncond=100, guidance=0.5)
    rng = jax.random.PRNGKey(5)
    noise = jax.random.normal(jax.random.PRNGKey(6), (2, 16, 16, 4))
    classes = jnp.array([1, 2])
    got = pipe._run_uncond(params, rng, noise, classes)
    ref = samplers.ddpm_sample(
        fw, params, rng, noise=noise, cond={"classes": classes}, guidance=0.5
    )["samples"]
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
