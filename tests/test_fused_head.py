"""Equivalence tests for the fused GN+SiLU+conv output-head kernel
(ops/fused_head.py) against the unfused fp32 reference composition
(reference semantics: diffusion/backbones/adm.py:483-487,565-566)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivid_tpu.ops.fused_head import (
    fused_gn_silu_conv,
    supports_fused_head,
)


def _reference_head(x, gn_scale, gn_bias, kernel, conv_bias, num_groups):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32)
    g = num_groups
    cpg = c // g
    grp = xf.reshape(b, h * w, g, cpg)
    mu = grp.mean(axis=(1, 3), keepdims=True)
    var = ((grp - mu) ** 2).mean(axis=(1, 3), keepdims=True)
    y = ((grp - mu) * jax.lax.rsqrt(var + 1e-5)).reshape(b, h, w, c)
    y = y * gn_scale + gn_bias
    y = y * jax.nn.sigmoid(y)
    out = jax.lax.conv_general_dilated(
        y, kernel.astype(jnp.float32), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + conv_bias


@pytest.mark.parametrize(
    "shape,groups",
    [((2, 64, 256, 128), 32), ((3, 32, 128, 256), 32), ((1, 96, 128, 128), 16)],
)
def test_fused_head_matches_reference(shape, groups):
    keys = jax.random.split(jax.random.PRNGKey(0), 5)
    b, h, w, c = shape
    f = 4
    x = jax.random.normal(keys[0], shape, jnp.float32).astype(jnp.bfloat16)
    gn_scale = jax.random.normal(keys[1], (c,)) * 0.2 + 1.0
    gn_bias = jax.random.normal(keys[2], (c,)) * 0.1
    kernel = jax.random.normal(keys[3], (3, 3, c, f)) * (1.0 / np.sqrt(9 * c))
    conv_bias = jax.random.normal(keys[4], (f,)) * 0.1

    assert supports_fused_head(shape, groups)
    got = fused_gn_silu_conv(
        x, gn_scale, gn_bias, kernel, conv_bias, groups, interpret=True
    )
    want = _reference_head(x, gn_scale, gn_bias, kernel, conv_bias, groups)
    assert got.shape == want.shape == (b, h, w, f)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_fused_head_zero_kernel_gives_bias():
    # The production head is zero-init: output must be exactly the conv bias.
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 128, 128)).astype(
        jnp.bfloat16
    )
    c, f = 128, 4
    got = fused_gn_silu_conv(
        x, jnp.ones((c,)), jnp.zeros((c,)), jnp.zeros((3, 3, c, f)),
        jnp.full((f,), 0.25), 32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), 0.25, rtol=0, atol=0)


def test_supports_fused_head_gates():
    assert not supports_fused_head((2, 64, 256, 96), 32)  # lanes not aligned
    assert not supports_fused_head((2, 60, 256, 128), 32)  # rows not aligned
    assert not supports_fused_head((2, 64, 64, 128), 32)  # W below lane width
    assert not supports_fused_head((2, 64, 256), 32)  # rank


def test_model_fused_head_matches_unfused(monkeypatch):
    # Full-model gate: identical param tree and near-identical outputs with
    # the fused head on (interpret mode off-TPU) vs the unfused composition.
    from ivid_tpu.models import build_adm_unet

    cfg = dict(
        image_size=128,
        in_channels=4,
        model_channels=128,
        out_channels=4,
        num_res_blocks=1,
        channel_mult=(1,),
        attention_resolutions=(),
        num_groups=32,
        num_heads=None,
        num_head_channels=64,
        num_classes=None,
        has_null_class=False,
        dropout=0.0,
        use_fp16=False,
    )
    model = build_adm_unet(cfg)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, 128, 128, 4)), jnp.float32
    )
    t = jnp.array([500], jnp.int32)

    monkeypatch.setenv("IVID_TPU_FUSED_HEAD", "0")
    params = model.init(jax.random.PRNGKey(0), x, t, None)["params"]
    want = model.apply({"params": params}, x, t, None)

    monkeypatch.setenv("IVID_TPU_FUSED_HEAD", "1")
    params_f = model.init(jax.random.PRNGKey(0), x, t, None)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_f
    )
    got = model.apply({"params": params}, x, t, None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3
    )


def test_fused_head_gradients_match_unfused():
    from ivid_tpu.ops.fused_head import unfused_gn_silu_conv

    keys = jax.random.split(jax.random.PRNGKey(7), 5)
    b, h, w, c, f, groups = 1, 32, 128, 128, 4, 32
    x = jax.random.normal(keys[0], (b, h, w, c), jnp.float32).astype(jnp.bfloat16)
    gn_scale = jax.random.normal(keys[1], (c,)) * 0.2 + 1.0
    gn_bias = jax.random.normal(keys[2], (c,)) * 0.1
    kernel = jax.random.normal(keys[3], (3, 3, c, f)) * (1.0 / np.sqrt(9 * c))
    conv_bias = jax.random.normal(keys[4], (f,)) * 0.1
    tgt = jax.random.normal(keys[0], (b, h, w, f))

    def loss_fused(x, s, bb, k, cb):
        y = fused_gn_silu_conv(x, s, bb, k, cb, groups, interpret=True)
        return jnp.mean((y - tgt) ** 2)

    def loss_unfused(x, s, bb, k, cb):
        y = unfused_gn_silu_conv(x, s, bb, k, cb, groups)
        return jnp.mean((y - tgt) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(
        x, gn_scale, gn_bias, kernel, conv_bias
    )
    gu = jax.grad(loss_unfused, argnums=(0, 1, 2, 3, 4))(
        x, gn_scale, gn_bias, kernel, conv_bias
    )
    for a, b_ in zip(gf, gu):
        assert a.dtype == b_.dtype
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_, np.float32),
            rtol=1e-4, atol=1e-5,
        )
