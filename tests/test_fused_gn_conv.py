"""Fused ResBlock GN(+FiLM)+SiLU+conv3x3 vs the unfused composition.

Interpret-mode equivalence (math), gradient equivalence (custom VJP), and
model-level param-tree/output identity under IVID_TPU_FUSED_GNCONV=1.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ivid_tpu.ops.fused_gn_conv import (
    fused_affine_silu_conv,
    gn_affine,
    supports_fused_gn_conv,
    unfused_affine_silu_conv,
)


def _inputs(key, b, h, w, c, f):
    ks = jax.random.split(key, 6)
    x = jax.random.normal(ks[0], (b, h, w, c)).astype(jnp.bfloat16)
    gn_scale = jax.random.normal(ks[1], (c,)) * 0.2 + 1.0
    gn_bias = jax.random.normal(ks[2], (c,)) * 0.1
    kern = jax.random.normal(ks[3], (3, 3, c, f)) * (9 * c) ** -0.5
    bias = jax.random.normal(ks[4], (f,)) * 0.1
    return x, gn_scale, gn_bias, kern, bias, ks[5]


def test_fused_matches_unfused_gn():
    b, h, w, c, f = 2, 16, 64, 128, 128
    assert supports_fused_gn_conv((b, h, w, c), f, 32)
    x, gs, gb, kern, bias, _ = _inputs(jax.random.PRNGKey(0), b, h, w, c, f)
    a, t = gn_affine(x, gs, gb, 32)
    got = fused_affine_silu_conv(x, a, t, kern, bias, interpret=True)
    want = unfused_affine_silu_conv(x, a, t, kern, bias)
    assert got.dtype == want.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.02,  # bf16 rounding placement differs (silu point)
    )


def test_fused_matches_unfused_film():
    b, h, w, c, f = 1, 32, 32, 128, 256
    x, gs, gb, kern, bias, k = _inputs(jax.random.PRNGKey(1), b, h, w, c, f)
    fs = jax.random.normal(jax.random.fold_in(k, 0), (b, c)) * 0.3
    fsh = jax.random.normal(jax.random.fold_in(k, 1), (b, c)) * 0.3
    a, t = gn_affine(x, gs, gb, 32, film_scale=fs, film_shift=fsh)
    got = fused_affine_silu_conv(x, a, t, kern, bias, interpret=True)
    want = unfused_affine_silu_conv(x, a, t, kern, bias)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.02,
    )


def test_fused_gradients_match_unfused():
    b, h, w, c, f = 1, 16, 64, 128, 128
    x, gs, gb, kern, bias, _ = _inputs(jax.random.PRNGKey(2), b, h, w, c, f)
    a, t = gn_affine(x, gs, gb, 32)
    tgt = jax.random.normal(jax.random.PRNGKey(3), (b, h, w, f))

    def loss(fn):
        def go(x, a, t, kern, bias):
            y = fn(x, a, t, kern, bias)
            return jnp.mean((y.astype(jnp.float32) - tgt) ** 2)
        return go

    fused = lambda *args: fused_affine_silu_conv(*args, interpret=True)
    gf = jax.grad(loss(fused), argnums=(0, 1, 2, 3, 4))(x, a, t, kern, bias)
    gu = jax.grad(loss(unfused_affine_silu_conv), argnums=(0, 1, 2, 3, 4))(
        x, a, t, kern, bias
    )
    # The two forwards differ by bf16 rounding placement, so the MSE
    # cotangents (and hence gradients) differ at bf16-eps scale too.
    for got, want in zip(gf, gu):
        assert got.dtype == want.dtype
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(want, np.float32),
            rtol=2e-2, atol=5e-4,
        )


def test_model_fused_gnconv_matches_unfused(monkeypatch):
    """A ResBlock-bearing model under IVID_TPU_FUSED_GNCONV=1 keeps the exact
    param tree and reproduces the unfused outputs."""
    from ivid_tpu.models import build_adm_unet

    cfg = dict(
        image_size=32, in_channels=4, out_channels=4, model_channels=128,
        num_res_blocks=1, channel_mult=[1], attention_resolutions=[],
        num_groups=32, num_heads=None, num_head_channels=64,
        num_classes=None, has_null_class=False, dropout=0.0, use_fp16=True,
    )
    model = build_adm_unet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 4))
    tt = jnp.array([7], jnp.int32)

    monkeypatch.setenv("IVID_TPU_FUSED_GNCONV", "0")
    params = model.init(jax.random.PRNGKey(1), x, tt)["params"]
    want = model.apply({"params": params}, x, tt)

    monkeypatch.setenv("IVID_TPU_FUSED_GNCONV", "1")
    params_fused = model.init(jax.random.PRNGKey(1), x, tt)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_fused
    )
    for (kp, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(params)[0],
        jax.tree_util.tree_flatten_with_path(params_fused)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(kp))
    got = model.apply({"params": params_fused}, x, tt)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_fused_parts_matches_unfused_parts():
    from ivid_tpu.ops.fused_gn_conv import (
        fused_affine_silu_conv_parts,
        gn_affine_parts,
        supports_fused_gn_conv_parts,
        unfused_affine_silu_conv_parts,
    )

    b, h, w, c0, c1, f = 1, 16, 64, 128, 128, 128
    assert supports_fused_gn_conv_parts(
        ((b, h, w, c0), (b, h, w, c1)), f, 32
    )
    ks = jax.random.split(jax.random.PRNGKey(5), 6)
    x0 = jax.random.normal(ks[0], (b, h, w, c0)).astype(jnp.bfloat16)
    x1 = jax.random.normal(ks[1], (b, h, w, c1)).astype(jnp.bfloat16) * 2.0
    gs = jax.random.normal(ks[2], (c0 + c1,)) * 0.2 + 1.0
    gb = jax.random.normal(ks[3], (c0 + c1,)) * 0.1
    kern = jax.random.normal(ks[4], (3, 3, c0 + c1, f)) * (9 * (c0 + c1)) ** -0.5
    bias = jax.random.normal(ks[5], (f,)) * 0.1

    ats = gn_affine_parts((x0, x1), gs, gb, 32)
    got = fused_affine_silu_conv_parts((x0, x1), ats, kern, bias, interpret=True)
    want = unfused_affine_silu_conv_parts((x0, x1), ats, kern, bias)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.02,
    )

    # And the affine itself matches a materialized-concat GroupNorm.
    cat = jnp.concatenate([x0, x1], axis=-1).astype(jnp.float32)
    a_ref, t_ref = gn_affine(cat, gs, gb, 32)
    a_got = jnp.concatenate([ats[0][0], ats[1][0]], axis=-1)
    t_got = jnp.concatenate([ats[0][1], ats[1][1]], axis=-1)
    np.testing.assert_allclose(np.asarray(a_got), np.asarray(a_ref), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t_got), np.asarray(t_ref), rtol=2e-4, atol=2e-4)


def test_model_fused_gnconv_split_path(monkeypatch):
    """Split-skip decoder + fused GN-conv: param tree and outputs match the
    plain (concat, unfused) path."""
    from ivid_tpu.models import build_adm_unet

    cfg = dict(
        image_size=32, in_channels=4, out_channels=4, model_channels=128,
        num_res_blocks=1, channel_mult=[1], attention_resolutions=[],
        num_groups=32, num_heads=None, num_head_channels=64,
        num_classes=None, has_null_class=False, dropout=0.0, use_fp16=True,
    )
    model = build_adm_unet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 4))
    tt = jnp.array([7], jnp.int32)

    monkeypatch.setenv("IVID_TPU_SPLIT_SKIP", "0")
    monkeypatch.setenv("IVID_TPU_FUSED_GNCONV", "0")
    params = model.init(jax.random.PRNGKey(1), x, tt)["params"]
    want = model.apply({"params": params}, x, tt)

    monkeypatch.setenv("IVID_TPU_SPLIT_SKIP", "1")
    monkeypatch.setenv("IVID_TPU_FUSED_GNCONV", "1")
    params_fused = model.init(jax.random.PRNGKey(1), x, tt)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_fused
    )
    got = model.apply({"params": params_fused}, x, tt)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05,
    )
