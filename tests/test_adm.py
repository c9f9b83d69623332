"""Shape, invariance, and torch-parity tests for the ADM UNet backbone."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ivid_tpu.models import AdmUnet2d, build_adm_unet
from ivid_tpu.models.torch_compat import pad_input_channels, torch_state_dict_to_flax

from ref_loader import HAVE_REFERENCE, import_reference

SMALL = dict(
    image_size=32,
    in_channels=4,
    model_channels=32,
    out_channels=4,
    num_res_blocks=2,
    channel_mult=(1, 2),
    attention_resolutions=(16,),
    num_groups=8,
    num_heads=None,
    num_head_channels=16,
    num_classes=None,
    has_null_class=False,
    dropout=0.0,
    use_fp16=False,
)


def _init(cfg, seed=0):
    model = build_adm_unet(cfg)
    x = jnp.zeros((2, cfg["image_size"], cfg["image_size"], cfg["in_channels"]))
    t = jnp.zeros((2,), jnp.int32)
    classes = jnp.zeros((2,), jnp.int32) if cfg["num_classes"] else None
    params = model.init(jax.random.PRNGKey(seed), x, t, classes)["params"]
    return model, params


@pytest.mark.parametrize(
    "overrides",
    [
        {},
        {"num_classes": 10, "has_null_class": True},
        {"in_channels": 10},
        {"image_size": 64, "attention_resolutions": (32, 16)},
    ],
)
def test_forward_shapes(overrides):
    cfg = dict(SMALL, **overrides)
    model, params = _init(cfg)
    b = 2
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(b, cfg["image_size"], cfg["image_size"], cfg["in_channels"])),
        jnp.float32,
    )
    t = jnp.array([0, 999], jnp.int32)
    classes = jnp.array([1, -1], jnp.int32) if cfg["num_classes"] else None
    out = model.apply({"params": params}, x, t, classes)
    assert out.shape == (b, cfg["image_size"], cfg["image_size"], cfg["out_channels"])
    assert jnp.isfinite(out).all()


def test_zero_init_output():
    """Output conv and attention proj are zero-initialized: a fresh model is the
    identity-to-zero map (reference: adm.py zero_module usage, backbones/utils.py:27-33)."""
    model, params = _init(SMALL)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 4)), jnp.float32)
    out = model.apply({"params": params}, x, jnp.array([5], jnp.int32))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_null_class_equals_none():
    """All-null class vector must equal passing classes=None (reference: adm.py:547-555)."""
    cfg = dict(SMALL, num_classes=10, has_null_class=True)
    model, params = _init(cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 4)), jnp.float32)
    t = jnp.array([3, 7], jnp.int32)
    out_none = model.apply({"params": params}, x, t, None)
    out_null = model.apply({"params": params}, x, t, jnp.array([-1, -1]))
    np.testing.assert_allclose(np.asarray(out_none), np.asarray(out_null), atol=1e-6)


def test_pad_input_channels():
    cfg4 = dict(SMALL)
    cfg10 = dict(SMALL, in_channels=10)
    model4, params4 = _init(cfg4)
    model10, params10 = _init(cfg10)
    padded = pad_input_channels(params4, 10)
    assert padded["in_conv"]["kernel"].shape == params10["in_conv"]["kernel"].shape
    # Padded model on an input whose extra channels are arbitrary must match the
    # original model on the first 4 channels (zeros contribute nothing).
    x10 = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32, 32, 10)), jnp.float32)
    t = jnp.array([11], jnp.int32)
    params_mix = dict(params10)
    params_mix.update(padded)
    # Use params4 for everything except in_conv (architectures differ only there).
    full = jax.tree.map(lambda x: x, params4)
    full["in_conv"] = padded["in_conv"]
    out_pad = model10.apply({"params": full}, x10, t)
    out_ref = model4.apply({"params": params4}, x10[..., :4], t)
    np.testing.assert_allclose(np.asarray(out_pad), np.asarray(out_ref), atol=1e-6)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference checkout not available")
@pytest.mark.parametrize(
    "overrides",
    [
        {},
        {"num_classes": 10, "has_null_class": True},
        {
            "image_size": 16,
            "channel_mult": (1, 1, 2),
            "attention_resolutions": (8, 4),
            "num_head_channels": -1,
            "num_heads": 2,
        },
    ],
)
def test_torch_parity(overrides):
    """Numeric parity with the reference torch model under converted weights."""
    import torch

    ref = import_reference()
    cfg = dict(SMALL, **overrides)

    torch.manual_seed(0)
    tm = ref.backbones.AdmUnet2d(
        image_size=cfg["image_size"],
        in_channels=cfg["in_channels"],
        model_channels=cfg["model_channels"],
        out_channels=cfg["out_channels"],
        num_res_blocks=cfg["num_res_blocks"],
        attention_resolutions=cfg["attention_resolutions"],
        dropout=0.0,
        channel_mult=cfg["channel_mult"],
        num_classes=cfg["num_classes"],
        has_null_class=cfg["has_null_class"],
        use_fp16=False,
        num_groups=cfg["num_groups"],
        num_heads=cfg["num_heads"] or 1,
        num_head_channels=cfg["num_head_channels"],
    )
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items() if "freqs" not in k}

    model = build_adm_unet(cfg)
    params = torch_state_dict_to_flax(sd, **{
        k: cfg[k] for k in [
            "image_size", "model_channels", "num_res_blocks", "channel_mult",
            "attention_resolutions", "num_classes",
        ]
    })

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, cfg["image_size"], cfg["image_size"], cfg["in_channels"])).astype(np.float32)
    t = np.array([17, 903])
    classes = np.array([3, -1]) if cfg["num_classes"] else None

    with torch.no_grad():
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        tout = tm(
            tx,
            torch.from_numpy(t).long(),
            torch.from_numpy(classes).long() if classes is not None else None,
        ).numpy()
    tout = np.transpose(tout, (0, 2, 3, 1))

    jout = model.apply(
        {"params": params},
        jnp.asarray(x),
        jnp.asarray(t, jnp.int32),
        jnp.asarray(classes, jnp.int32) if classes is not None else None,
    )
    np.testing.assert_allclose(np.asarray(jout), tout, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference checkout not available")
def test_param_count_matches_reference():
    import torch

    ref = import_reference()
    cfg = dict(SMALL, num_classes=10, has_null_class=True)
    tm = ref.backbones.AdmUnet2d(
        image_size=cfg["image_size"],
        in_channels=cfg["in_channels"],
        model_channels=cfg["model_channels"],
        out_channels=cfg["out_channels"],
        num_res_blocks=cfg["num_res_blocks"],
        attention_resolutions=cfg["attention_resolutions"],
        channel_mult=cfg["channel_mult"],
        num_classes=cfg["num_classes"],
        has_null_class=cfg["has_null_class"],
        num_groups=cfg["num_groups"],
        num_heads=1,
        num_head_channels=cfg["num_head_channels"],
    )
    n_torch = sum(p.numel() for p in tm.parameters())
    model, params = _init(cfg)
    n_flax = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert n_flax == n_torch


def test_split_skip_matches_concat(monkeypatch):
    """The decoder's split-skip path (no materialized concatenation) must
    match the concat path numerically with an identical parameter tree."""
    cfg = dict(
        image_size=32, in_channels=4, out_channels=4, model_channels=32,
        num_res_blocks=1, channel_mult=[1, 2], attention_resolutions=[16],
        num_groups=8, num_heads=None, num_head_channels=16,
        num_classes=None, has_null_class=False, dropout=0.0, use_fp16=False,
    )
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 4))
    t = jnp.array([10, 500], jnp.int32)

    monkeypatch.setenv("IVID_TPU_SPLIT_SKIP", "0")
    model = build_adm_unet(cfg)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    # Randomize zero-init kernels so skip/out conv outputs are non-trivial.
    leaves, treedef = jax.tree.flatten(params)
    leaves = [
        0.05 * jax.random.normal(jax.random.fold_in(jax.random.PRNGKey(9), i),
                                 l.shape, l.dtype)
        if (np.abs(np.asarray(l)).sum() == 0 and l.ndim >= 2) else l
        for i, l in enumerate(leaves)
    ]
    params = jax.tree.unflatten(treedef, leaves)
    out_concat = np.asarray(model.apply({"params": params}, x, t))

    monkeypatch.setenv("IVID_TPU_SPLIT_SKIP", "1")
    model2 = build_adm_unet(cfg)
    shapes = jax.eval_shape(lambda: model2.init(jax.random.PRNGKey(0), x, t)["params"])
    assert jax.tree.structure(shapes) == jax.tree.structure(params)
    out_split = np.asarray(model2.apply({"params": params}, x, t))
    np.testing.assert_allclose(out_concat, out_split, atol=2e-5)


def test_head_conv_matches_nn_conv():
    """_HeadConv (sublane-padded output head) must be numerically identical
    to a plain nn.Conv with the same parameters."""
    import flax.linen as nn

    from ivid_tpu.models.adm import _HeadConv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 4)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((4,)).astype(np.float32))
    out = _HeadConv(4).apply({"params": {"kernel": k, "bias": b}}, x)
    ref = nn.Conv(4, (3, 3), padding="SAME", dtype=jnp.float32,
                  param_dtype=jnp.float32).apply(
        {"params": {"kernel": k, "bias": b}}, x
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_head_bf16_stream_close_to_f32(monkeypatch):
    """IVID_TPU_HEAD_BF16 keeps the output head's activation stream in the
    torso dtype (GN statistics stay f32 per GroupNorm32) — close to, not
    identical to, the f32-head path (one bf16 rounding on the GN/silu
    output and the head-conv operands)."""
    model = build_adm_unet(dict(SMALL, use_fp16=True))
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 4)).astype(np.float32))
    t = jnp.array([3, 70], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    # Non-zero head params (zero-init out conv would make the test vacuous).
    params = jax.tree.map(
        lambda p: p + 0.01 * np.float32(1.0), params
    )
    ref = model.apply({"params": params}, x, t)
    monkeypatch.setenv("IVID_TPU_HEAD_BF16", "1")
    out = model.apply({"params": params}, x, t)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=0.05, rtol=0.05
    )


def test_head_bf16_train_grad(monkeypatch):
    """Regression: a bf16-torso TRAIN step must differentiate through the
    output head. ``preferred_element_type=f32`` on bf16 conv operands is not
    transposable (JAX's conv transpose rule feeds the f32 cotangent into a
    conv against the bf16 input and raises a dtype mismatch) — the round-4
    IVID_TPU_HEAD_BF16=1 default was A/B'd on the sampling step only and
    silently broke every bf16 training step until the _conv_f32out custom
    VJP. Gates: grad computes, is finite, and the head kernel grad is f32
    and non-zero."""
    monkeypatch.setenv("IVID_TPU_HEAD_BF16", "1")
    model = build_adm_unet(dict(SMALL, use_fp16=True))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 4)).astype(np.float32))
    t = jnp.array([3, 70], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    target = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))

    def loss_fn(p):
        out = model.apply({"params": p}, x, t)
        return jnp.mean((out - target) ** 2)

    grads = jax.grad(loss_fn)(params)
    head_g = grads["out_conv"]["kernel"]
    assert head_g.dtype == jnp.float32
    assert np.isfinite(np.asarray(head_g)).all()
    assert float(jnp.abs(head_g).max()) > 0.0
    leaves = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)


@pytest.mark.slow  # second full model grad (~1 min); numeric tier of the gate above
def test_head_bf16_train_grad_close_to_f32_head(monkeypatch):
    """The bf16-head custom-VJP gradients must agree with the f32-head
    path to bf16 rounding: same math, one narrower activation stream."""
    model = build_adm_unet(dict(SMALL, use_fp16=True))
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 4)).astype(np.float32))
    t = jnp.array([5, 50], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    # Non-zero head so the head kernel grad path is exercised non-trivially.
    params = jax.tree.map(lambda p: p + 0.01 * np.float32(1.0), params)
    target = jnp.asarray(rng.standard_normal(x.shape).astype(np.float32))

    def loss_fn(p):
        out = model.apply({"params": p}, x, t)
        return jnp.mean((out - target) ** 2)

    monkeypatch.setenv("IVID_TPU_HEAD_BF16", "0")
    g_ref = jax.grad(loss_fn)(params)
    monkeypatch.setenv("IVID_TPU_HEAD_BF16", "1")
    g_bf16 = jax.grad(loss_fn)(params)
    ref_l, tree = jax.tree_util.tree_flatten(g_ref)
    new_l = jax.tree_util.tree_flatten(g_bf16)[0]
    for a, b in zip(ref_l, new_l):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(1e-3, float(np.abs(a).max()))
        # bf16 rounding through the narrower head stream propagates into
        # every torso grad; 12% of leaf scale bounds it with headroom
        # (observed max 6.1%) while still failing on any structural error
        # (a dropped term or wrong cotangent dtype shifts entire leaves).
        np.testing.assert_allclose(b / scale, a / scale, atol=0.12)


def test_upsample_fused_residual_add_matches_old_formulation():
    """ResBlock up path: up(x)+h as a 2x2 phase broadcast-add (and the skip
    1x1 conv moved before the upsample) must equal the materialized
    upsample-then-add for both identity and channel-changing skips."""
    from ivid_tpu.models.adm import ResBlock, upsample_nearest_2x

    for cin, cout in [(8, 8), (8, 16)]:
        rb = ResBlock(cout, num_groups=4, up=True, dtype=jnp.float32)
        rng = np.random.default_rng(cin)
        x = jnp.asarray(rng.standard_normal((2, 8, 8, cin)).astype(np.float32))
        emb = jnp.asarray(rng.standard_normal((2, 32)).astype(np.float32))
        v = rb.init(jax.random.PRNGKey(0), x, emb)
        out = rb.apply(v, x, emb)
        # Old formulation: upsample first, then residual-project and add.
        # Reconstruct h from the module's own output: out - residual.
        p = v["params"]
        xu = upsample_nearest_2x(x)
        if cin != cout:
            xu = jax.lax.conv_general_dilated(
                xu, p["skip_conv"]["kernel"], (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + p["skip_conv"]["bias"]
        # h path is independent of the residual formulation: with zero-init
        # out_conv, h == out_conv bias == 0, so out must equal xu exactly.
        np.testing.assert_allclose(np.asarray(out), np.asarray(xu), atol=1e-6)


def test_up_add_4d_matches_phase_view(monkeypatch):
    """The 4-D up-block residual (IVID_TPU_UP_ADD=4d) is the same math as
    the phase-view add — bit-identical outputs."""
    from ivid_tpu.models.adm import ResBlock

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32))
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
    mod = ResBlock(out_channels=32, num_groups=8, up=True, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(2), x, emb, deterministic=True)

    monkeypatch.setenv("IVID_TPU_UP_ADD", "phase")
    want = mod.apply(params, x, emb, deterministic=True)
    monkeypatch.setenv("IVID_TPU_UP_ADD", "4d")
    got = mod.apply(params, x, emb, deterministic=True)
    assert got.shape == (2, 16, 16, 32)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
