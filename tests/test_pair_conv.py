"""Fused 1x1 skip-pair kernel (ops/pair_conv.py) vs the unfused conv-pair
form it replaces (models/adm.py SplitConv; reference semantics:
/root/reference/diffusion/backbones/adm.py:219-222 skip_connection 1x1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivid_tpu.ops import pair_conv


def _mk(n=6, h=8, w=8, c1=128, c2=128, o=128, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (n, h, w, c1), dtype)
    s = jax.random.normal(ks[1], (n, h, w, c2), dtype)
    hh = jax.random.normal(ks[2], (n, h, w, o), dtype)
    kx = jax.random.normal(ks[3], (c1, o), jnp.float32) * 0.05
    kk = jax.random.normal(ks[4], (c2, o), jnp.float32) * 0.05
    b = jax.random.normal(ks[5], (o,), jnp.float32)
    return x, s, hh, kx, kk, b


@pytest.mark.parametrize("with_h", [False, True])
def test_pair_conv_matches_xla_form(with_h):
    x, s, h, kx, ks, b = _mk()
    h = h if with_h else None
    got = pair_conv.pair_conv1x1(x, s, h, kx, ks, b, jnp.float32, True)
    want = pair_conv._pair_conv_xla(x, s, h, kx, ks, b, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_pair_conv_bf16_accumulates_f32():
    # The kernel accumulates in f32; compare against an f32 reference of the
    # bf16-rounded inputs with bf16-level tolerance.
    x, s, h, kx, ks, b = _mk(dtype=jnp.bfloat16)
    got = pair_conv.pair_conv1x1(x, s, h, kx, ks, b, jnp.bfloat16, True)
    assert got.dtype == jnp.bfloat16
    want = pair_conv._pair_conv_xla(
        x.astype(jnp.float32), s.astype(jnp.float32), h.astype(jnp.float32),
        kx, ks, b, jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=0.15, rtol=0.05
    )


def test_pair_conv_odd_batch_row_tail():
    # N=5 (non-multiple-of-8 sublanes) and a row count whose block is the
    # whole array: exercises the masked tail handling.
    x, s, h, kx, ks, b = _mk(n=5, h=4, w=8, c1=128, c2=128, o=128)
    got = pair_conv.pair_conv1x1(x, s, h, kx, ks, b, jnp.float32, True)
    want = pair_conv._pair_conv_xla(x, s, h, kx, ks, b, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


@pytest.mark.parametrize("with_h", [False, True])
def test_pair_conv_grads_match_xla_form(with_h):
    x, s, h, kx, ks, b = _mk(n=4, h=4, w=4)
    h = h if with_h else None

    def loss_fused(args):
        x_, s_, h_, kx_, ks_, b_ = args
        out = pair_conv.pair_conv1x1(x_, s_, h_, kx_, ks_, b_, jnp.float32, True)
        return jnp.sum(out * out)

    def loss_ref(args):
        x_, s_, h_, kx_, ks_, b_ = args
        out = pair_conv._pair_conv_xla(x_, s_, h_, kx_, ks_, b_, jnp.float32)
        return jnp.sum(out * out)

    args = (x, s, h, kx, ks, b)
    g_fused = jax.grad(loss_fused)(args)
    g_ref = jax.grad(loss_ref)(args)
    for a, b_ in zip(jax.tree.leaves(g_fused), jax.tree.leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-2, rtol=1e-4)


def test_split_conv_pair_path_matches_default(monkeypatch):
    """SplitConv with IVID_TPU_PAIR_SKIP=1 (interpret pallas off-TPU) equals
    the production conv-pair path, including the folded residual add."""
    from ivid_tpu.models.adm import SplitConv

    x, s, h, *_ = _mk(n=4, h=8, w=8, c1=128, c2=128, o=128)
    mod = SplitConv(128, 256, kernel=1, dtype=jnp.float32)
    params = mod.init(jax.random.PRNGKey(1), (x, s))

    monkeypatch.setenv("IVID_TPU_PAIR_SKIP", "0")
    want = mod.apply(params, (x, s), add=h)
    monkeypatch.setenv("IVID_TPU_PAIR_SKIP", "1")
    got = mod.apply(params, (x, s), add=h)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-5
    )
