"""Packed-qkv attention kernel vs the einsum reference.

The packed Pallas kernel (ivid_tpu/ops/attention.py) must match the
reference einsum attention (the CPU/parity path, itself torch-parity-tested
via tests/test_adm.py) on the exact column packing the qkv Dense produces
(reference channel order: diffusion/backbones/adm.py:267-271)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ivid_tpu.ops import attention as attn


@pytest.mark.parametrize(
    "b,t,heads", [(2, 512, 2), (1, 1024, 4), (2, 1024, 8)]
)
def test_packed_kernel_matches_reference(b, t, heads, monkeypatch):
    # Pin the legacy panel-division path (production default is deferred;
    # legacy remains the IVID_TPU_ATTN_DEFER=0 fallback). MXU_SUM defaults
    # ON and requires deferred mode, so pin it off with it.
    monkeypatch.setenv("IVID_TPU_ATTN_DEFER", "0")
    monkeypatch.setenv("IVID_TPU_ATTN_MXU_SUM", "0")
    c = heads * attn.HEAD_DIM
    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * c)).astype(np.float32))
    scale = float(1.0 / np.sqrt(np.sqrt(attn.HEAD_DIM)))
    ref = attn.reference_attention(qkv, heads, scale)
    out = attn._packed_attention_fwd_kernel(qkv, heads, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_packed_kernel_bf16_close_to_f32_reference():
    b, t, heads = 2, 512, 2
    c = heads * attn.HEAD_DIM
    rng = np.random.default_rng(1)
    qkv32 = rng.standard_normal((b, t, 3 * c)).astype(np.float32)
    scale = float(1.0 / np.sqrt(np.sqrt(attn.HEAD_DIM)))
    ref = attn.reference_attention(jnp.asarray(qkv32), heads, scale)
    out = attn._packed_attention_fwd_kernel(
        jnp.asarray(qkv32, jnp.bfloat16), heads, scale, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


@pytest.mark.parametrize("b,t,heads", [(2, 512, 2), (1, 1024, 4)])
def test_deferred_division_matches_reference(b, t, heads, monkeypatch):
    # IVID_TPU_ATTN_DEFER=1 normalizes the [BQ,D] output instead of the
    # [BQ,T] panel; same math, equal-or-better f32 rounding. Pin MXU_SUM=0
    # (its default is ON) so the plain VPU-reduce deferred branch stays
    # covered; test_mxu_sum_matches_reference covers the ones-column path.
    monkeypatch.setenv("IVID_TPU_ATTN_DEFER", "1")
    monkeypatch.setenv("IVID_TPU_ATTN_MXU_SUM", "0")
    c = heads * attn.HEAD_DIM
    rng = np.random.default_rng(3)
    qkv32 = rng.standard_normal((b, t, 3 * c)).astype(np.float32)
    scale = float(1.0 / np.sqrt(np.sqrt(attn.HEAD_DIM)))
    ref = attn.reference_attention(jnp.asarray(qkv32), heads, scale)
    out = attn._packed_attention_fwd_kernel(
        jnp.asarray(qkv32), heads, scale, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
    out16 = attn._packed_attention_fwd_kernel(
        jnp.asarray(qkv32, jnp.bfloat16), heads, scale, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


@pytest.mark.parametrize("scale", [float(64 ** -0.25), 0.3])
def test_exp2_softmax_matches_reference(scale, monkeypatch):
    # IVID_TPU_ATTN_EXP2 folds scale^2*log2(e) into q and calls exp2 — the
    # softmax is invariant to the base switch; the fold adds one rounding on
    # q (exact here: f32 inputs in interpret mode round nowhere). Covers
    # both the pow2 reference scale and a non-pow2 scale (different fold
    # branches).
    monkeypatch.setenv("IVID_TPU_ATTN_EXP2", "1")
    b, t, heads = 1, 1024, 4
    c = heads * attn.HEAD_DIM
    rng = np.random.default_rng(5)
    qkv32 = rng.standard_normal((b, t, 3 * c)).astype(np.float32)
    ref = attn.reference_attention(jnp.asarray(qkv32), heads, scale)
    out = attn._packed_attention_fwd_kernel(
        jnp.asarray(qkv32), heads, scale, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
    out16 = attn._packed_attention_fwd_kernel(
        jnp.asarray(qkv32, jnp.bfloat16), heads, scale, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


def test_mxu_sum_matches_reference(monkeypatch):
    # IVID_TPU_ATTN_MXU_SUM: the softmax denominator comes out of the PV
    # matmul's spare lane (ones column appended to v) instead of a VPU
    # reduce — out = exact softmax of the (possibly bf16-rounded) weights.
    monkeypatch.setenv("IVID_TPU_ATTN_DEFER", "1")
    monkeypatch.setenv("IVID_TPU_ATTN_MXU_SUM", "1")
    b, t, heads = 1, 1024, 4
    c = heads * attn.HEAD_DIM
    rng = np.random.default_rng(6)
    qkv32 = rng.standard_normal((b, t, 3 * c)).astype(np.float32)
    scale = float(1.0 / np.sqrt(np.sqrt(attn.HEAD_DIM)))
    ref = attn.reference_attention(jnp.asarray(qkv32), heads, scale)
    out = attn._packed_attention_fwd_kernel(
        jnp.asarray(qkv32), heads, scale, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)
    out16 = attn._packed_attention_fwd_kernel(
        jnp.asarray(qkv32, jnp.bfloat16), heads, scale, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


@pytest.mark.parametrize("exp2", ["0", "1"])
def test_scale_fold_gate_non_pow2(exp2, monkeypatch):
    # A non-power-of-two scale must NOT be folded into bf16 q (inexact);
    # the kernel falls back to the panel multiply and stays correct. With
    # the default IVID_TPU_ATTN_EXP2=1 the exp2 fold branch preempts the
    # pow2 gate entirely, so exp2 must be pinned OFF to keep the fallback
    # panel-multiply branch covered (advisor round-4 finding); the "1" case
    # keeps the exp2 non-pow2 fold covered at this shape too.
    monkeypatch.setenv("IVID_TPU_ATTN_EXP2", exp2)
    b, t, heads = 1, 512, 2
    c = heads * attn.HEAD_DIM
    rng = np.random.default_rng(4)
    qkv = jnp.asarray(rng.standard_normal((b, t, 3 * c)).astype(np.float32))
    scale = 0.3  # scale2=0.09, frexp mantissa != 0.5
    ref = attn.reference_attention(qkv, heads, scale)
    out = attn._packed_attention_fwd_kernel(qkv, heads, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=2e-5)


def test_mxu_sum_without_defer_raises(monkeypatch):
    # Knob-consistency policy (mirrors the IVID_TPU_ATTN_BQ override): a
    # silently-ignored IVID_TPU_ATTN_MXU_SUM would let a sweep datapoint
    # measure a different implementation than requested.
    monkeypatch.setenv("IVID_TPU_ATTN_DEFER", "0")
    monkeypatch.setenv("IVID_TPU_ATTN_MXU_SUM", "1")
    qkv = jnp.zeros((1, 512, 3 * 2 * attn.HEAD_DIM))
    with pytest.raises(ValueError, match="MXU_SUM"):
        attn._packed_attention_fwd_kernel(qkv, 2, 0.5, interpret=True)


def test_supports_packed_gate():
    assert attn.supports_packed(1024, 8, 64)
    assert attn.supports_packed(4096, 4, 64)
    assert not attn.supports_packed(256, 8, 64)  # below flash threshold
    assert not attn.supports_packed(1024, 3, 64)  # odd head count
    assert not attn.supports_packed(1024, 8, 128)  # head width fixed at 64
    assert not attn.supports_packed(8192, 8, 64)  # logits panel too large


def test_flash_and_packed_share_packing_contract():
    # unpacked_flash_attention and the packed kernel must interpret the
    # [B,T,3C] column layout identically; compare their *reference-math*
    # equivalents head-by-head (flash itself needs a TPU; here we check the
    # packing arithmetic that both paths rely on).
    b, t, heads = 1, 512, 4
    c = heads * attn.HEAD_DIM
    rng = np.random.default_rng(2)
    qkv = rng.standard_normal((b, t, 3 * c)).astype(np.float32)
    # Column of head h, component q/k/v, channel d per the packing contract.
    for h in (0, heads - 1):
        base = h * 3 * attn.HEAD_DIM
        x = qkv.reshape(b, t, heads, 3 * attn.HEAD_DIM)
        np.testing.assert_array_equal(qkv[..., base + 7], x[..., h, 7])  # q
        np.testing.assert_array_equal(
            qkv[..., base + attn.HEAD_DIM + 7], x[..., h, attn.HEAD_DIM + 7]
        )  # k
