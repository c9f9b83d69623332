"""Packed-qkv multi-head attention as a Pallas TPU kernel.

The UNet's attention blocks (reference: diffusion/backbones/adm.py:225-286)
project tokens to one fused qkv tensor ``[B, T, 3C]`` whose columns are
head-major ``[h][q|k|v][D]`` groups (the reference's Conv1d channel order,
adm.py:267-271). The stock path unpacks it into three ``[B, H, T, D]``
tensors for ``jax.experimental.pallas...flash_attention`` — on a v5e that
unpacking costs more than the attention math itself: per seq-1024 block at
batch 32, profiled 835 us of layout copies (qkv relayout 135 us + head
transpose 198 us + slice/scale/transpose fusion 502 us) around a 942 us
kernel, ~4.2 ms/step across the flagship's five flash blocks.

This kernel reads q/k/v directly out of the packed projection and writes the
attention output back in token-major ``[B, T, C]`` layout, so the surrounding
Dense layers connect with ZERO layout copies:

- grid ``(B, H//2, T//BQ)``: each program owns one sample x one head PAIR.
  A head pair spans a 384-column stripe of the packed tensor (2 heads x
  [q|k|v] x 64), which is 128-lane aligned — single heads (192 columns)
  would misalign every other DMA.
- the whole ``[T, 384]`` stripe is one VMEM block, re-used across the
  q-block grid dimension (innermost), so k/v stream from HBM once per pair.
- k spans the full sequence per program, so the softmax is exact row softmax
  in f32 — no online-rescaling passes (T <= 4096 fits VMEM comfortably).
- numerics contract of the reference: logits scaled by ``1/sqrt(D)``
  (applied as scale^2 on the f32 logits; the stock path pre-scales q and k
  by 1/sqrt(sqrt(D)) in bf16 — equal within bf16 rounding), f32 softmax,
  bf16 probability matmul.

Only the forward runs through the kernel; the backward (training) falls back
to the unpacked flash-attention VJP via ``jax.vjp``, which is memory-safe at
every training shape.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEAD_DIM = 64  # the only head width the reference configs use (adm.py configs)
_GROUP = 3 * HEAD_DIM  # q|k|v stripe of one head
_PAIR = 2 * _GROUP  # 384: lane-aligned head-pair stripe


def _block_q(seq: int) -> int:
    """Largest q-block that keeps the f32 logits panel [BQ, T] in VMEM.
    ``IVID_TPU_ATTN_BQ`` overrides (sweep hook)."""
    import os

    override = os.environ.get("IVID_TPU_ATTN_BQ")
    if override:
        bq = min(int(override), seq)
        if seq % bq:
            # A silent fallback here would make a sweep datapoint measure a
            # DIFFERENT implementation (supports_packed would reject the
            # shape and the auto gate would pick flash/einsum).
            raise ValueError(
                f"IVID_TPU_ATTN_BQ={override} does not divide seq={seq}"
            )
        return bq
    if seq <= 1024:
        return seq  # single q-block; the f32 logits panel is <= 4 MB
    # Swept on the SR model (T=4096): BQ=256 beats 128 (fewer grid programs
    # amortize the VPU softmax passes) and 512's logits panel overruns VMEM.
    return 256


def supports_packed(
    seq: int, heads: int, head_dim: int, strict: bool = False
) -> bool:
    """Shape gate for the packed kernel. With ``strict=False`` (the auto
    selection path) a non-dividing ``IVID_TPU_ATTN_BQ`` override simply means
    "unsupported here" and another impl is chosen; with ``strict=True`` (an
    explicit ``IVID_TPU_ATTN=packed`` request, i.e. a sweep datapoint) it
    raises, so a sweep never silently measures a different implementation."""
    try:
        bq = _block_q(seq)
    except ValueError:
        if strict:
            raise
        return False
    return (
        head_dim == HEAD_DIM
        and heads % 2 == 0
        and seq >= 512
        and seq % bq == 0
        and seq <= 4096
        # The flash-VJP backward's block sizes (bq=min(512,t), bk=min(1024,t))
        # must divide t, or training crashes at backward trace time.
        and seq % 512 == 0
        and (seq <= 1024 or seq % 1024 == 0)
    )


def supports_flash(seq: int, heads: int, head_dim: int) -> bool:
    """Shape gate for the stock pallas flash kernel (TPU-only): its block
    sizes (bq=min(512,t), bk=min(1024,t)) must divide t, and the kernel is
    tiled for power-of-two head widths."""
    del heads
    return (
        head_dim in (64, 128, 256)
        and (seq < 512 or seq % 512 == 0)
        and (seq < 1024 or seq % 1024 == 0)
    )


def _defer_div() -> bool:
    """Softmax-division placement knob (``IVID_TPU_ATTN_DEFER``).

    Deferred mode normalizes the [BQ, D] attention output by the row sums
    instead of dividing the full [BQ, T] probability panel — at SR's T=4096
    the divide is a whole-panel VPU pass (~2-3 ms/site/step) while the
    deferred multiply touches T/D = 64x fewer elements. Numerics: e<=1 rides
    to the PV matmul in bf16 exactly like w<=1 did; the division happens once
    in f32 on the accumulated output (equal-or-better rounding). Default ON
    from the round-4 model-step A/B (the only admissible evidence per the
    BASELINE.md methodology lesson): SR guided CFG step 299.20 -> 289.21 ms
    (MFU 66.9 -> 69.2%), flagship uncond CFG step 115.40 -> 114.64 ms (MFU
    93.8 -> 94.5%), both at equal-or-higher dispatch floors."""
    return os.environ.get("IVID_TPU_ATTN_DEFER", "1") == "1"


_LOG2E = math.log2(math.e)


def _exp2_softmax() -> bool:
    """Base-2 softmax knob (``IVID_TPU_ATTN_EXP2``).

    ``exp(x)`` lowers as ``exp2(x * log2(e))`` — a whole extra [BQ, T] f32
    VPU multiply pass per logits panel. Folding ``scale^2 * log2(e)`` into
    the bf16 q block instead (a [BQ, 64] multiply, T/64x fewer elements)
    and calling ``exp2`` directly skips that pass. Numerics: the fold is no
    longer a pure exponent shift, so q picks up one bf16 rounding (~2^-9
    relative on the logits — same order as the bf16 q/k rounding already
    present; flash kernels apply fp32 sm_scale to bf16 q the same way).
    Softmax normalization makes the result invariant to the base switch
    itself. Default ON from the round-4 model-step A/B: SR guided CFG step
    289.33 -> 281.76 ms (MFU 69.1 -> 71.0%, T=4096 panels), flagship uncond
    CFG step within noise (114.82 vs 114.64-115.04 ms; its seq-1024
    attention is only ~4 ms/step)."""
    return os.environ.get("IVID_TPU_ATTN_EXP2", "1") == "1"


def _mxu_sum() -> bool:
    """Softmax-denominator placement knob (``IVID_TPU_ATTN_MXU_SUM``).

    In deferred mode the row sums still cost a full [BQ, T] f32 VPU reduce.
    The PV matmul's N=64 output only fills half the MXU's 128 lanes — so a
    ones column appended to v makes the matmul emit the row sums in lane 64
    for free, and the reduce pass disappears. Numerics: the sums accumulate
    the SAME bf16-rounded e terms the PV numerator uses (f32 accumulation),
    so out = exact softmax of the bf16-rounded weights — consistent
    numerator/denominator, vs the slightly-mixed f32-sum/bf16-PV it replaces.
    Default ON from the round-5 model-step A/B (the only admissible evidence
    per the BASELINE.md methodology lesson): SR guided CFG step 281.34 ->
    278.84 ms (MFU 71.1 -> 71.7%), flagship uncond CFG step 114.67 -> 114.34
    ms (MFU 94.4 -> 94.7%) — a win at both T=4096 and T=1024."""
    return os.environ.get("IVID_TPU_ATTN_MXU_SUM", "1") == "1"


def _attn_kernel(
    qkv_ref, out_ref, *, block_q: int, scale2: float, defer: bool, exp2: bool,
    mxu_sum: bool,
):
    tq = pl.program_id(2)
    # Fold the logit scale into q when it is a power of two (always true for
    # the reference's D=64: 1/sqrt(D) = 2^-3): bf16 exponent shift is exact
    # and f32 accumulation commutes with powers of two, so the logits are
    # bit-identical to the post-matmul panel multiply this replaces — at
    # 64/T of the cost. In exp2 mode the fold also carries log2(e) (see
    # _exp2_softmax) and is applied for any positive scale.
    fold = math.frexp(scale2)[0] == 0.5 if scale2 > 0 else False
    for h in range(2):
        off = h * _GROUP
        q = qkv_ref[0, pl.ds(tq * block_q, block_q), off : off + HEAD_DIM]
        k = qkv_ref[0, :, off + HEAD_DIM : off + 2 * HEAD_DIM]
        v = qkv_ref[0, :, off + 2 * HEAD_DIM : off + 3 * HEAD_DIM]
        if exp2 and scale2 > 0:
            q = q * (scale2 * _LOG2E)
        elif fold:
            q = q * scale2
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if not (fold or (exp2 and scale2 > 0)):
            s = s * (scale2 * _LOG2E) if exp2 else s * scale2
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp2(s - m) if exp2 else jnp.exp(s - m)
        if defer and mxu_sum:
            vx = jnp.concatenate(
                [v, jnp.ones((v.shape[0], 1), v.dtype)], axis=1
            )
            o_ext = jax.lax.dot_general(
                e.astype(v.dtype), vx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o = o_ext[:, :HEAD_DIM] / o_ext[:, HEAD_DIM : HEAD_DIM + 1]
        elif defer:
            o = jax.lax.dot_general(
                e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o = o / jnp.sum(e, axis=-1, keepdims=True)
        else:
            w = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                w.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        out_ref[0, :, h * HEAD_DIM : (h + 1) * HEAD_DIM] = o.astype(out_ref.dtype)


def _packed_attention_fwd_kernel(
    qkv: jax.Array, heads: int, scale: float, interpret: bool = False
) -> jax.Array:
    b, t, c3 = qkv.shape
    c = c3 // 3
    assert c == heads * HEAD_DIM and heads % 2 == 0
    pairs = heads // 2
    bq = _block_q(t)
    if _mxu_sum() and not _defer_div():
        # Mirror the IVID_TPU_ATTN_BQ override policy: a silently-ignored
        # knob would make a sweep datapoint measure a DIFFERENT
        # implementation than requested.
        raise ValueError(
            "IVID_TPU_ATTN_MXU_SUM=1 requires IVID_TPU_ATTN_DEFER=1 "
            "(the ones-column row sum only replaces the deferred-mode reduce)"
        )
    kernel = functools.partial(
        _attn_kernel, block_q=bq, scale2=float(scale) * float(scale),
        defer=_defer_div(), exp2=_exp2_softmax(), mxu_sum=_mxu_sum(),
    )
    itemsize = jnp.dtype(qkv.dtype).itemsize
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, t, c), qkv.dtype),
        grid=(b, pairs, t // bq),
        in_specs=[
            pl.BlockSpec((1, t, _PAIR), lambda b_, p, tq: (b_, 0, p)),
        ],
        out_specs=pl.BlockSpec((1, bq, 2 * HEAD_DIM), lambda b_, p, tq: (b_, tq, p)),
        interpret=interpret,
        # Declare the real cost so XLA's cost model (and the MFU / baseline
        # arithmetic built on it, bench.py) counts attention like the
        # einsum/flash paths do: QK + PV = 4*B*H*T^2*D MACs-as-2flops.
        cost_estimate=pl.CostEstimate(
            flops=4 * b * heads * t * t * HEAD_DIM,
            bytes_accessed=(b * t * 3 * c + b * t * c) * itemsize,
            transcendentals=b * heads * t * t,
        ),
    )(qkv)


def unpacked_flash_attention(qkv: jax.Array, heads: int, scale: float) -> jax.Array:
    """The stock path: unpack to [B,H,T,D] and call the pallas flash kernel.

    Kept as the backward implementation (flash's VJP is memory-safe at
    training shapes) and as an A/B fallback (IVID_TPU_ATTN=flash)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, flash_attention,
    )

    b, t, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    x = qkv.reshape(b, t, heads, 3 * d)
    q, k, v = jnp.split(x, 3, axis=-1)
    bq, bk = min(512, t), min(1024, t)
    bs = BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )
    out = flash_attention(
        (q * scale).transpose(0, 2, 1, 3),
        (k * scale).transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3),
        causal=False, sm_scale=1.0, block_sizes=bs,
    )
    return out.transpose(0, 2, 1, 3).reshape(b, t, c)


def reference_attention(qkv: jax.Array, heads: int, scale: float) -> jax.Array:
    """Pure-jnp packed attention (fp32 softmax) — the CPU/parity reference."""
    b, t, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    x = qkv.reshape(b, t, heads, 3 * d)
    q, k, v = jnp.split(x, 3, axis=-1)
    logits = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale)
    w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(logits.dtype)
    return jnp.einsum("bhts,bshd->bthd", w, v).reshape(b, t, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def packed_attention(qkv: jax.Array, heads: int, scale: float) -> jax.Array:
    """Fused multi-head attention over a packed ``[B, T, 3C]`` qkv tensor."""
    return _packed_attention_fwd_kernel(qkv, heads, scale)


def _packed_fwd(qkv, heads, scale):
    return _packed_attention_fwd_kernel(qkv, heads, scale), qkv


def _packed_bwd(heads, scale, qkv, g):
    # Flash-VJP fallback: pays an extra flash forward to rebuild residuals,
    # but measured FASTER than a direct einsum backward (243.8 vs ~228 ms
    # uncond train step) — the einsum VJP's materialized [B,H,T,T] f32
    # panels lose to flash's VMEM-resident recompute. Memory-safe at every
    # training shape (SR T=4096 panels would be 7 GB).
    _, pull = jax.vjp(lambda z: unpacked_flash_attention(z, heads, scale), qkv)
    return (pull(g)[0],)


packed_attention.defvjp(_packed_fwd, _packed_bwd)
