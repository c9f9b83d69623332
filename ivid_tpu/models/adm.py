"""ADM-style UNet diffusion backbone, TPU-native (NHWC, bf16 torso, fp32 norms).

Functional re-design of the reference backbone
(reference: diffusion/backbones/adm.py:289-566). Differences from the reference are
deliberate TPU choices, not omissions:

- NHWC data layout throughout (XLA:TPU's native conv layout; torch uses NCHW).
- Mixed precision via a ``dtype`` attribute: convolutions and attention matmuls run
  in ``dtype`` (bf16 by default), GroupNorm and attention softmax in float32
  (mirrors GroupNorm32 and the fp32 softmax, adm.py:36-41,251), and parameters are
  float32. No loss-scaling machinery is needed on TPU.
- Attention is a single batched einsum over ``[B, T, H, D]`` instead of the
  reference's fold-heads-into-batch Conv1d formulation (adm.py:225-286); the math is
  identical (scale ``1/sqrt(sqrt(D))`` applied to both q and k).
- The class-conditioning contract is identical: labels ``>= 0`` select an embedding,
  ``-1`` is the null class (zero embedding) when ``has_null_class``, and ``None``
  (all-null) contributes zeros (adm.py:547-555).
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = jnp.dtype


def timestep_embedding(t: jax.Array, dim: int, max_freq: float = 10000.0) -> jax.Array:
    """Sinusoidal embedding: ``[cos(t f_i), sin(t f_i)]`` with
    ``f_i = max_freq^{-i/(dim/2)}`` (reference: diffusion/backbones/adm.py:11-33)."""
    assert dim % 2 == 0, "dim must be even"
    half = dim // 2
    freqs = jnp.exp(
        -np.log(max_freq) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


class GroupNorm32(nn.Module):
    """GroupNorm computed in float32 regardless of activation dtype
    (reference: diffusion/backbones/adm.py:36-41)."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        x = nn.GroupNorm(
            num_groups=self.num_groups, epsilon=1e-5, dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return x.astype(orig_dtype)


class _GNCore(nn.Module):
    """GroupNorm statistics/affine over a logically-concatenated channel axis,
    applied per part so the concatenation never materializes. Param names and
    shapes match ``nn.GroupNorm`` (scale/bias over the full channel count)."""

    num_groups: int
    num_channels: int

    @nn.compact
    def __call__(self, parts):
        scale = self.param("scale", nn.initializers.ones, (self.num_channels,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.num_channels,), jnp.float32)
        g = self.num_groups
        # Per-channel sums (f32) then channel→group aggregation: exact GN
        # statistics even when a group's channels straddle the part boundary.
        sums, sqs, n_spatial = [], [], None
        for p in parts:
            f = p.astype(jnp.float32)
            b = f.shape[0]
            flat = f.reshape(b, -1, f.shape[-1])
            n_spatial = flat.shape[1]
            sums.append(jnp.sum(flat, axis=1))
            sqs.append(jnp.sum(flat * flat, axis=1))
        s = jnp.concatenate(sums, -1)  # [B, C]
        q = jnp.concatenate(sqs, -1)
        cpg = self.num_channels // g
        sg = s.reshape(-1, g, cpg).sum(-1)  # [B, G]
        qg = q.reshape(-1, g, cpg).sum(-1)
        n = n_spatial * cpg
        mu = sg / n
        var = jnp.maximum(qg / n - mu * mu, 0.0)
        inv = jax.lax.rsqrt(var + 1e-5)

        out, lo = [], 0
        for p in parts:
            c = p.shape[-1]
            idx = (jnp.arange(lo, lo + c) // cpg).astype(jnp.int32)
            mu_c = jnp.take(mu, idx, axis=1)[:, None, None, :]
            inv_c = jnp.take(inv, idx, axis=1)[:, None, None, :]
            y = (p.astype(jnp.float32) - mu_c) * inv_c
            y = y * scale[lo : lo + c] + bias[lo : lo + c]
            out.append(y.astype(p.dtype))
            lo += c
        return tuple(out)


class SplitGroupNorm32(nn.Module):
    """fp32 GroupNorm over a tuple of parts forming one logical channel axis;
    parameter tree identical to :class:`GroupNorm32` (``GroupNorm_0/{scale,bias}``)."""

    num_groups: int
    num_channels: int

    @nn.compact
    def __call__(self, parts):
        return _GNCore(
            self.num_groups, self.num_channels, name="GroupNorm_0"
        )(parts)


class SplitConv(nn.Module):
    """Conv over a tuple of parts forming one logical input-channel axis:
    ``conv(concat(parts)) == Σ conv(part_i, kernel_slice_i)`` — the
    concatenation (and XLA's layout copies around it) never materializes.
    Param tree matches ``nn.Conv`` (``kernel``/``bias``)."""

    features: int
    in_channels: int
    kernel: int = 3
    zero_init: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, parts, add=None):
        k = self.kernel
        kern = self.param(
            "kernel",
            nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal(),
            (k, k, self.in_channels, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        # Note (profiled, round 5): a SECOND fused-pair attempt — a Pallas
        # kernel on the [H*W, N, C] bitcast view of the {3,0,2,1} layout,
        # avoiding round 2's relayout copies — ALSO lost its model-step A/B
        # on both models (flagship 123.9 vs 114.4 ms, SR 324.3 vs 278.8; the
        # retired ops/pair_conv.py, commit f6938cf). The transposes did
        # lower to bitcasts and the kernel streamed 720 GB/s on the
        # flagship, but the custom-call boundary unfused the NEXT block's
        # GroupNorm f32 upcast (+3.3 ms of standalone converts), made XLA
        # duplicate the encoder down-path adds into the kernel's layout
        # (+2.5 ms), and Mosaic ran the C=128 SR shape at only 456 GB/s.
        # The conv pair below keeps every producer/consumer fusion intact —
        # do NOT redo without an answer for the fusion-boundary glue.
        # Note (profiled, round 2): replacing the k=1 pair with a fused
        # dual-matmul Pallas kernel REGRESSED both models (115.4->126.8 ms
        # flagship, 300->331 ms SR): the flatten to [B*H*W, C] fights the
        # {3,0,2,1} activation layouts XLA picks around the scan carry, and
        # the forced relayout copies cost more than the two-fusion form's
        # materialized intermediate. The conv pair below is layout-native.
        out, lo = None, 0
        for p in parts:
            c = p.shape[-1]
            y = jax.lax.conv_general_dilated(
                p.astype(self.dtype),
                kern[:, :, lo : lo + c, :].astype(self.dtype),
                (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            out = y if out is None else out + y
            lo += c
        assert lo == self.in_channels
        out = out + bias.astype(self.dtype)
        if add is not None:
            out = out + add
        return out


def _head_bf16() -> bool:
    """Head dtype knob (``IVID_TPU_HEAD_BF16``): keep the output head's
    activation stream in the torso dtype instead of upcasting to f32.

    The unfused head materializes silu(GN32(h)) in f32 and the 3x3 head conv
    streams it back — input-bound (SR trace: 3.53 ms/step reading the f32
    [54,256,256,128] = 1.8 GB stream at ~10 TFLOP/s). Merely casting the
    conv INPUT measured a no-op (SR 289.29 vs 289.33 ms): XLA fuses the
    convert into the conv (consumer), so the f32 buffer still streams. The
    buffer itself must be bf16: skip the pre-GN upcast so GroupNorm32
    (f32 statistics internally, per its contract) returns bf16, silu runs
    bf16, and the conv accumulates f32 via preferred_element_type. Numerics:
    one extra bf16 rounding on GN/silu outputs that came from a bf16 torso.
    Default ON from the round-4 model-step A/B — a small but consistent win
    on both production models (SR 281.90 -> 281.23 ms, flagship 114.78 ->
    114.71 ms; same-session floors), never a loss."""
    import os

    return os.environ.get("IVID_TPU_HEAD_BF16", "1") == "1"


@jax.custom_vjp
def _conv_f32out(x: jax.Array, kern: jax.Array) -> jax.Array:
    """Same-dtype 3x3 SAME conv with an f32-accumulated output.

    ``lax.conv_general_dilated`` with ``preferred_element_type=f32`` on bf16
    operands is NOT transposable — JAX's conv transpose rule feeds the f32
    cotangent into a conv against the bf16 operand and raises a dtype
    mismatch (caught live by the round-5 host-warp demo: every bf16-torso
    TRAIN step failed once IVID_TPU_HEAD_BF16 defaulted ON, which had only
    been A/B'd on the sampling step). The custom VJP differentiates through
    the same-dtype conv instead: the cotangent is cast to the operand dtype
    (standard mixed-precision practice), dx matches x, and the kernel grad
    re-enters f32 through the caller's astype."""
    return jax.lax.conv_general_dilated(
        x, kern, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )


def _conv_f32out_fwd(x, kern):
    return _conv_f32out(x, kern), (x, kern)


def _conv_f32out_bwd(res, g):
    x, kern = res
    _, vjp = jax.vjp(
        lambda x_, k_: jax.lax.conv_general_dilated(
            x_, k_, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ),
        x, kern,
    )
    return vjp(g.astype(x.dtype))


_conv_f32out.defvjp(_conv_f32out_fwd, _conv_f32out_bwd)


class _HeadConv(nn.Module):
    """Output-head 3x3 conv with the output-channel dim padded to the f32
    sublane width (8) at apply time. The RGBD head has 4 output channels;
    a 4-wide f32 conv output forces a half-empty T(4,128) tile and a
    batch-minor relayout (profiled ~1 ms/step at batch 32: 10.9 TFLOP/s on
    the head conv). Parameters keep the unpadded [3,3,C,out] shape, so the
    checkpoint tree is identical to ``nn.Conv`` (reference semantics:
    diffusion/backbones/adm.py:483-487 zero-init out conv)."""

    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kern = self.param(
            "kernel", nn.initializers.zeros,
            (3, 3, x.shape[-1], self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        pad = (-self.features) % 8
        if pad:
            kern = jnp.pad(kern, ((0, 0), (0, 0), (0, 0), (0, pad)))
        if x.dtype != jnp.float32:
            kern = kern.astype(x.dtype)
        y = _conv_f32out(x, kern)
        import os

        if pad and os.environ.get("IVID_TPU_HEAD_BARRIER", "0") == "1":
            # Keep the slice OUT of the conv fusion: fused, the conv's output
            # takes the half-empty T(4,128) tile and streams its input at
            # only 314 GB/s (round-5 SR trace, 3.06 ms/step). Behind the
            # barrier the conv keeps the 8-padded T(8,128) output; the
            # slice+bias runs as a separate cheap pass over the small output.
            y = jax.lax.optimization_barrier(y)
        return y[..., : self.features] + bias


def _conv(features: int, kernel: int, dtype, stride: int = 1, zero_init: bool = False,
          name: Optional[str] = None) -> nn.Conv:
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding="SAME" if stride == 1 else [(1, 1), (1, 1)],
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.zeros if zero_init else nn.initializers.lecun_normal(),
        name=name,
    )


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsample in NHWC (reference: adm.py:87-92).

    One fused broadcast instead of two ``jnp.repeat`` passes: the repeat pair
    materializes the half-upsampled intermediate ([B,2H,W,C]) in HBM before
    the second pass re-reads it (profiled: ~1.0 ms/step across the decoder's
    two upsample sites at batch 32; the single broadcast writes once)."""
    b, h, w, c = x.shape
    y = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return y.reshape(b, 2 * h, 2 * w, c)


def downsample_avg_2x(x: jax.Array) -> jax.Array:
    """2x2 average-pool downsample in NHWC (reference: adm.py:95-117).

    ``reduce_window`` rather than reshape-mean: the strided 6-D reshape forces
    an awkward layout on TPU (measured 4.0 ms vs 2.2 ms at [32,128,128,256])."""
    s = jax.lax.reduce_window(
        x.astype(jnp.float32), 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1),
        "VALID",
    )
    return (s * 0.25).astype(x.dtype)


class ResBlock(nn.Module):
    """Residual block with FiLM (scale-shift-norm) timestep conditioning and
    optional in-block resampling (reference: diffusion/backbones/adm.py:120-222)."""

    out_channels: int
    num_groups: int = 32
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        emb: jax.Array,
        *,
        skip: Optional[jax.Array] = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if skip is not None:
            # Split-skip path: the logical input is concat(x, skip) but the
            # concatenation never materializes — GroupNorm statistics combine
            # across the parts and the convs run on sliced kernels (measured
            # 16% faster per decoder block on v5e; XLA inserts layout copies
            # around materialized concats). Parameter tree is identical to the
            # concat path, so checkpoints are interchangeable.
            return self._split_forward(x, skip, emb, deterministic=deterministic)

        # NOTE: a Pallas GN(+FiLM)+SiLU+conv3x3 fusion lived here through
        # round 4; the model-step A/B REFUTED it (flagship 115.4 → 140.0 ms,
        # MFU 93.9 → 72.6%) and it was deleted per the round-4 verdict. The
        # numbers and the methodology lesson live in BASELINE.md ("standalone
        # -jit op baselines overstate unfused cost — XLA fuses GN/SiLU into
        # neighboring convs in the full graph").
        in_norm = GroupNorm32(self.num_groups, name="in_norm")
        in_conv = _conv(self.out_channels, 3, self.dtype, name="in_conv")

        h = nn.silu(in_norm(x))
        if self.up:
            h = upsample_nearest_2x(h)
            # x stays at the small resolution: the residual upsample is
            # fused into the final add (see below), and a channel-matching
            # 1x1 conv commutes exactly with nearest upsampling — running
            # it before costs 4x less.
        elif self.down:
            h = downsample_avg_2x(h)
            x = downsample_avg_2x(x)
        h = in_conv(h)

        # Timestep/class modulation. The Linear runs in fp32 (the reference leaves
        # Linear modules out of fp16 conversion, diffusion/backbones/utils.py:7-24)
        # and is cast to the activation dtype afterwards (adm.py:211).
        emb_features = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        emb_out = nn.Dense(
            emb_features, dtype=jnp.float32, param_dtype=jnp.float32, name="emb_proj"
        )(nn.silu(emb)).astype(h.dtype)
        emb_out = emb_out[:, None, None, :]

        out_norm = GroupNorm32(self.num_groups, name="out_norm")
        out_conv = _conv(self.out_channels, 3, self.dtype, zero_init=True, name="out_conv")
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = out_norm(h) * (1 + scale) + shift
        else:
            h = out_norm(h + emb_out)
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        h = out_conv(h)

        if x.shape[-1] != self.out_channels:
            x = _conv(self.out_channels, 1, self.dtype, name="skip_conv")(x)
        if self.up:
            import os

            if os.environ.get("IVID_TPU_UP_ADD", "phase") == "4d":
                # Plain 4-D residual: ``out_conv(...) + up(x)``. The round-5
                # SR trace caught the phase-view form below materializing its
                # 6-D broadcast anyway (1.95 ms/step at upsample_1, 580 GB/s
                # — the docstring's "never hits HBM" was wrong); the 4-D form
                # is a clean conv+add XLA can fold into the out_conv epilogue
                # (convolution_add_fusion) with the broadcast computed
                # in-fusion. Bit-identical math; A/B'd on chip.
                return h + upsample_nearest_2x(x)
            # Residual add over h's 2x2 phase view.
            b, hh, ww, c = h.shape
            y = h.reshape(b, hh // 2, 2, ww // 2, 2, c)
            y = y + x[:, :, None, :, None, :]
            return y.reshape(b, hh, ww, c)
        return x + h

    def _split_forward(self, x, skip, emb, *, deterministic):
        parts = (x, skip)
        c_in = x.shape[-1] + skip.shape[-1]
        assert c_in != self.out_channels, "split path expects a skip projection"
        assert not (self.up or self.down), "decoder skip blocks never resample"

        hp = SplitGroupNorm32(self.num_groups, c_in, name="in_norm")(parts)
        hp = tuple(nn.silu(p) for p in hp)
        h = SplitConv(
            self.out_channels, c_in, kernel=3, dtype=self.dtype, name="in_conv"
        )(hp)

        emb_features = (
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        )
        emb_out = nn.Dense(
            emb_features, dtype=jnp.float32, param_dtype=jnp.float32, name="emb_proj"
        )(nn.silu(emb)).astype(h.dtype)
        emb_out = emb_out[:, None, None, :]

        out_norm = GroupNorm32(self.num_groups, name="out_norm")
        out_conv = _conv(self.out_channels, 3, self.dtype, zero_init=True, name="out_conv")
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = out_norm(h) * (1 + scale) + shift
        else:
            h = out_norm(h + emb_out)
        h = nn.silu(h)
        if self.dropout > 0:
            h = nn.Dropout(rate=self.dropout, deterministic=deterministic)(h)
        h = out_conv(h)

        # ``add=h`` folds the residual add into the skip projection (one pass
        # under the pair kernel; the XLA path applies it as a trailing add).
        return SplitConv(
            self.out_channels, c_in, kernel=1, dtype=self.dtype, name="skip_conv"
        )(parts, add=h)


def _use_split_skip() -> bool:
    """Decoder skip handling: split (TPU default) avoids materializing the
    skip concatenation. ``IVID_TPU_SPLIT_SKIP=0|1`` overrides."""
    import os

    v = os.environ.get("IVID_TPU_SPLIT_SKIP", "auto")
    if v in ("0", "1"):
        return v == "1"
    from ivid_tpu.ops.raster import exec_platform

    return exec_platform() == "tpu"


def _attention_impl(seq: int, heads: int, head_dim: int) -> str:
    """Pick the attention implementation for a TPU backend.

    - ``packed`` (default where supported): the Pallas kernel that reads
      q/k/v straight out of the fused [B,T,3C] projection and writes
      token-major output — zero layout copies (ops/attention.py).
    - ``flash``: the stock pallas flash kernel on unpacked [B,H,T,D] tensors
      (profiled: +835 us of relayout per seq-1024 block at batch 32).
    - ``einsum``: materialized-logits path — fastest below seq 512, and the
      only path off-TPU (CPU parity tests).
    Override with ``IVID_TPU_ATTN=packed|flash|einsum``."""
    import os

    from ivid_tpu.ops import attention as attn_ops
    from ivid_tpu.ops.raster import exec_platform

    impl = os.environ.get("IVID_TPU_ATTN", "auto")
    if impl == "packed" and not (
        exec_platform() == "tpu"
        # strict: an explicit packed request with a non-dividing BQ override
        # raises instead of silently measuring a different implementation.
        and attn_ops.supports_packed(seq, heads, head_dim, strict=True)
    ):
        # The kernel is TPU-only and shape-gated; honoring a blanket override
        # here would crash (CPU lowering, odd heads) or silently truncate the
        # grid. Fall back loudly to the auto choice for this block.
        import warnings

        warnings.warn(
            f"IVID_TPU_ATTN=packed unsupported for seq={seq} heads={heads} "
            f"head_dim={head_dim} on {exec_platform()}; using auto",
            stacklevel=2,
        )
        impl = "auto"
    if impl == "flash" and not (
        exec_platform() == "tpu"
        and attn_ops.supports_flash(seq, heads, head_dim)
    ):
        # Same validation the packed override gets: flash is a Pallas TPU
        # kernel — honoring it on CPU (or at a non-dividing seq) fails at
        # trace time with an opaque lowering error.
        import warnings

        warnings.warn(
            f"IVID_TPU_ATTN=flash unsupported for seq={seq} heads={heads} "
            f"head_dim={head_dim} on {exec_platform()}; using auto",
            stacklevel=2,
        )
        impl = "auto"
    if impl in ("packed", "flash", "einsum"):
        return impl
    # Back-compat escape hatch from round 2's A/B testing.
    if os.environ.get("IVID_TPU_FLASH_ATTN", "1") != "1":
        return "einsum"
    if exec_platform() != "tpu" or seq < 512 or seq % 512:
        return "einsum"
    if attn_ops.supports_packed(seq, heads, head_dim):
        return "packed"
    return "flash" if attn_ops.supports_flash(seq, heads, head_dim) else "einsum"


class AttentionBlock(nn.Module):
    """Global spatial self-attention with fp32 softmax
    (reference: diffusion/backbones/adm.py:225-286)."""

    num_groups: int = 32
    num_heads: int = 1
    num_head_channels: int = -1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        if self.num_head_channels != -1:
            assert c % self.num_head_channels == 0, (
                f"channels {c} not divisible by num_head_channels {self.num_head_channels}"
            )
            heads = c // self.num_head_channels
        else:
            heads = self.num_heads
        head_dim = c // heads

        tokens = x.reshape(b, h * w, c)
        normed = GroupNorm32(self.num_groups, name="norm")(tokens)
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(normed)

        # Scale factor 1/sqrt(sqrt(D)), applied to both q and k (reference:
        # adm.py:247-250). Python float (weakly typed): an np scalar would
        # promote bf16 q/k to f32 and drag the whole attention into f32.
        scale = float(1.0 / np.sqrt(np.sqrt(head_dim)))
        impl = _attention_impl(h * w, heads, head_dim)
        if impl == "packed":
            # Fused kernel straight over the packed [B,T,3C] projection —
            # no head transposes, no q/k/v slicing (ops/attention.py).
            from ivid_tpu.ops.attention import packed_attention

            out = packed_attention(qkv, heads, scale)
        elif impl == "flash":
            from ivid_tpu.ops.attention import unpacked_flash_attention

            out = unpacked_flash_attention(qkv, heads, scale)
        else:
            from ivid_tpu.ops.attention import reference_attention

            out = reference_attention(qkv, heads, scale)
        out = nn.Dense(
            c, dtype=self.dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.zeros, name="proj",
        )(out)
        return ((tokens + out).reshape(b, h, w, c)).astype(x.dtype)


class AdmUnet2d(nn.Module):
    """The ADM UNet (reference: diffusion/backbones/adm.py:289-566).

    Accepts the same architecture hyperparameters as the reference config schema
    (configs/*.json "backbone.args"); ``use_fp16`` maps to ``dtype=bfloat16``.

    Call signature: ``unet(x, t, classes)`` with ``x`` [B,H,W,C] in NHWC,
    ``t`` [B] int32 timesteps, ``classes`` [B] int32 labels or None. Label ``-1``
    is the null class when ``has_null_class``.
    """

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int]
    dropout: float = 0.0
    channel_mult: Sequence[float] = (1, 2, 4, 8)
    num_classes: Optional[int] = None
    has_null_class: bool = False
    num_groups: int = 32
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        classes: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        assert x.shape[1] == x.shape[2] == self.image_size, (
            f"expected {self.image_size}^2 input, got {x.shape}"
        )
        assert x.shape[-1] == self.in_channels
        embed_dim = self.model_channels * 4
        heads_kw = dict(
            num_groups=self.num_groups,
            num_heads=self.num_heads if self.num_heads else 1,
            num_head_channels=self.num_head_channels,
            dtype=self.dtype,
        )
        res_kw = dict(
            num_groups=self.num_groups,
            dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
            dtype=self.dtype,
        )

        # Timestep embedding MLP (fp32; reference: adm.py:356-362).
        emb = timestep_embedding(t, self.model_channels)
        emb = nn.Dense(embed_dim, dtype=jnp.float32, param_dtype=jnp.float32, name="time_embed_1")(emb)
        emb = nn.Dense(embed_dim, dtype=jnp.float32, param_dtype=jnp.float32, name="time_embed_2")(nn.silu(emb))

        # Class embedding with null-class masking (reference: adm.py:547-555).
        if self.num_classes is not None:
            label_table = self.param(
                "label_emb",
                nn.initializers.normal(stddev=1.0),
                (self.num_classes, embed_dim),
                jnp.float32,
            )
            if classes is not None:
                valid = (classes >= 0)
                class_emb = jnp.take(label_table, jnp.where(valid, classes, 0), axis=0)
                class_emb = class_emb * valid[:, None].astype(class_emb.dtype)
            else:
                class_emb = jnp.zeros((x.shape[0], embed_dim), jnp.float32)
            emb = emb + class_emb

        h = x.astype(self.dtype)
        hs = []
        ch = int(self.channel_mult[0] * self.model_channels)
        h = _conv(ch, 3, self.dtype, name="in_conv")(h)
        hs.append(h)

        # Encoder (reference: adm.py:367-416).
        ds = self.image_size
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                ch = int(mult * self.model_channels)
                h = ResBlock(ch, **res_kw, name=f"down_{level}_{i}")(
                    h, emb, deterministic=deterministic
                )
                if ds in self.attention_resolutions:
                    h = AttentionBlock(**heads_kw, name=f"down_{level}_{i}_attn")(h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = ResBlock(ch, **res_kw, down=True, name=f"downsample_{level}")(
                    h, emb, deterministic=deterministic
                )
                hs.append(h)
                ds //= 2

        # Middle (reference: adm.py:418-439).
        h = ResBlock(ch, **res_kw, name="mid_res1")(h, emb, deterministic=deterministic)
        h = AttentionBlock(**heads_kw, name="mid_attn")(h)
        h = ResBlock(ch, **res_kw, name="mid_res2")(h, emb, deterministic=deterministic)

        # Decoder with skip concatenation (reference: adm.py:441-481,562-564).
        # On TPU the concat is algebraically split inside the ResBlock (see
        # ResBlock._split_forward); param trees are identical either way.
        split_skip = _use_split_skip()
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                ch = int(mult * self.model_channels)
                skip = hs.pop()
                if split_skip:
                    h = ResBlock(ch, **res_kw, name=f"up_{level}_{i}")(
                        h, emb, skip=skip, deterministic=deterministic
                    )
                else:
                    h = jnp.concatenate([h, skip], axis=-1)
                    h = ResBlock(ch, **res_kw, name=f"up_{level}_{i}")(
                        h, emb, deterministic=deterministic
                    )
                if ds in self.attention_resolutions:
                    h = AttentionBlock(**heads_kw, name=f"up_{level}_{i}_attn")(h)
                if level and i == self.num_res_blocks:
                    h = ResBlock(ch, **res_kw, up=True, name=f"upsample_{level}")(
                        h, emb, deterministic=deterministic
                    )
                    ds *= 2
        assert not hs

        # Output head in fp32 (reference: adm.py:483-487,565-566). A fused
        # Pallas GN+SiLU+conv head lived here through round 4; the model-step
        # A/B measured it SLOWER in both production models (flagship 117.0 vs
        # 115.4 ms, SR 305.3 vs 299.4 — BASELINE.md) and it was deleted per
        # the round-4 verdict.
        if not _head_bf16():
            h = h.astype(jnp.float32)
        h = nn.silu(GroupNorm32(self.num_groups, name="out_norm")(h))
        return _HeadConv(self.out_channels, name="out_conv")(h).astype(
            jnp.float32
        )


def build_adm_unet(args: dict, dtype=jnp.bfloat16) -> AdmUnet2d:
    """Build an AdmUnet2d from a reference-schema backbone config dict
    (reference: configs/*.json, train.py:79-81). ``use_fp16`` selects bf16 compute;
    ``conv_resample``/``resblock_updown`` are accepted and ignored (the shipped
    configs never override their defaults).

    Precision policy for ``use_fp16: false`` configs (the flagship uncond
    model, which the reference runs fp32 on GPU): on TPU, a float32 activation
    stream buys no accuracy — XLA's default matmul precision computes f32
    convs on the MXU in bf16 anyway — while doubling HBM traffic on every
    norm/conv boundary (profiled: the 1×1-conv and attention fusions of the
    DDIM hot loop run memory-bound at ~700 GB/s). So ``auto`` uses a bf16
    torso with fp32 norms/softmax on TPU and exact f32 elsewhere (CPU parity
    tests). Set ``IVID_TPU_PRECISION=f32`` to force the f32 stream on TPU,
    ``bf16`` to force bf16 everywhere.
    """
    import os

    args = dict(args)
    use_low_precision = args.pop("use_fp16", False)
    args.pop("conv_resample", None)
    args.pop("resblock_updown", None)
    if args.get("num_heads") is None:
        args["num_heads"] = 1
    if args.get("num_head_channels") is None:
        args["num_head_channels"] = -1
    if not use_low_precision:
        policy = os.environ.get("IVID_TPU_PRECISION", "auto")
        if policy == "bf16":
            dtype = jnp.bfloat16
        elif policy == "f32":
            dtype = jnp.float32
        else:
            dtype = (
                jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
            )
    return AdmUnet2d(**args, dtype=dtype)
