"""Cross-platform TPU lowering gates for every Pallas kernel.

``interpret=True`` tests validate kernel MATH on CPU but skip the Mosaic
front-end entirely — TPU-only constraints (block shapes whose last two dims
must be sublane/lane aligned or full, SMEM budgets for scalar prefetch,
memory-space rules) only fire when lowering for the TPU platform. These tests
run ``jax.jit(...).trace(...).lower(lowering_platforms=("tpu",))`` on the CPU
backend, which executes the Mosaic lowering without needing a chip, so a
kernel that would fail the driver's on-TPU compile check fails CI instead
(this caught the fused head's [B, C] affine-table block specs).

It does NOT catch Mosaic *backend* failures (VMEM overflow, register
pressure) — those still need one real-TPU run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _lower_tpu(fn, *args):
    return jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))


def test_fused_head_lowers_for_tpu():
    from ivid_tpu.ops.fused_head import fused_gn_silu_conv

    def f(x, s, b, k, cb):
        return fused_gn_silu_conv(x, s, b, k, cb, 32, mm_dtype=jnp.bfloat16)

    shapes = [
        ((16, 128, 128, 256), 256),  # flagship head
        ((27, 256, 256, 128), 128),  # SR head
    ]
    for xs, c in shapes:
        args = (
            jnp.zeros(xs, jnp.bfloat16), jnp.ones((c,)), jnp.zeros((c,)),
            jnp.zeros((3, 3, c, 4)), jnp.zeros((4,)),
        )
        _lower_tpu(f, *args)
        _lower_tpu(
            jax.grad(lambda *a: jnp.sum(f(*a)), argnums=(0, 1, 2, 3, 4)),
            *args,
        )


def test_packed_attention_lowers_for_tpu():
    from ivid_tpu.ops.attention import packed_attention

    for (seq, heads, hd) in [(256, 16, 64), (1024, 8, 64), (4096, 4, 64)]:
        qkv = jnp.zeros((16, seq, 3 * heads * hd), jnp.bfloat16)
        f = lambda q: packed_attention(q, heads, hd ** -0.5)  # noqa: E731
        _lower_tpu(f, qkv)
        _lower_tpu(jax.grad(lambda q: jnp.sum(f(q).astype(jnp.float32))), qkv)


def test_packed_attention_deferred_lowers_for_tpu(monkeypatch):
    from ivid_tpu.ops.attention import packed_attention

    monkeypatch.setenv("IVID_TPU_ATTN_DEFER", "1")
    for (seq, heads, hd) in [(1024, 8, 64), (4096, 4, 64)]:
        qkv = jnp.zeros((16, seq, 3 * heads * hd), jnp.bfloat16)
        _lower_tpu(lambda q: packed_attention(q, heads, hd ** -0.5), qkv)


def test_packed_attention_exp2_lowers_for_tpu(monkeypatch):
    from ivid_tpu.ops.attention import packed_attention

    monkeypatch.setenv("IVID_TPU_ATTN_EXP2", "1")
    for (seq, heads, hd) in [(1024, 8, 64), (4096, 4, 64)]:
        qkv = jnp.zeros((16, seq, 3 * heads * hd), jnp.bfloat16)
        _lower_tpu(lambda q: packed_attention(q, heads, hd ** -0.5), qkv)


def test_packed_attention_mxu_sum_lowers_for_tpu(monkeypatch):
    from ivid_tpu.ops.attention import packed_attention

    monkeypatch.setenv("IVID_TPU_ATTN_MXU_SUM", "1")
    for (seq, heads, hd) in [(1024, 8, 64), (4096, 4, 64)]:
        qkv = jnp.zeros((16, seq, 3 * heads * hd), jnp.bfloat16)
        _lower_tpu(lambda q: packed_attention(q, heads, hd ** -0.5), qkv)


def test_tiled_resolve_lowers_for_tpu():
    from ivid_tpu.ops import raster
    from ivid_tpu.ops.raster_tiled import resolve_zbuffer_tiled

    R, V, T = 384, 128, 80
    rng = np.random.RandomState(0)
    tris = jnp.asarray(rng.randint(0, V, (T, 3)).astype(np.int32))

    def f(win, w, attrs):
        fr = raster.generate_fragments(win, w, attrs, tris, R, level=3)
        return resolve_zbuffer_tiled([fr], [fr.attrs], R, interpret=False)

    win = jnp.zeros((V, 3))
    _lower_tpu(f, win, jnp.ones((V,)), jnp.zeros((V, 4)))


def test_dense_raster_lowers_for_tpu():
    from ivid_tpu.ops import raster_dense

    # Aggregation-slot production shapes: 130^2 grid mesh -> 384^2 buffer,
    # single and batched (8 view slots in one launch). A=6 is the
    # vertex-weight attr set; A=11 the fragment-weight (pos+normal varyings)
    # production default.
    g, R = 130, 384
    V = g * g

    def single(win, w, attrs, pos):
        return raster_dense.rasterize_grid_dense(
            win, w, attrs, pos, g, R, interpret=False
        )

    def batched(win, w, attrs, pos):
        return raster_dense.rasterize_grid_dense_batched(
            win, w, attrs, pos, g, R, interpret=False
        )

    for A in (6, 11):
        args1 = (jnp.zeros((V, 3)), jnp.ones((V,)), jnp.zeros((V, A)),
                 jnp.zeros((V, 3)))
        _lower_tpu(single, *args1)
        argsb = tuple(jnp.broadcast_to(a, (8,) + a.shape) for a in args1)
        _lower_tpu(batched, *argsb)
    A = 6

    # Indexed-tris dense form (skirt ring / non-grid meshes).
    T = 1024

    def tris_form(win, w, attrs, tris):
        return raster_dense.rasterize_tris_dense(
            win, w, attrs, tris, R, interpret=False
        )

    rng = np.random.RandomState(0)
    tris = jnp.asarray(rng.randint(0, V, (T, 3)).astype(np.int32))
    _lower_tpu(tris_form, jnp.zeros((V, 3)), jnp.ones((V,)),
               jnp.zeros((V, A)), tris)


def test_fused_agg_raster_lowers_for_tpu():
    from ivid_tpu.ops import raster_dense

    # Production aggregation shapes: 130² grid meshes, 384² buffers, up to
    # 24 slots per launch (the 3x9 slot-bucket max). The epilogue's identity
    # matmul transpose + f32 SMEM camera prefetch are the novel pieces.
    g, R = 130, 384
    V = g * g
    for B, A, mode in ((8, 11, "fragment"), (24, 11, "fragment"),
                       (8, 6, "vertex")):
        def f(win, w, attrs, pos, cams, mode=mode):
            return raster_dense.rasterize_grid_agg_batched(
                win, w, attrs, pos, g, R, cams, weight_mode=mode,
                interpret=False,
            )

        _lower_tpu(
            f, jnp.zeros((B, V, 3)), jnp.ones((B, V)), jnp.zeros((B, V, A)),
            jnp.zeros((B, V, 3)), jnp.zeros((B, 3)),
        )


def test_graft_entry_lowers_for_tpu(monkeypatch):
    monkeypatch.setenv("IVID_TPU_FUSED_HEAD", "1")
    monkeypatch.setenv("IVID_TPU_SPLIT_SKIP", "1")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    _lower_tpu(fn, *args)


def test_fused_gn_conv_lowers_for_tpu():
    from ivid_tpu.ops.fused_gn_conv import fused_affine_silu_conv, gn_affine

    # Production torso shapes: SR 256^2 level (C=F=128, batch 54 fused-CFG)
    # and flagship 128^2 level (C=F=256, batch 32).
    for (b, h, w, c, f) in [(54, 256, 256, 128, 128), (32, 128, 128, 256, 256)]:
        x = jnp.zeros((b, h, w, c), jnp.bfloat16)
        gs, gb = jnp.ones((c,)), jnp.zeros((c,))
        kern = jnp.zeros((3, 3, c, f))
        bias = jnp.zeros((f,))

        def fwd(x, gs, gb, kern, bias):
            a, t = gn_affine(x, gs, gb, 32)
            return fused_affine_silu_conv(x, a, t, kern, bias)

        _lower_tpu(fwd, x, gs, gb, kern, bias)
        _lower_tpu(
            jax.grad(
                lambda *a: jnp.sum(fwd(*a).astype(jnp.float32)),
                argnums=(0, 1, 2, 3, 4),
            ),
            x, gs, gb, kern, bias,
        )


def test_fused_gn_conv_parts_lowers_for_tpu():
    from ivid_tpu.ops.fused_gn_conv import (
        fused_affine_silu_conv_parts, gn_affine_parts,
    )

    # Flagship decoder split block: x C=256 + skip C=256 -> F=256, batch 32.
    b, h, w, c0, c1, f = 32, 128, 128, 256, 256, 256
    x0 = jnp.zeros((b, h, w, c0), jnp.bfloat16)
    x1 = jnp.zeros((b, h, w, c1), jnp.bfloat16)
    gs, gb = jnp.ones((c0 + c1,)), jnp.zeros((c0 + c1,))
    kern = jnp.zeros((3, 3, c0 + c1, f))
    bias = jnp.zeros((f,))

    def fwd(x0, x1, gs, gb, kern, bias):
        ats = gn_affine_parts((x0, x1), gs, gb, 32)
        return fused_affine_silu_conv_parts((x0, x1), ats, kern, bias)

    _lower_tpu(fwd, x0, x1, gs, gb, kern, bias)
    _lower_tpu(
        jax.grad(
            lambda *a: jnp.sum(fwd(*a).astype(jnp.float32)),
            argnums=tuple(range(6)),
        ),
        x0, x1, gs, gb, kern, bias,
    )
