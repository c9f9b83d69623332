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


@pytest.mark.slow  # ~84s on the 1-core dev box; default tier budget is 20 min
def test_graft_entry_lowers_for_tpu(monkeypatch):
    monkeypatch.setenv("IVID_TPU_SPLIT_SKIP", "1")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    _lower_tpu(fn, *args)
