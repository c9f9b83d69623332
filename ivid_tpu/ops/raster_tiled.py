"""Tile-parallel Pallas z-buffer resolve: sort-binned fragments, VMEM tiles.

This is the production TPU resolve, replacing both XLA scatters (which
serialize, ~25 ms per 384² raster) and the sequential VMEM replay kernel
(~40 ms). Measured architecture costs on v5e (bench_micro.py): a full
``lax.sort`` of 733k fragments is ~0.4 ms, so binning by sort is nearly free;
the depth test itself then runs as dense vector compares + one MXU matmul per
fragment chunk.

Pipeline:

1. Sort all fragments by flattened pixel id (invalid → sentinel ``npix``,
   sorted past the end). Fragments of each framebuffer *tile* (1024
   consecutive flat pixels) now form a contiguous run; run boundaries come
   from one ``searchsorted`` over the tile edges.
2. Pallas kernel, grid over tiles. Each tile streams its run HBM→VMEM in
   double-buffered chunks of 512 fragments (8×512 f32 blocks: row 0 = pixel
   key, 1 = window depth, 2-4 = payload, 5 = 1.0 count column) and makes two
   sweeps:
   - sweep 1: dense one-hot depth min — ``zbuf[p] = min z over fragments with
     key==p`` via a [1024, 512] compare/select/lane-reduce (VPU);
   - sweep 2: winners ``(z == zbuf[p])`` form a 0/1 matrix which multiplies
     the chunk's data rows on the MXU, yielding payload sums and the winner
     count per pixel in one matmul.
3. Winners are tie-averaged (payload sum / count) — the same semantics as
   the scatter resolve (`raster.resolve_zbuffer_scatter`), matching the GL
   pipeline it stands in for (reference: rgbd_3d/moderngl_renderer.py:47
   depth_func '<'; shaders z-test in hardware).

The per-tile fragment run has no static cap — the chunk loop trip count is
dynamic — so arbitrarily uneven fragment distributions (e.g. a surface seen
edge-on stacking thousands of fragments on one pixel column) stay correct.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAR = 9.0  # sentinel depth; valid window depths lie in [0, 1]
# Tile/chunk sizes swept on v5e (bench_resolve.py, 733k fragments @ 384²):
# P=1024→4.6ms, 512→3.7, 256→3.0, 128→3.2, 64→3.6; CH 1024/512/256→3.9/3.7/4.3.
P = 256    # pixels per framebuffer tile
CH = 512   # fragments per streamed chunk


def _tile_kernel(bounds_ref, data_ref, out_ref, buf, sem):
    """One framebuffer tile: depth-min sweep, then winner-matmul sweep.

    bounds_ref: SMEM [T+1] int32 — fragment run boundaries per tile.
    data_ref:   HBM  [8, N_pad] f32 — rows (key, z, p0, p1, p2, p3, 1, 0).
    out_ref:    VMEM [1, P, 8] f32 — col 0 zbuf, 2-5 payload sums, 6 count.
    buf:        VMEM [2, 8, CH] f32 double buffer.
    sem:        DMA semaphores (2,).
    """
    t = pl.program_id(0)
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    first = start // CH
    nch = jnp.where(end > start, (end - 1) // CH - first + 1, 0)
    t_base = (t * P).astype(jnp.float32)

    pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).astype(
        jnp.float32
    )  # local pixel ids
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, CH), 1)

    def dma(j, slot):
        base = (first + j) * CH
        return pltpu.make_async_copy(
            data_ref.at[:, pl.ds(base, CH)], buf.at[slot], sem.at[slot]
        )

    def masked_lp(j, chunk):
        """Local pixel id per fragment, -1 outside this tile's [start, end)."""
        gidx = (first + j) * CH + lane
        ok = (gidx >= start) & (gidx < end)
        lp = chunk[0:1, :] - t_base
        return jnp.where(ok, lp, -1.0)

    @pl.when(nch > 0)
    def _():
        dma(0, 0).start()

    def sweep(j, carry):
        zbuf, acc = carry
        slot = jax.lax.rem(j, 2)

        @pl.when(j + 1 < nch)
        def _():
            dma(j + 1, 1 - slot).start()

        dma(j, slot).wait()
        chunk = buf[slot]
        lp = masked_lp(j, chunk)              # [1, CH]
        m = pid == lp                          # [P, CH]
        zm = jnp.where(m, chunk[1:2, :], _FAR)
        zc = jnp.min(zm, axis=1, keepdims=True)  # [P, 1] chunk min
        win = ((zm == zc) & (zc < 1.5)).astype(jnp.float32)
        acc_c = jax.lax.dot_general(
            win, chunk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [P, 8] chunk winner sums (cols 2-5 payload, 6 count)
        # Incremental exact merge: strictly-nearer chunk replaces, equal adds.
        less = zc < zbuf
        eq = zc == zbuf
        acc = jnp.where(less, acc_c, jnp.where(eq, acc + acc_c, acc))
        return jnp.minimum(zbuf, zc), acc

    zbuf, acc = jax.lax.fori_loop(
        0, nch, sweep,
        (jnp.full((P, 1), _FAR, jnp.float32), jnp.zeros((P, 8), jnp.float32)),
    )
    out_ref[0, :, :] = acc
    out_ref[0, :, 0:1] = zbuf


def resolve_zbuffer_tiled(
    fragments: Sequence, payloads: Sequence[jnp.ndarray], render_size: int,
    interpret: bool = False, num_buffers: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in for :func:`ivid_tpu.ops.raster.resolve_zbuffer` (payload K ≤ 4).

    Returns ``(payload [R,R,K3], depth_win [R,R], covered [R,R])`` in image row
    order, tie-averaged like the scatter resolve.

    ``num_buffers`` resolves B independent framebuffers in ONE sort + ONE
    kernel launch: fragments carry GLOBAL pixel ids ``b·R² + y·R + x``
    (invalid → ``B·R²``), and the leading output axis is the buffer. Tiles
    never straddle buffers (R² is a multiple of P), so the per-tile kernel is
    unchanged — batching costs nothing but the longer sort."""
    npix = num_buffers * render_size * render_size
    assert npix % P == 0, f"render_size² must be a multiple of {P}"
    # Pixel keys ride through the kernel as f32; beyond 2^24 distinct ids
    # would round together and silently mis-bin fragments.
    assert npix < 2**24, (
        f"{num_buffers} x {render_size}² exceeds exact-f32 pixel ids"
    )
    ntiles = npix // P

    cat = lambda xs, **kw: xs[0] if len(xs) == 1 else jnp.concatenate(xs, **kw)
    pix = cat([f.pixel for f in fragments])
    d = cat([f.depth for f in fragments])
    valid = cat([f.valid for f in fragments])
    payload = cat(list(payloads), axis=0)
    k = payload.shape[-1]
    assert k <= 4, f"tiled resolve supports K<=4 payload channels, got {k}"
    if k < 4:
        payload = jnp.concatenate(
            [payload, jnp.zeros(payload.shape[:-1] + (4 - k,), payload.dtype)], -1
        )

    key = jnp.where(valid, pix, npix).astype(jnp.int32)
    z = jnp.where(valid, d, _FAR).astype(jnp.float32)
    # Invalid fragments can carry non-finite interpolated payloads (mixed-sign
    # clip w); they never WIN, but they share winner-matmul chunks with real
    # fragments and 0 * NaN would poison the whole accumulator row.
    payload = jnp.where(valid[:, None], payload, 0.0)
    key_s, z_s, p0, p1, p2, p3 = jax.lax.sort(
        (key, z) + tuple(payload[:, c].astype(jnp.float32) for c in range(4)),
        num_keys=1,
    )

    edges = jnp.arange(0, npix + 1, P, dtype=jnp.int32)
    bounds = jnp.searchsorted(key_s, edges).astype(jnp.int32)

    n = key_s.shape[0]
    n_pad = ((n + CH - 1) // CH + 1) * CH
    pad = n_pad - n
    ones = jnp.ones_like(z_s)
    data = jnp.stack(
        [key_s.astype(jnp.float32), z_s, p0, p1, p2, p3, ones, ones * 0],
        axis=0,
    )
    data = jnp.pad(data, ((0, 0), (0, pad)), constant_values=float(npix))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, P, 8), lambda t, b: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 8, CH), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _tile_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles, P, 8), jnp.float32),
        interpret=interpret,
    )(bounds, data)

    zbuf = out[:, :, 0].reshape(npix)
    pay = out[:, :, 2:6].reshape(npix, 4)[:, :k]
    cnt = out[:, :, 6].reshape(npix)

    covered = zbuf < 1.5
    depth_win = jnp.where(covered, zbuf, 1.0)
    outp = jnp.where(covered[:, None], pay / jnp.maximum(cnt, 1.0)[:, None], 0.0)

    r = render_size
    if num_buffers > 1:
        b = num_buffers
        outp = jnp.flip(outp.reshape(b, r, r, -1), axis=1)
        depth_win = jnp.flip(depth_win.reshape(b, r, r), axis=1)
        covered = jnp.flip(covered.reshape(b, r, r), axis=1)
        return outp, depth_win, covered
    outp = jnp.flip(outp.reshape(r, r, -1), axis=0)
    depth_win = jnp.flip(depth_win.reshape(r, r), axis=0)
    covered = jnp.flip(covered.reshape(r, r), axis=0)
    return outp, depth_win, covered
