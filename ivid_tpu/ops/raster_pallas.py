"""Pallas TPU z-buffer resolve: sequential fragment replay over a VMEM framebuffer.

The XLA-primitive resolves (scatter or sort+segmented-scan,
:mod:`ivid_tpu.ops.raster`) both bottom out around ~66 ms per 384² raster —
TPU scatters serialize and sorts pay O(N log²N). This kernel instead keeps the
whole framebuffer resident in VMEM (384²×4 f32 ≈ 2.4 MB, 640² ≈ 6.5 MB) and
replays fragments sequentially with a strict ``<`` depth test — which is also
EXACTLY the GL semantic (first-drawn wins ties; the scatter resolve tie-averages
instead, reference: moderngl depth_func '<', rgbd_3d/moderngl_renderer.py:47).

Fragments stream HBM→VMEM through the standard Pallas grid pipeline (one chunk
per grid step, auto double-buffered); pixel indices ride in SMEM for scalar
control flow. Payload is fixed at 3 channels (uv + alpha — the renderers defer
texture lookup to post-resolve).

Enable with ``IVID_TPU_PALLAS_RASTER=1`` (see raster.resolve_zbuffer).
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Sentinel depth for "no fragment": valid window depths lie in [0, 1].
_FAR = 9.0
_CHUNK = 1024


def _zbuffer_kernel(pix_ref, row_ref, fb_ref):
    """One grid step: replay _CHUNK fragments into the resident framebuffer.

    ``pix_ref``: SMEM (CHUNK,) int32 target rows (dump row for invalid).
    ``row_ref``: VMEM (CHUNK, 4) f32 — [depth, payload0, payload1, payload2].
    ``fb_ref``:  VMEM (npix_padded, 4) accumulator, constant block across steps.
    """

    @pl.when(pl.program_id(0) == 0)
    def _init():
        fb_ref[:, :] = jnp.full_like(fb_ref[:, :], _FAR)

    def body(j, _):
        p = pix_ref[j]
        zj = row_ref[j, 0]

        @pl.when(zj < fb_ref[p, 0])
        def _write():
            fb_ref[pl.ds(p, 1), :] = row_ref[pl.ds(j, 1), :]

        return 0

    jax.lax.fori_loop(0, _CHUNK, body, 0)


def resolve_zbuffer_pallas(
    fragments: Sequence, payloads: Sequence[jnp.ndarray], render_size: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Drop-in for :func:`ivid_tpu.ops.raster.resolve_zbuffer` (payload K ≤ 3)."""
    npix = render_size * render_size
    pix = jnp.concatenate([f.pixel for f in fragments])
    d = jnp.concatenate([f.depth for f in fragments])
    valid = jnp.concatenate([f.valid for f in fragments])
    payload = jnp.concatenate(payloads, axis=0)
    k = payload.shape[-1]
    assert k <= 3, f"pallas resolve supports K<=3 payload channels, got {k}"
    if k < 3:
        payload = jnp.concatenate(
            [payload, jnp.zeros(payload.shape[:-1] + (3 - k,), payload.dtype)], -1
        )

    n = pix.shape[0]
    n_pad = ((n + _CHUNK - 1) // _CHUNK) * _CHUNK
    dump = npix  # dump row for invalid / padded fragments
    pix_in = jnp.where(valid, pix, dump).astype(jnp.int32)
    pix_in = jnp.pad(pix_in, (0, n_pad - n), constant_values=dump)
    d_in = jnp.where(valid, d, _FAR).astype(jnp.float32)
    rows = jnp.concatenate([d_in[:, None], payload.astype(jnp.float32)], axis=-1)
    rows = jnp.pad(rows, ((0, n_pad - n), (0, 0)), constant_values=_FAR)

    # Pad the framebuffer rows to a sublane multiple (8) past the dump row.
    fb_rows = ((npix + 1 + 7) // 8) * 8
    grid = (n_pad // _CHUNK,)
    fb = pl.pallas_call(
        _zbuffer_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_CHUNK,), lambda i: (i,), memory_space=pltpu.SMEM),
            pl.BlockSpec((_CHUNK, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (fb_rows, 4), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((fb_rows, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(pix_in, rows)

    fb = fb[:npix]
    covered = fb[:, 0] < 1.5
    depth_win = jnp.where(covered, fb[:, 0], 1.0)
    out = jnp.where(covered[:, None], fb[:, 1:], 0.0)

    r = render_size
    out = jnp.flip(out.reshape(r, r, -1), axis=0)
    depth_win = jnp.flip(depth_win.reshape(r, r), axis=0)
    covered = jnp.flip(covered.reshape(r, r), axis=0)
    return out, depth_win, covered
