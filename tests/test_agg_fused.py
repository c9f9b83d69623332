"""Fused aggregation raster (kernel-side epilogue + channelwise prep) vs the
plane-table path.

`raster_dense.rasterize_grid_agg_batched` replaces the corners-based prep
(profiled ~0.95 ms/slot of (8,128)-padded slice/copy traffic) and the 41-lane
plane-accumulator output + XLA finish (~1 ms/slot) with a transposed
channelwise prep and an in-kernel epilogue emitting 8 final channels. These
tests pin its finished view buffers (rgb, alpha, window depth) to the
production `_aggregation_view_buffers_all` path on real depth-mesh scenes,
for both weight modes, plus the whole `render_aggregation` output.
Reference semantics: rgbd_3d/shaders/aggregation.{vsh,fsh,csh}.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ivid_tpu.ops import camera as cam
from ivid_tpu.ops import raster, raster_dense
from ivid_tpu.ops import renderer as rend

from test_aggregation_oracle import _make_scene


def _view_buffers(meshes, colors, target, r, fused, monkeypatch):
    if fused:
        monkeypatch.setenv("IVID_TPU_AGG_FUSED", "1")
        monkeypatch.setenv("IVID_TPU_SKIRT_IMPL", "pallas")
        monkeypatch.setattr(
            raster_dense, "rasterize_grid_agg_batched",
            functools.partial(
                raster_dense.rasterize_grid_agg_batched, interpret=True),
        )
    else:
        monkeypatch.setenv("IVID_TPU_AGG_FUSED", "0")
        monkeypatch.setenv("IVID_TPU_SKIRT_IMPL", "xla")
    proj = cam.perspective(45.0, 1.0, 0.01, 200.0)
    out = rend._aggregation_view_buffers_all(meshes, colors, target, proj, r)
    return [np.asarray(x) for x in out]


@pytest.mark.parametrize("mode", ["fragment", "vertex"])
def test_fused_agg_matches_view_buffers(mode, monkeypatch):
    monkeypatch.setenv("IVID_TPU_AGG_WEIGHT", mode)
    src, r = 32, 96  # production aspect (ssaa=3)
    meshes, colors = _make_scene(11, 3, src)
    target = cam.orbit_modelview(0.1, -0.07)

    rgb0, a0, d0 = _view_buffers(
        meshes, colors, target, r, False, monkeypatch)
    rgb1, a1, d1 = _view_buffers(
        meshes, colors, target, r, True, monkeypatch)

    np.testing.assert_allclose(d1, d0, atol=1e-5, err_msg="depth")
    # acos amplifies cos differences near 1 (d(acos)/dcos -> inf), so the
    # fragment-mode weight gets a relative band; clamp floors (1e-16, 1e-8
    # scales) ride under atol.
    np.testing.assert_allclose(a1, a0, rtol=5e-3, atol=1e-6, err_msg="alpha")
    # uv differences at texel boundaries can flip a GL_NEAREST fetch on
    # isolated pixels; bound the flip count instead of per-pixel equality.
    flips = np.mean(np.any(np.abs(rgb1 - rgb0) > 1e-4, axis=-1))
    assert flips < 1e-3, f"rgb flip fraction {flips}"


def test_cols_prep_matches_corners_prep(monkeypatch):
    """IVID_TPU_AGG_PREP=cols (channelwise transposed prep) must reproduce
    the corners-path plane tables through the unchanged plane kernel."""
    src, r = 24, 64
    meshes, colors = _make_scene(3, 2, src)
    mode = rend._agg_weight_mode()
    attrs = jax.vmap(lambda m: rend._aggregation_attrs(m, mode))(meshes)
    proj = cam.perspective(45.0, 1.0, 0.01, 200.0)
    mvp = proj @ cam.orbit_modelview(0.2, 0.0)
    g = src + 2
    win, w = jax.vmap(
        lambda p: raster.project_vertices(p, mvp, r))(meshes.positions)

    outs = {}
    for prep in ("corners", "cols"):
        monkeypatch.setenv("IVID_TPU_AGG_PREP", prep)
        outs[prep] = raster_dense.rasterize_grid_dense_batched(
            win, w, attrs, meshes.positions, g, r, discard_attr=3,
            interpret=True)
    for f in ("attrs", "depth", "front", "covered"):
        np.testing.assert_allclose(
            np.asarray(getattr(outs["cols"], f)),
            np.asarray(getattr(outs["corners"], f)), atol=1e-5, err_msg=f)


def test_fused_agg_whole_render_matches(monkeypatch):
    """End-to-end render_aggregation (accumulation + readback) equality."""
    monkeypatch.setenv("IVID_TPU_RASTER_MODE", "full")
    src, r = 32, 96
    meshes, colors = _make_scene(5, 3, src)
    valid = jnp.array([True, True, False])
    target = cam.orbit_modelview(-0.15, 0.1)

    outs = []
    for fused in (False, True):
        if fused:
            monkeypatch.setenv("IVID_TPU_AGG_FUSED", "1")
            monkeypatch.setenv("IVID_TPU_SKIRT_IMPL", "pallas")
            monkeypatch.setattr(
                raster_dense, "rasterize_grid_agg_batched",
                functools.partial(
                    raster_dense.rasterize_grid_agg_batched, interpret=True),
            )
        outs.append({
            k: np.asarray(v) for k, v in rend.render_aggregation(
                meshes, colors, valid, target, 45.0, r, 0.01, 200.0
            ).items()
        })

    base, fused = outs
    assert base.keys() == fused.keys()
    for k in ("mask_color", "mask_depth"):
        same = np.mean(base[k] == fused[k])
        assert same > 0.999, (k, same)
    np.testing.assert_allclose(
        fused["depth"], base["depth"], rtol=1e-4, atol=1e-4)
    close = np.mean(np.all(np.abs(fused["color"] - base["color"]) < 1e-3,
                           axis=-1))
    assert close > 0.998, f"color mismatch fraction {1 - close}"
