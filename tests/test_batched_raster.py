"""Batched (multi-framebuffer) raster paths vs their per-sample equivalents.

The cond trainer's warp synthesis batches B samples into ONE raster pass:
fragments carry global pixel ids ``b·R² + y·R + x`` through a single resolve
(`raster.resolve_zbuffer(num_buffers)`), and the skirt rings go through one
multi-buffer per-row dense kernel (`raster_dense.rasterize_tris_dense_batched`).
These tests pin batched == per-sample for every resolve variant, the dense
kernel (Pallas-interpret and XLA forms), the batched simple render, and the
full batched warp. Reference semantics: rgbd_3d/moderngl_renderer.py:91-148.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ivid_tpu.ops import camera as cam
from ivid_tpu.ops import geometry as geom
from ivid_tpu.ops import raster, raster_dense
from ivid_tpu.ops import renderer as rend
from ivid_tpu.ops import warp as warp_ops
from ivid_tpu.ops.raster_tiled import resolve_zbuffer_tiled


def _random_verts(rng, B, V, lo, hi):
    win = jnp.asarray(np.stack([
        rng.uniform(lo, hi, (B, V)), rng.uniform(lo, hi, (B, V)),
        rng.uniform(0, 1, (B, V))], -1).astype(np.float32))
    w = jnp.asarray(rng.uniform(0.5, 3.0, (B, V)).astype(np.float32))
    attrs = jnp.asarray(rng.uniform(0, 1, (B, V, 3)).astype(np.float32))
    return win, w, attrs


def test_batched_resolves_match_per_sample():
    rng = np.random.RandomState(1)
    B, V, T, R = 4, 30, 20, 32  # R² multiple of the tile size P=256
    tris = jnp.asarray(rng.randint(0, V, (T, 3)).astype(np.int32))
    npix = R * R

    frs, pls, singles = [], [], []
    for b in range(B):
        win, w, attrs = _random_verts(rng, 1, V, -5, 37)
        f = raster.generate_fragments(win[0], w[0], attrs[0], tris, R, level=3)
        singles.append(raster.resolve_zbuffer_scatter([f], [f.attrs], R))
        f = f._replace(pixel=jnp.where(f.valid, f.pixel + b * npix, B * npix))
        frs.append(f)
        pls.append(f.attrs)

    variants = [
        ("scatter", raster.resolve_zbuffer_scatter),
        ("tiled", lambda fr, pl, r, num_buffers: resolve_zbuffer_tiled(
            fr, pl, r, interpret=True, num_buffers=num_buffers)),
    ]
    for name, fn in variants:
        out, dw, cov = fn(frs, pls, R, num_buffers=B)
        assert out.shape == (B, R, R, 3)
        for b in range(B):
            so, sd, sc = singles[b]
            np.testing.assert_allclose(
                np.asarray(out[b]), np.asarray(so), atol=1e-5,
                err_msg=f"{name} payload[{b}]")
            np.testing.assert_allclose(
                np.asarray(dw[b]), np.asarray(sd), atol=1e-6,
                err_msg=f"{name} depth[{b}]")
            assert np.array_equal(np.asarray(cov[b]), np.asarray(sc)), (
                name, b)


@pytest.mark.parametrize("discard", [None, 1])
def test_batched_dense_raster_matches_per_sample(discard):
    rng = np.random.RandomState(0)
    B, V, T, R = 3, 40, 24, 64
    tris = jnp.asarray(rng.randint(0, V, (T, 3)).astype(np.int32))
    win, w, attrs = _random_verts(rng, B, V, -10, 74)
    npix = R * R

    batched = raster_dense.rasterize_tris_dense_batched(
        win, w, attrs, tris, R, discard_attr=discard, interpret=True)
    for b in range(B):
        s = raster_dense.rasterize_tris_dense(
            win[b], w[b], attrs[b], tris, R, discard_attr=discard,
            interpret=True)
        sl = slice(b * npix, (b + 1) * npix)
        for f in ("attrs", "depth", "front", "covered"):
            np.testing.assert_allclose(
                np.asarray(getattr(s, f)),
                np.asarray(getattr(batched, f)[sl]), atol=1e-5,
                err_msg=f"{f}[{b}]")


def test_batched_dense_raster_xla_form_matches_pallas():
    import os

    rng = np.random.RandomState(3)
    B, V, T, R = 3, 40, 24, 64
    # Per-sample topologies (the [B,T,3] form used for depth-mesh rings).
    tris = jnp.asarray(rng.randint(0, V, (B, T, 3)).astype(np.int32))
    win, w, attrs = _random_verts(rng, B, V, -10, 74)
    pall = raster_dense.rasterize_tris_dense_batched(
        win, w, attrs, tris, R, interpret=True)
    os.environ["IVID_TPU_SKIRT_IMPL"] = "xla"
    try:
        xla = raster_dense.rasterize_tris_dense_batched(win, w, attrs, tris, R)
    finally:
        os.environ["IVID_TPU_SKIRT_IMPL"] = "auto"
    for f in ("attrs", "depth", "front", "covered"):
        np.testing.assert_allclose(
            np.asarray(getattr(pall, f)), np.asarray(getattr(xla, f)),
            atol=1e-5, err_msg=f)


@pytest.mark.parametrize("skirt_mode", ["dense", "lattice"])
def test_render_simple_batch_matches_per_sample(skirt_mode, monkeypatch):
    monkeypatch.setenv("IVID_TPU_SKIRT", skirt_mode)
    rng = np.random.RandomState(5)
    B, S = 3, 32
    depth = jnp.asarray(rng.uniform(0.2, 0.9, (B, S, S, 1)).astype(np.float32))
    color = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32))
    mv0 = warp_ops.default_modelview()
    mvs = jnp.stack(
        [cam.orbit_modelview(0.15 * (b + 1), -0.1 * b) for b in range(B)])
    meshes = jax.vmap(
        lambda d: geom.depth_to_mesh(d, padding=S, fov=45.0, modelview=mv0)
    )(depth)
    batched = rend.render_simple_batch(
        meshes, color, mvs, 45.0, S * 3, 0.1, 200.0, has_skirt=True)
    for b in range(B):
        mesh_b = jax.tree.map(lambda x: x[b], meshes)
        single = rend.render_simple(
            mesh_b, color[b], mvs[b], 45.0, S * 3, 0.1, 200.0,
            has_skirt=True, raster_mode="hybrid")
        for k in ("color", "depth", "mask"):
            np.testing.assert_allclose(
                np.asarray(single[k]), np.asarray(batched[k][b]), atol=1e-5,
                err_msg=f"{k}[{b}]")


def test_batched_grid_raster_matches_per_sample():
    """The one-launch multi-buffer grid raster (aggregation slot batching)
    equals per-sample rasterize_grid_dense, Pallas-interpret form."""
    rng = np.random.RandomState(11)
    B, S, R = 3, 8, 64
    mv0 = warp_ops.default_modelview()
    proj = cam.perspective(45.0, 1.0, 0.1, 200.0)
    depth = jnp.asarray(rng.uniform(0.3, 0.8, (B, S, S, 1)).astype(np.float32))
    meshes = jax.vmap(
        lambda d: geom.depth_to_mesh(
            d, padding="frustum", fov=45.0, modelview=mv0, atol=0.02,
            rtol=0.02, cal_normal=True)
    )(depth)
    g = S + 2
    attrs = jax.vmap(rend._aggregation_attrs)(meshes)
    mvp = proj @ cam.orbit_modelview(0.2, 0.1)
    win, w = jax.vmap(
        lambda p: raster.project_vertices(p, mvp, R)
    )(meshes.positions)
    batched = raster_dense.rasterize_grid_dense_batched(
        win, w, attrs, meshes.positions, g, R, discard_attr=3,
        interpret=True)
    npix = R * R
    for b in range(B):
        s = raster_dense.rasterize_grid_dense(
            win[b], w[b], attrs[b], meshes.positions[b], g, R,
            discard_attr=3, interpret=True)
        sl = slice(b * npix, (b + 1) * npix)
        for f in ("attrs", "depth", "front", "covered"):
            np.testing.assert_allclose(
                np.asarray(getattr(s, f)),
                np.asarray(getattr(batched, f)[sl]), atol=1e-5,
                err_msg=f"{f}[{b}]")


def test_render_aggregation_batched_full_matches_scan(monkeypatch):
    """Full-raster render_aggregation (one batched slot launch) equals the
    per-view scan in hybrid mode up to raster-coverage deltas — and equals
    the per-view FULL-mode path exactly."""
    rng = np.random.RandomState(13)
    N, S = 4, 16
    mv0 = warp_ops.default_modelview()
    depth = jnp.asarray(rng.uniform(0.3, 0.8, (N, S, S, 1)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (N, S, S, 3)).astype(np.float32))
    mvs = jnp.stack(
        [cam.orbit_modelview(0.1 * i, 0.05 * i) for i in range(N)])
    meshes = jax.vmap(
        lambda d, mv: geom.depth_to_mesh(
            d, padding="frustum", fov=45.0, modelview=mv, atol=0.02,
            rtol=0.02, cal_normal=True)
    )(depth, mvs)
    valid = jnp.array([True, True, True, False])
    target = cam.orbit_modelview(0.15, 0.02)

    monkeypatch.setenv("IVID_TPU_RASTER_MODE", "full")
    full = rend.render_aggregation(
        meshes, colors, valid, target, 45.0, S * 3, 0.01, 200.0)

    # Per-view full path (force the scan by a non-grid-compatible dense_max).
    monkeypatch.setenv("IVID_TPU_DENSE_MAX_TRIS", "100000")
    monkeypatch.setenv("IVID_TPU_RASTER_MODE", "full")
    import ivid_tpu.ops.renderer as rmod

    bufs_scan = []
    proj = cam.perspective(45.0, 1.0, 0.01, 200.0)
    for i in range(N):
        mesh_i = jax.tree.map(lambda x: x[i], meshes)
        bufs_scan.append(rmod._aggregation_view_buffers(
            mesh_i, colors[i], target, proj, S * 3, 4, 192, True))
    bufs_batched = rmod._aggregation_view_buffers_all(
        meshes, colors, target, proj, S * 3)
    for i in range(N):
        for j, nm in enumerate(("rgb", "alpha", "depth")):
            np.testing.assert_allclose(
                np.asarray(bufs_scan[i][j]), np.asarray(bufs_batched[j][i]),
                atol=1e-5, err_msg=f"{nm}[{i}]")

    assert np.isfinite(np.asarray(full["color"]).sum())


def test_forward_backward_warp_batch_matches_per_sample():
    rng = np.random.RandomState(2)
    B, S = 3, 32
    rgbd = jnp.clip(
        jnp.asarray(rng.uniform(0, 1, (B, S, S, 4)).astype(np.float32)),
        0.01, 0.99)
    mv1 = jnp.stack(
        [cam.orbit_modelview(0.2 + 0.1 * b, 0.1 - 0.05 * b) for b in range(B)])
    batched = warp_ops.forward_backward_warp_batch(
        rgbd, mv1, padding=S, near=0.5, far=100.0)
    for b in range(B):
        single = warp_ops.forward_backward_warp(
            rgbd[b], mv1[b], padding=S, near=0.5, far=100.0)
        for k in ("color", "depth", "mask"):
            np.testing.assert_allclose(
                np.asarray(single[k]), np.asarray(batched[k][b]), atol=1e-5,
                err_msg=f"{k}[{b}]")


@pytest.mark.slow  # ~56s on the 1-core dev box; default tier budget is 20 min
def test_aggregate_conditions_batch_matches_per_sample(monkeypatch):
    """The one-launch sample-batched aggregation (render_aggregation_batch /
    aggregate_conditions_batch) equals per-sample aggregate_conditions in
    full-raster mode, including per-sample render cameras."""
    rng = np.random.RandomState(5)
    B, N, S = 3, 4, 16
    depth = jnp.asarray(rng.uniform(0.3, 0.8, (B, N, S, S, 1)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (B, N, S, S, 3)).astype(np.float32))
    src_mvs = jnp.stack(
        [cam.orbit_modelview(0.1 * i, 0.05 * i) for i in range(N)])
    meshes = jax.vmap(jax.vmap(
        lambda d, mv: geom.depth_to_mesh(
            d, padding="frustum", fov=45.0, modelview=mv, atol=0.02,
            rtol=0.02, cal_normal=True)
    ), in_axes=(0, None))(depth, src_mvs)
    valid = jnp.array([True, True, True, False])
    targets = jnp.stack(
        [cam.orbit_modelview(0.15 + 0.02 * b, 0.02 - 0.01 * b)
         for b in range(B)])

    monkeypatch.setenv("IVID_TPU_RASTER_MODE", "full")
    batched = warp_ops.aggregate_conditions_batch(
        meshes, colors, valid, targets, near=0.5, far=100.0)
    for b in range(B):
        single = warp_ops.aggregate_conditions(
            jax.tree.map(lambda x: x[b], meshes), colors[b], valid,
            targets[b], near=0.5, far=100.0)
        for k in single:
            np.testing.assert_allclose(
                np.asarray(single[k]), np.asarray(batched[k][b]), atol=1e-5,
                err_msg=f"{k}[{b}]")


def test_pipeline_agg_body_batch_mode_matches_map(monkeypatch):
    """ScenePipeline._agg_body in 'batch' mode (grouped one-launch rasters)
    equals 'map' mode, with a group size that does NOT divide the batch."""
    from ivid_tpu.diffusion import build_framework
    from ivid_tpu.inference.pipeline import ScenePipeline
    from ivid_tpu.models import build_adm_unet

    monkeypatch.setenv("IVID_TPU_RASTER_MODE", "full")
    monkeypatch.setenv("IVID_TPU_AGG_GROUP", "2")
    rng = np.random.RandomState(9)
    B, N, S = 3, 4, 16

    cfg = dict(image_size=S, in_channels=4, out_channels=4, model_channels=8,
               num_res_blocks=1, channel_mult=[1], attention_resolutions=[],
               num_groups=4, num_heads=1, num_head_channels=None,
               num_classes=None, has_null_class=False, dropout=0.0,
               use_fp16=False)
    model = build_adm_unet(cfg)
    fw = build_framework(
        "ClassifierFreeGuidance", model,
        {"timesteps": 100, "beta_schedule": "linear", "p_uncond": 0.1})
    pipe = ScenePipeline(
        fw, fw, image_size=S, max_views=N, steps_uncond=2, steps_cond=2,
        near=0.5, far=100.0, agg_batch_mode="batch")

    depth = jnp.asarray(rng.uniform(0.3, 0.8, (B, N, S, S, 1)).astype(np.float32))
    colors = jnp.asarray(rng.uniform(0, 1, (B, N, S, S, 3)).astype(np.float32))
    src_mvs = jnp.stack(
        [cam.orbit_modelview(0.1 * i, 0.05 * i) for i in range(N)])
    meshes = jax.vmap(jax.vmap(
        lambda d, mv: geom.depth_to_mesh(
            d, padding="frustum", fov=pipe.fov, modelview=mv, atol=pipe.atol,
            rtol=pipe.rtol, erode_rgb=pipe.erode_rgb, cal_normal=True)
    ), in_axes=(0, None))(depth, src_mvs)
    valid = jnp.array([True, True, True, False])
    targets = jnp.stack(
        [cam.orbit_modelview(0.15 + 0.02 * b, 0.02) for b in range(B)])

    got = pipe._agg_body(meshes, colors, valid, targets)
    pipe.agg_batch_mode = "map"
    want = pipe._agg_body(meshes, colors, valid, targets)
    for k in want:
        np.testing.assert_allclose(
            np.asarray(want[k]), np.asarray(got[k]), atol=1e-5,
            err_msg=k)
