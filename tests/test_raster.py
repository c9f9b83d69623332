"""Rasterizer and renderer tests.

Includes a port of the reference's only executable test — the textured-quad
smoke test (reference: rgbd_3d/moderngl_renderer.py:343-391) — plus identity
round-trip tests for the warp and aggregation pipelines that the reference
never had (SURVEY.md §4).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ivid_tpu.ops import camera as cam
from ivid_tpu.ops import geometry as geom
from ivid_tpu.ops import renderer as rend
from ivid_tpu.ops import warp
from ivid_tpu.ops.geometry import Mesh


def _quad_mesh(flag_value: float) -> Mesh:
    """The reference smoke-test quad: [-1,1]^2 at z=0 with a 2x2 texture
    (reference: moderngl_renderer.py:352-377)."""
    return Mesh(
        positions=jnp.array(
            [[-1, -1, 0], [1, -1, 0], [1, 1, 0], [-1, 1, 0]], jnp.float32
        ),
        uv=jnp.array([[0, 0], [1, 0], [1, 1], [0, 1]], jnp.float32),
        flag=jnp.full((4,), flag_value),
        normal=jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (4, 1)),
        faces=jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32),
        depth=jnp.zeros((2, 2, 1)),
        modelview=cam.look_at(
            jnp.array([0.0, 0.0, 1.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
        ),
        fov=90.0,
    )


TEX = jnp.array(
    [[[1, 0, 0], [0, 1, 0]], [[0, 0, 1], [1, 1, 0]]], jnp.float32
)  # row 0: red, green; row 1: blue, yellow


def test_quad_smoke():
    """fov-90 camera at distance 1 sees the quad exactly filling the frame; the
    2x2 texture quarters the image. Texture v=1 is image-top after readback flip."""
    mesh = _quad_mesh(flag_value=0.0)
    mv = mesh.modelview
    res = rend.render_simple(
        mesh, TEX, mv, fov=90.0, render_size=64, near=0.1, far=200.0,
        interior_level=96, has_skirt=False,
    )
    color = np.asarray(res["color"])
    mask = np.asarray(res["mask"])
    depth = np.asarray(res["depth"])
    # Quadrants (sample away from boundaries).
    np.testing.assert_allclose(color[8, 8], [0, 0, 1], atol=1e-5)  # top-left: blue
    np.testing.assert_allclose(color[8, 56], [1, 1, 0], atol=1e-5)  # top-right: yellow
    np.testing.assert_allclose(color[56, 8], [1, 0, 0], atol=1e-5)  # bottom-left: red
    np.testing.assert_allclose(color[56, 56], [0, 1, 0], atol=1e-5)  # bottom-right: green
    assert mask[4:60, 4:60].mean() > 0.99
    # Eye depth of the quad plane is 1.
    np.testing.assert_allclose(depth[4:60, 4:60], 1.0, atol=1e-3)


def test_quad_edge_flag_zeroes_mask():
    """All-edge flags: alpha=0 (mask empty) but color still rasterizes
    (reference: shaders/simple.fsh:13-18 writes color with alpha 0|1)."""
    mesh = _quad_mesh(flag_value=1.0)
    res = rend.render_simple(
        mesh, TEX, mesh.modelview, fov=90.0, render_size=64,
        interior_level=96, has_skirt=False,
    )
    assert not np.asarray(res["mask"]).any()
    np.testing.assert_allclose(np.asarray(res["color"])[32, 8], [1, 0, 0], atol=1e-5)


def test_quad_backface():
    """From behind, fragments are backfacing: alpha=0 everywhere."""
    mesh = _quad_mesh(flag_value=0.0)
    mv = cam.look_at(
        jnp.array([0.0, 0.0, -1.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    res = rend.render_simple(
        mesh, TEX, mv, fov=90.0, render_size=64, interior_level=96, has_skirt=False
    )
    assert not np.asarray(res["mask"]).any()
    # Depth still written (simple.fsh does not discard backfaces).
    assert (np.asarray(res["depth"])[16:48, 16:48] < 100).all()
    # Backface-won pixels are BLACK, not textured (simple.fsh:13-15 writes
    # vec4(0,0,0,0)) — unlike edge-flagged front faces, which keep texture.
    assert (np.asarray(res["color"]) == 0).all()


def test_occlusion():
    """A nearer quad must occlude a farther full-frame plane."""
    # Far plane: a realistic grid mesh at constant camera-space depth 2
    # (identity modelview → camera at origin), filling the fov-90 frame.
    far_mesh = geom.depth_to_mesh(jnp.full((32, 32, 1), 2.0), fov=90.0)
    # Near plane: smaller grid mesh at depth 1 built with fov 45 → covers only
    # the central tan(22.5°)/tan(45°) ≈ 41% of the fov-90 frame.
    near_mesh = geom.depth_to_mesh(jnp.full((32, 32, 1), 1.0), fov=45.0)
    nv = far_mesh.num_vertices
    mesh = Mesh(
        positions=jnp.concatenate([far_mesh.positions, near_mesh.positions]),
        uv=jnp.concatenate([far_mesh.uv, near_mesh.uv]),
        flag=jnp.concatenate([far_mesh.flag, near_mesh.flag]),
        normal=None,
        faces=jnp.concatenate([far_mesh.faces, near_mesh.faces + nv]),
        depth=far_mesh.depth,
        modelview=jnp.eye(4),
        fov=90.0,
    )
    white = jnp.ones((2, 2, 3))
    res = rend.render_simple(
        mesh, white, jnp.eye(4), fov=90.0, render_size=64,
        interior_level=8, has_skirt=False,
    )
    d = np.asarray(res["depth"])
    # Center: near plane (≈ px 19..45) wins.
    np.testing.assert_allclose(d[28:36, 28:36], 1.0, atol=1e-2)
    # Margin: far plane only.
    np.testing.assert_allclose(d[4, 28:36], 2.0, atol=2e-2)


def _checker_rgbd(s: int) -> jnp.ndarray:
    rng = np.random.default_rng(0)
    i, j = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    checker = ((i // 4 + j // 4) % 2).astype(np.float32)
    color = np.stack([checker, 1 - checker, 0.5 * np.ones_like(checker)], -1)
    depth = np.full((s, s, 1), 0.5, np.float32)  # z_buffer-stored mid depth
    return jnp.asarray(np.concatenate([color, depth], axis=-1))


def test_forward_backward_warp_identity():
    """Warping to the SAME view must reproduce the input nearly exactly."""
    s = 32
    rgbd = _checker_rgbd(s)
    mv = warp.default_modelview()
    res = warp.forward_backward_warp(
        rgbd, mv, mv, padding=s, fov=45.0, near=0.5, far=100.0
    )
    mask = np.asarray(res["mask"])
    assert mask[2:-2, 2:-2].mean() > 0.98
    color_err = np.abs(np.asarray(res["color"]) - np.asarray(rgbd[..., :3]))
    assert (color_err * mask)[2:-2, 2:-2].mean() < 0.08
    depth_err = np.abs(np.asarray(res["depth"]) - np.asarray(rgbd[..., 3:]))
    assert (depth_err * mask)[2:-2, 2:-2].mean() < 0.02


def test_forward_backward_warp_novel_view():
    """A modest orbit produces a mostly-covered, mostly-consistent warp."""
    s = 32
    rgbd = _checker_rgbd(s)
    mv1 = cam.orbit_modelview(0.15, 0.08)
    res = warp.forward_backward_warp(rgbd, mv1, padding=s)
    mask = np.asarray(res["mask"])
    assert 0.5 < mask.mean() <= 1.0
    # Flat plane, modest rotation: unmasked depth stays near the plane.
    d = np.asarray(res["depth"])
    assert abs((d[mask[..., 0] > 0]).mean() - 0.5) < 0.1


def test_aggregate_conditions_identity():
    """Aggregating a single view rendered from its own pose reproduces it."""
    s = 32
    rgbd = _checker_rgbd(s)
    mv = warp.default_modelview()
    mesh = geom.depth_to_mesh(
        geom.linearize_depth(rgbd[..., 3:], 0.5, 100.0),
        padding="frustum", fov=45.0, modelview=mv,
        atol=0.03, rtol=0.03, erode_rgb=3, cal_normal=True,
    )
    meshes = rend.stack_meshes([mesh, jax.tree.map(jnp.zeros_like, mesh)])
    colors = jnp.stack([rgbd[..., :3], jnp.zeros((s, s, 3))])
    valid = jnp.array([True, False])
    res = warp.aggregate_conditions(
        meshes, colors, valid, mv, fov=45.0, near=0.5, far=100.0,
        atol=0.03, rtol=0.03, erode_rgb=3,
    )
    mask = np.asarray(res["mask"])
    assert mask[3:-3, 3:-3].mean() > 0.95
    err = np.abs(np.asarray(res["color"]) - np.asarray(rgbd[..., :3]))
    mrgb = np.asarray(res["mask_rgb"])
    assert (err * mrgb)[3:-3, 3:-3].mean() < 0.05
    derr = np.abs(np.asarray(res["depth"]) - np.asarray(rgbd[..., 3:]))
    assert (derr * mask)[3:-3, 3:-3].mean() < 0.02
    # depth_convex covers at least the masked region.
    assert np.isfinite(np.asarray(res["depth_convex"])).all()


def test_aggregation_two_views():
    """Two views of the same plane fuse consistently from a third pose."""
    s = 32
    rgbd = _checker_rgbd(s)
    mv0 = warp.default_modelview()
    mv1 = cam.orbit_modelview(0.3, 0.0)
    target = cam.orbit_modelview(0.15, 0.0)
    make = lambda mv: geom.depth_to_mesh(
        geom.linearize_depth(rgbd[..., 3:], 0.5, 100.0),
        padding="frustum", fov=45.0, modelview=mv,
        atol=0.03, rtol=0.03, erode_rgb=3, cal_normal=True,
    )
    meshes = rend.stack_meshes([make(mv0), make(mv1)])
    colors = jnp.stack([rgbd[..., :3]] * 2)
    res = warp.aggregate_conditions(
        meshes, colors, jnp.array([True, True]), target,
        fov=45.0, near=0.5, far=100.0, atol=0.03, rtol=0.03, erode_rgb=3,
    )
    assert np.asarray(res["mask"]).mean() > 0.5
    assert np.isfinite(np.asarray(res["color"])).all()


def test_tiled_resolve_matches_scatter():
    """The tile-parallel Pallas resolve (sort-binned, dense depth test + MXU
    winner matmul) must reproduce the scatter resolve exactly — including
    depth ties (tie-averaged) and invalid fragments."""
    from ivid_tpu.ops import raster
    from ivid_tpu.ops.raster_tiled import resolve_zbuffer_tiled

    r = 64
    npix = r * r
    n = 20000
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
    pix = jax.random.randint(k1, (n,), 0, npix, dtype=jnp.int32)
    d = jnp.round(jax.random.uniform(k2, (n,)), 2)  # coarse depths force ties
    pay = jax.random.uniform(k3, (n, 3))
    valid = jax.random.uniform(k4, (n,)) > 0.1
    fb = raster.FragmentBatch(pixel=pix, depth=d, attrs=pay, front=valid, valid=valid)

    o1, d1, c1 = raster.resolve_zbuffer_scatter([fb], [pay], r)
    o2, d2, c2 = resolve_zbuffer_tiled([fb], [pay], r, interpret=True)
    assert bool(jnp.all(c1 == c2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=0)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)


def test_tiled_resolve_empty_and_dense_tiles():
    """Degenerate distributions: zero fragments in most tiles, thousands
    stacked on one pixel (dynamic chunk-loop correctness)."""
    from ivid_tpu.ops import raster
    from ivid_tpu.ops.raster_tiled import resolve_zbuffer_tiled

    r = 64
    n = 8192
    # All fragments on one pixel; depth decreasing so the LAST is nearest.
    pix = jnp.full((n,), 7 * r + 3, jnp.int32)
    d = jnp.linspace(1.0, 0.25, n)
    pay = jnp.stack([jnp.linspace(0, 1, n)] * 3, -1)
    valid = jnp.ones((n,), bool)
    fb = raster.FragmentBatch(pixel=pix, depth=d, attrs=pay, front=valid, valid=valid)
    o, dw, c = resolve_zbuffer_tiled([fb], [pay], r, interpret=True)
    assert int(jnp.sum(c)) == 1
    assert np.isclose(float(dw[r - 1 - 7, 3]), 0.25)
    np.testing.assert_allclose(np.asarray(o[r - 1 - 7, 3]), [1, 1, 1], atol=1e-6)
    # No valid fragments at all.
    fb0 = fb._replace(valid=jnp.zeros((n,), bool))
    o0, dw0, c0 = resolve_zbuffer_tiled([fb0], [pay], r, interpret=True)
    assert not bool(jnp.any(c0))
    np.testing.assert_allclose(np.asarray(dw0), 1.0)


def test_tiled_resolve_via_renderer(monkeypatch):
    """End-to-end: render_simple through the tiled resolve matches scatter."""
    mesh = _quad_mesh(flag_value=0.0)
    res_scatter = rend.render_simple(
        mesh, TEX, mesh.modelview, fov=90.0, render_size=64, near=0.1,
        far=200.0, interior_level=24, has_skirt=False,
    )
    monkeypatch.setenv("IVID_TPU_RASTER", "tiled")
    res_tiled = rend.render_simple(
        mesh, TEX, mesh.modelview, fov=90.0, render_size=64, near=0.1,
        far=200.0, interior_level=24, has_skirt=False,
    )
    for k in ("color", "depth", "mask"):
        np.testing.assert_allclose(
            np.asarray(res_scatter[k], np.float32),
            np.asarray(res_tiled[k], np.float32), atol=1e-5,
        )


def test_interior_lattice_covers_ssaa():
    """The fragment sample lattice must be at least as dense as the SSAA
    factor: a flat full-frame mesh rendered at k x SSAA with
    interior_level=k+1 covers every interior pixel (a GL rasterizer covers
    analytically; the sample-based raster needs <=1px sample spacing)."""
    mesh = geom.depth_to_mesh(jnp.full((32, 32, 1), 2.0), fov=90.0)
    white = jnp.ones((2, 2, 3))
    for ssaa in (3, 5):
        res = rend.render_simple(
            mesh, white, jnp.eye(4), fov=90.0, render_size=32 * ssaa,
            interior_level=ssaa + 1, has_skirt=False,
        )
        m = np.asarray(res["mask"])[8:-8, 8:-8]
        assert m.mean() == 1.0, f"holes at ssaa={ssaa}: {m.mean():.3f}"


def test_skirt_dense_matches_lattice(monkeypatch):
    """The dense per-pixel skirt pass must agree with the round-2 quad-lattice
    sampler wherever the lattice had coverage (dense is the exact pixel-center
    raster; the lattice under-covers stretched quads, so dense may add pixels
    but mask disagreement must stay small and valued outputs must match)."""
    s = 32
    rgbd = _checker_rgbd(s)
    mv0 = warp.default_modelview()
    target = cam.orbit_modelview(0.35, 0.12)
    mesh = geom.depth_to_mesh(
        geom.linearize_depth(rgbd[..., 3:], 0.5, 100.0),
        padding="frustum", fov=45.0, modelview=mv0,
        atol=0.03, rtol=0.03, erode_rgb=3, cal_normal=True,
    )
    meshes = rend.stack_meshes([mesh])
    colors = rgbd[None, ..., :3]
    valid = jnp.array([True])

    def run():
        return jax.device_get(warp.aggregate_conditions(
            meshes, colors, valid, target, fov=45.0, near=0.5, far=100.0,
            atol=0.03, rtol=0.03, erode_rgb=3,
        ))

    monkeypatch.setenv("IVID_TPU_SKIRT", "dense")
    dense = run()
    monkeypatch.setenv("IVID_TPU_SKIRT", "lattice")
    lattice = run()

    npix = s * s
    for key in ["mask", "mask_rgb"]:
        flip = np.abs(np.asarray(dense[key]) - np.asarray(lattice[key]))
        assert flip.mean() < 0.04, (key, flip.mean())
    both = (np.asarray(dense["mask"]) * np.asarray(lattice["mask"]))[..., 0] > 0
    for key in ["color", "depth"]:
        d = np.abs(np.asarray(dense[key]) - np.asarray(lattice[key]))
        assert d[both].mean() < 0.02, (key, d[both].mean())


def test_full_dense_matches_hybrid(monkeypatch):
    """IVID_TPU_RASTER_MODE=full (whole mesh through the per-pixel dense
    raster, no fragments) must agree with the hybrid fragment pipeline:
    full is exact pixel-center coverage, the lattice under-covers stretched
    quads, so coverage may grow slightly but valued outputs must match.
    Color uses a smooth gradient: at hard texel boundaries the two paths'
    half-pixel uv sampling offsets legitimately flip the nearest texel
    (measured: depth/mask identical, checker color flips on boundary px)."""
    s = 32
    i, j = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    grad = (i + j).astype(np.float32) / (2 * s)
    color = np.stack([grad, 1 - grad, 0.5 * np.ones_like(grad)], -1)
    rgbd = jnp.asarray(np.concatenate(
        [color, np.full((s, s, 1), 0.5, np.float32)], axis=-1
    ))
    mv0 = warp.default_modelview()
    target = cam.orbit_modelview(0.3, 0.1)
    mesh = geom.depth_to_mesh(
        geom.linearize_depth(rgbd[..., 3:], 0.5, 100.0),
        padding="frustum", fov=45.0, modelview=mv0,
        atol=0.03, rtol=0.03, erode_rgb=3, cal_normal=True,
    )
    meshes = rend.stack_meshes([mesh])
    colors = rgbd[None, ..., :3]
    valid = jnp.array([True])

    def run():
        return jax.device_get(warp.aggregate_conditions(
            meshes, colors, valid, target, fov=45.0, near=0.5, far=100.0,
            atol=0.03, rtol=0.03, erode_rgb=3,
        ))

    monkeypatch.setenv("IVID_TPU_RASTER_MODE", "full")
    full = run()
    monkeypatch.setenv("IVID_TPU_RASTER_MODE", "hybrid")
    hybrid = run()

    for key in ["mask", "mask_rgb"]:
        flip = np.abs(np.asarray(full[key]) - np.asarray(hybrid[key]))
        assert flip.mean() < 0.04, (key, flip.mean())
    both = (np.asarray(full["mask"]) * np.asarray(hybrid["mask"]))[..., 0] > 0
    for key in ["color", "depth"]:
        d = np.abs(np.asarray(full[key]) - np.asarray(hybrid[key]))
        assert d[both].mean() < 0.02, (key, d[both].mean())


def test_full_dense_render_simple(monkeypatch):
    """Full-dense render_simple on the reference quad reproduces the exact
    quadrant colors (no fragments at all in this mode)."""
    monkeypatch.setenv("IVID_TPU_RASTER_MODE", "full")
    mesh = _quad_mesh(flag_value=0.0)
    res = rend.render_simple(
        mesh, TEX, mesh.modelview, fov=90.0, render_size=64, near=0.1,
        far=200.0, interior_level=96, has_skirt=False,
    )
    color = np.asarray(res["color"])
    mask = np.asarray(res["mask"])
    np.testing.assert_allclose(color[8, 8], [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(color[8, 56], [1, 1, 0], atol=1e-5)
    np.testing.assert_allclose(color[56, 8], [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(color[56, 56], [0, 1, 0], atol=1e-5)
    assert mask[8:-8, 8:-8].all()
