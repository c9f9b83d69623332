"""Independent NumPy painter's-algorithm oracle for the aggregation renderer.

Every existing raster test is impl-vs-impl (scatter vs sorted vs tiled vs
dense) — a weighting or flag bug shared by all variants would pass them all.
This oracle implements the reference GL semantics LITERALLY, from the shader
sources, with none of the repo's raster machinery:

- per-view z-buffered triangle raster at exact pixel centers with
  perspective-correct varyings (GL default interpolation);
- the aggregation fragment shader verbatim (reference:
  rgbd_3d/shaders/aggregation.fsh:19-51): per-FRAGMENT weight
  ``exp(max(-20*acos(clamp(dot(dir, normal), 0, 1)), -50))`` from the
  interpolated world position/normal, the eroded (*1e-8) and padding/edge
  (=1e-16) clamps, backface-padding discard, zero-weight backface writes;
- the accumulation compute shader verbatim (aggregation.csh:14-49):
  weight_depth banding, the near-zero-weight depth-max branch, mask counters;
- the readback normalization (moderngl_renderer.py:318-331).

The repo path deliberately deviates in two measure-zero ways: the view-angle
weight is computed per VERTEX and interpolated (faces are ~pixel-scale), and
pixel-center-on-edge ties may fall either way. The assertions therefore allow
a small fraction of deviating pixels and bound the bulk error tightly — which
still catches any systematic weighting/flag/branch bug none of the
impl-vs-impl tests can.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ivid_tpu.ops import camera as cam
from ivid_tpu.ops import geometry as geom
from ivid_tpu.ops import renderer as rend


# ---------------------------------------------------------------------------
# Oracle
# ---------------------------------------------------------------------------

def _perspective(fov_deg, near, far):
    """glm.perspective, aspect 1 (reference: moderngl_renderer.py:296)."""
    t = 1.0 / np.tan(np.deg2rad(fov_deg) / 2.0)
    return np.array([
        [t, 0, 0, 0],
        [0, t, 0, 0],
        [0, 0, -(far + near) / (far - near), -2.0 * far * near / (far - near)],
        [0, 0, -1.0, 0],
    ], np.float64)


def _texture_nearest(color, uv):
    """GL_NEAREST + clamp-to-edge; v indexes texture rows directly."""
    s = color.shape[0]
    j = np.clip(np.floor(uv[..., 0] * s).astype(np.int64), 0, s - 1)
    i = np.clip(np.floor(uv[..., 1] * s).astype(np.int64), 0, s - 1)
    return color[i, j]


def _oracle_view(mesh, color, modelview, proj, R, weight_exponent=-20.0):
    """One view's raster + aggregation.fsh shading into its own z-buffer.

    Returns (rgb [R,R,3], weight [R,R], window depth [R,R]) in IMAGE row
    order (row 0 = top), matching the np.flip(axis=0) readback.
    """
    pos = np.asarray(mesh["positions"], np.float64)
    nrm = np.asarray(mesh["normal"], np.float64)
    uv = np.asarray(mesh["uv"], np.float64)
    flag = np.asarray(mesh["flag"], np.float64)
    faces = np.asarray(mesh["faces"])
    sample_cam = np.linalg.inv(np.asarray(mesh["modelview"], np.float64))[:3, 3]

    mvp = proj @ np.asarray(modelview, np.float64)
    h = np.concatenate([pos, np.ones((len(pos), 1))], 1) @ mvp.T
    w = h[:, 3]
    ndc = h[:, :3] / w[:, None]
    wx = (ndc[:, 0] + 1.0) * 0.5 * R
    wy = (ndc[:, 1] + 1.0) * 0.5 * R
    wd = (ndc[:, 2] + 1.0) * 0.5

    # flag bits -> varyings (aggregation.vsh:26-28)
    v_edge = np.mod(flag, 2.0)
    v_pad = np.mod(np.floor(flag / 2.0), 2.0)
    v_erod = np.mod(np.floor(flag / 4.0), 2.0)
    # All varyings: uv(2) edge pad erod pos(3) normal(3)
    varying = np.concatenate(
        [uv, v_edge[:, None], v_pad[:, None], v_erod[:, None], pos, nrm], 1)

    zbuf = np.ones((R, R))
    out_rgb = np.zeros((R, R, 3))
    out_wgt = np.zeros((R, R))
    covered = np.zeros((R, R), bool)

    for f in range(len(faces)):
        i0, i1, i2 = faces[f]
        fw = np.array([w[i0], w[i1], w[i2]])
        if np.any(fw <= 1e-6):  # whole-face near cull (repo contract)
            continue
        fx = np.array([wx[i0], wx[i1], wx[i2]])
        fy = np.array([wy[i0], wy[i1], wy[i2]])
        fd = np.array([wd[i0], wd[i1], wd[i2]])
        area2 = ((fx[1] - fx[0]) * (fy[2] - fy[0])
                 - (fy[1] - fy[0]) * (fx[2] - fx[0]))
        if area2 == 0.0:
            continue
        front = area2 > 0.0

        x0 = max(int(np.floor(fx.min() - 0.5)), 0)
        x1 = min(int(np.ceil(fx.max() - 0.5)), R - 1)
        y0 = max(int(np.floor(fy.min() - 0.5)), 0)
        y1 = min(int(np.ceil(fy.max() - 0.5)), R - 1)
        if x1 < x0 or y1 < y0:
            continue
        px, py = np.meshgrid(
            np.arange(x0, x1 + 1) + 0.5, np.arange(y0, y1 + 1) + 0.5)
        # Window-space barycentrics via edge functions.
        l0 = ((fx[1] - px) * (fy[2] - py) - (fy[1] - py) * (fx[2] - px)) / area2
        l1 = ((fx[2] - px) * (fy[0] - py) - (fy[2] - py) * (fx[0] - px)) / area2
        l2 = 1.0 - l0 - l1
        inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
        d = l0 * fd[0] + l1 * fd[1] + l2 * fd[2]
        inside &= (d >= 0.0) & (d <= 1.0)
        if not inside.any():
            continue

        # Perspective-correct varyings: interp(v/w) / interp(1/w).
        inv_w = 1.0 / fw
        den = l0 * inv_w[0] + l1 * inv_w[1] + l2 * inv_w[2]
        fvar = varying[[i0, i1, i2]]  # [3, A]
        num = (l0[..., None] * (fvar[0] * inv_w[0])
               + l1[..., None] * (fvar[1] * inv_w[1])
               + l2[..., None] * (fvar[2] * inv_w[2]))
        var = num / den[..., None]

        p_edge, p_pad, p_erod = var[..., 2], var[..., 3], var[..., 4]

        # Fragment shader (aggregation.fsh:19-51).
        if front:
            direction = sample_cam - var[..., 5:8]
            direction /= np.maximum(
                np.linalg.norm(direction, axis=-1, keepdims=True), 1e-12)
            n = var[..., 8:11]
            n /= np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
            cos = np.clip(np.sum(direction * n, -1), 0.0, 1.0)
            wgt = np.exp(np.maximum(weight_exponent * np.arccos(cos), -50.0))
            wgt = np.maximum(wgt, 1e-4)
            wgt = np.where(p_erod >= 0.999, wgt * 1e-8, wgt)
            wgt = np.where((p_pad > 0.001) | (p_edge > 0.999), 1e-16, wgt)
            wgt = np.maximum(wgt, 1e-16)
            rgb = _texture_nearest(np.asarray(color, np.float64), var[..., 0:2])
            keep = inside
        else:
            # Backface: padding fragments discard; others write (0,0,0,0)
            # but still depth-test/write (occluders).
            keep = inside & ~(p_pad > 0.001)
            wgt = np.zeros_like(d)
            rgb = np.zeros(d.shape + (3,))

        if not keep.any():
            continue
        sly, slx = slice(y0, y1 + 1), slice(x0, x1 + 1)
        winner = keep & (d < zbuf[sly, slx])
        zbuf[sly, slx] = np.where(winner, d, zbuf[sly, slx])
        out_wgt[sly, slx] = np.where(winner, wgt, out_wgt[sly, slx])
        out_rgb[sly, slx] = np.where(winner[..., None], rgb, out_rgb[sly, slx])
        covered[sly, slx] |= winner

    # GL window y is bottom-up; flip to image rows (readback np.flip(axis=0)).
    return (np.flip(out_rgb, 0), np.flip(out_wgt, 0), np.flip(zbuf, 0),
            np.flip(covered, 0))


def oracle_render_aggregation(meshes, colors, valid, modelview, fov, R,
                              near, far, weight_exponent=-20.0):
    """aggregation.csh accumulation + readback (moderngl_renderer.py:306-331)."""
    proj = _perspective(fov, near, far)
    acc_rgb = np.zeros((R, R, 3))
    acc_a = np.zeros((R, R))
    acc_d = np.zeros((R, R))
    acc_dw = np.zeros((R, R))
    acc_md = np.zeros((R, R))
    acc_mc = np.zeros((R, R))

    for i, mesh in enumerate(meshes):
        if not valid[i]:
            continue
        rgb, alpha, d, _ = _oracle_view(
            mesh, colors[i], modelview, proj, R, weight_exponent)

        weight_color = alpha
        weight_depth = np.where(alpha > 1e-14, 1.0,
                                np.where(alpha > 0.0, 1e-8, 0.0))
        mask_color = (alpha > 1e-6).astype(np.float64)
        mask_depth = (alpha > 1e-14).astype(np.float64)

        both_pad = (np.abs(acc_dw - 1e-8) < 1e-8) & (
            np.abs(weight_depth - 1e-8) < 1e-8)
        replace = both_pad & (d * 1e-8 > acc_d)

        def upd(acc, new, add):
            return np.where(replace, new, np.where(both_pad, acc, acc + add))

        contrib = rgb * weight_color[..., None]
        acc_rgb = np.where(replace[..., None], contrib,
                           np.where(both_pad[..., None], acc_rgb,
                                    acc_rgb + contrib))
        acc_a = upd(acc_a, weight_color, weight_color)
        acc_d = upd(acc_d, d * 1e-8, d * weight_depth)
        acc_dw = upd(acc_dw, 1e-8, weight_depth)
        acc_md = acc_md + mask_depth
        acc_mc = acc_mc + mask_color

    color = np.where(acc_a[..., None] > 0.0,
                     acc_rgb / np.maximum(acc_a[..., None], 1e-24), 0.0)
    depth_win = np.where(acc_dw > 0.0, acc_d / np.maximum(acc_dw, 1e-24), 0.0)
    depth = near * far / (far - depth_win * (far - near))
    return {
        "color": color,
        "depth": depth[..., None],
        "mask_color": (acc_mc > 0.5)[..., None],
        "mask_depth": (acc_md > 0.5)[..., None],
    }


# ---------------------------------------------------------------------------
# Scene + comparison
# ---------------------------------------------------------------------------

def _make_scene(seed, n_views, src):
    rng = np.random.RandomState(seed)
    # Smooth-ish depth with a discontinuity step so the eroded/edge flags and
    # the depth-max padding branch all get exercised.
    base = rng.uniform(0.45, 0.55, (n_views, 1, 1, 1))
    bump = rng.uniform(-0.1, 0.1, (n_views, src, src, 1))
    from scipy import ndimage  # smooth the bump to get tilted faces

    bump = ndimage.gaussian_filter(bump, (0, 2.0, 2.0, 0))
    depth = np.clip(base + bump, 0.3, 0.8).astype(np.float32)
    step = np.zeros_like(depth)
    step[:, src // 3: 2 * src // 3, src // 2:] = 0.15
    depth = np.clip(depth + step, 0.3, 0.95).astype(np.float32)
    colors = rng.uniform(0, 1, (n_views, src, src, 3)).astype(np.float32)
    mvs = np.stack([
        np.asarray(cam.orbit_modelview(0.25 * i - 0.2, 0.12 * i - 0.1))
        for i in range(n_views)
    ])
    meshes = jax.vmap(
        lambda d, mv: geom.depth_to_mesh(
            d, padding="frustum", fov=45.0, modelview=mv, atol=0.03,
            rtol=0.03, cal_normal=True)
    )(jnp.asarray(depth), jnp.asarray(mvs))
    return meshes, jnp.asarray(colors)


def _mesh_dicts(meshes, n):
    out = []
    for i in range(n):
        out.append({
            k: np.asarray(getattr(meshes, k)[i])
            for k in ("positions", "uv", "flag", "normal", "faces", "modelview")
        })
    return out


@pytest.mark.parametrize(
    "src,render_size",
    [
        (48, 128),
        # Production aggregation aspect: 128² sources rastered at 384²
        # (reference: datasets/base.py warp resolution / sample.py 3x9).
        pytest.param(128, 384, marks=pytest.mark.slow),
    ],
)
def test_render_aggregation_matches_glsl_oracle(monkeypatch, src, render_size):
    """The repo's per-vertex weight interpolation is only claimed valid at
    production face scale (~render_size/src ≈ 3 px); test at that aspect."""
    n_views = 3
    near, far, fov = 0.01, 200.0, 45.0
    meshes, colors = _make_scene(7, n_views, src)
    valid = jnp.array([True, True, False])
    target = cam.orbit_modelview(0.12, 0.05)

    monkeypatch.setenv("IVID_TPU_RASTER_MODE", "full")
    got = rend.render_aggregation(
        meshes, colors, valid, target, fov, render_size, near, far)
    got = {k: np.asarray(v) for k, v in got.items()}

    want = oracle_render_aggregation(
        _mesh_dicts(meshes, n_views), np.asarray(colors), np.asarray(valid),
        np.asarray(target), fov, render_size, near, far)

    npix = render_size * render_size
    # Masks: identical up to edge-tie pixels.
    for k in ("mask_color", "mask_depth"):
        frac = np.mean(got[k] != want[k])
        assert frac < 0.01, (k, frac)

    # Color: tight in the bulk on agreed-covered pixels; a small tail of
    # edge-tie / weight-interp pixels may deviate.
    agree = (got["mask_color"] & want["mask_color"])[..., 0]
    assert agree.mean() > 0.5  # the scene must actually cover the frame
    derr = np.abs(got["color"] - want["color"]).max(-1)[agree]
    assert np.quantile(derr, 0.99) < 0.05, np.quantile(derr, 0.99)
    assert derr.mean() < 0.005, derr.mean()

    # Depth: linearized metric depth, relative error on agreed pixels.
    agree_d = (got["mask_depth"] & want["mask_depth"])[..., 0]
    rel = (np.abs(got["depth"] - want["depth"])
           / np.maximum(np.abs(want["depth"]), 1e-6))[..., 0][agree_d]
    assert np.quantile(rel, 0.99) < 0.02, np.quantile(rel, 0.99)
    assert rel.mean() < 1e-3, rel.mean()


def test_oracle_weight_sensitivity():
    """The gate has teeth: re-run the oracle with a wrong weight exponent
    (-10 instead of the shader's -20, aggregation.fsh:33) and confirm the
    color diff exceeds the main test's tolerances."""
    n_views, src, R = 3, 48, 128
    near, far, fov = 0.01, 200.0, 45.0
    meshes, colors = _make_scene(7, n_views, src)
    valid = np.array([True, True, False])
    target = np.asarray(cam.orbit_modelview(0.12, 0.05))
    dicts = _mesh_dicts(meshes, n_views)

    want = oracle_render_aggregation(
        dicts, np.asarray(colors), valid, target, fov, R, near, far)
    got = oracle_render_aggregation(
        dicts, np.asarray(colors), valid, target, fov, R, near, far,
        weight_exponent=-10.0)
    agree = (got["mask_color"] & want["mask_color"])[..., 0]
    derr = np.abs(got["color"] - want["color"]).max(-1)[agree]
    assert derr.mean() > 0.005 or np.quantile(derr, 0.99) > 0.05, (
        derr.mean(), np.quantile(derr, 0.99))
