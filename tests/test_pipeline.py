"""End-to-end tests of the multiview scene pipeline, scene IO, and viewsets."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ivid_tpu.diffusion import build_framework
from ivid_tpu.inference.pipeline import ScenePipeline, _slot_bucket
from ivid_tpu.inference.scene_io import load_first_view, load_scene, save_scene
from ivid_tpu.inference.viewsets import REORDER_3X9, build_viewset, reorder
from ivid_tpu.models import build_adm_unet

BACKBONE_U = dict(
    image_size=32, in_channels=4, out_channels=4, model_channels=32,
    num_res_blocks=1, channel_mult=[1, 2], attention_resolutions=[16],
    num_groups=8, num_heads=None, num_head_channels=16,
    num_classes=None, has_null_class=False, dropout=0.0, use_fp16=False,
)
BACKBONE_C = dict(BACKBONE_U, in_channels=10)


def _make_pipeline(steps_uncond=5, steps_cond=4):
    mu = build_adm_unet(BACKBONE_U)
    mc = build_adm_unet(BACKBONE_C)
    # T=100: a 20-step linear schedule would hit beta=1.0 (alpha_bar=0).
    fa = {"timesteps": 100, "beta_schedule": "linear"}
    fwu = build_framework("GaussianDiffusion", mu, fa)
    fwc = build_framework(
        "InpaintCFG", mc, {**fa, "p_uncond": 0.1, "p_uncond_img": 0}
    )

    def init(m, c):
        return m.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, c)),
            jnp.zeros((1,), jnp.int32),
        )["params"]

    pu, pc = init(mu, 4), init(mc, 10)
    pipe = ScenePipeline(
        fwu, fwc, image_size=32, max_views=4,
        steps_uncond=steps_uncond, steps_cond=steps_cond, guidance=0.0,
    )
    return pipe, pu, pc


def test_slot_bucket(monkeypatch):
    # mult4 default: 7 compiled shapes, Σ=390 uncapped slot-rasters on 3x9.
    assert [_slot_bucket(i, 27) for i in [1, 2, 3, 4, 5, 9, 17, 26]] == [
        4, 4, 4, 4, 8, 12, 20, 27,
    ]
    monkeypatch.setenv("IVID_TPU_SLOT_BUCKETS", "pow2")
    assert [_slot_bucket(i, 27) for i in [1, 2, 3, 4, 5, 9, 17, 26]] == [
        1, 2, 4, 4, 8, 16, 27, 27,
    ]
    monkeypatch.setenv("IVID_TPU_SLOT_BUCKETS", "exact")
    assert [_slot_bucket(i, 27) for i in [1, 5, 26]] == [1, 5, 26]


def test_pipeline_multiview(tmp_path):
    pipe, pu, pc = _make_pipeline()
    views = np.stack([np.asarray(v) for v in build_viewset("3x9", 1)[:3]])
    state, samples, conds = pipe.sample_batch(
        pu, pc, jax.random.PRNGKey(0), views, batch=2
    )
    assert samples.shape == (2, 3, 32, 32, 4)
    assert np.isfinite(np.asarray(samples)).all()
    assert conds["color"].shape == (2, 2, 32, 32, 3)
    assert state.valid[:3].all() and not state.valid[3:].any()

    # Scene IO round trip in the reference npz layout.
    meshes, colors = pipe.state_to_host_scene(state, 0, 3)
    path = str(tmp_path / "scene.npz")
    save_scene(path, meshes, colors)
    m2, c2 = load_scene(path)
    assert len(m2) == 3 and len(c2) == 3
    # PNG storage clips to [0,1] (reference save_scene does the same to8b clip).
    np.testing.assert_allclose(
        c2[0], np.clip(colors[0], 0, 1), atol=1 / 255 + 1e-6
    )
    # Depth stored losslessly (float32 bits through RGBA8 PNG).
    np.testing.assert_array_equal(
        np.asarray(m2[0].depth), np.asarray(meshes[0].depth)
    )
    np.testing.assert_allclose(
        np.asarray(m2[0].modelview), np.asarray(meshes[0].modelview), atol=1e-6
    )
    fv = load_first_view(path)
    assert fv.shape == (32, 32, 4)


@pytest.mark.slow  # ~58s on the 1-core dev box; default tier budget is 20 min
def test_fused_cond_view_matches_separate_dispatches(monkeypatch):
    # The fused single-dispatch cond-view program (agg + guided DDIM,
    # IVID_TPU_FUSED_COND_VIEW) must produce the same samples/conds as the
    # separate agg/DDIM dispatches it replaces.
    views = np.stack([np.asarray(v) for v in build_viewset("3x9", 1)[:2]])

    def run(flag):
        monkeypatch.setenv("IVID_TPU_FUSED_COND_VIEW", flag)
        pipe, pu, pc = _make_pipeline()
        assert pipe._fused_cond == (flag == "1")
        _, samples, conds = pipe.sample_batch(
            pu, pc, jax.random.PRNGKey(7), views, batch=1
        )
        return np.asarray(samples), np.asarray(conds["color"])

    s1, c1 = run("1")
    s0, c0 = run("0")
    np.testing.assert_allclose(s1, s0, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(c1, c0, atol=1e-5, rtol=1e-5)


def test_pipeline_per_sample_views():
    pipe, pu, pc = _make_pipeline(steps_uncond=3, steps_cond=2)
    views = build_viewset("random", 2, np.random.default_rng(0))
    views = np.asarray([np.stack(v) for v in views])
    assert views.shape == (2, 2, 4, 4)
    _, samples, _ = pipe.sample_batch(pu, pc, jax.random.PRNGKey(0), views, batch=2)
    assert samples.shape == (2, 2, 32, 32, 4)


def test_viewsets():
    assert len(build_viewset("uncond", 5)) == 1
    assert len(build_viewset("3x9", 5)) == 27
    rv = build_viewset("random", 3)
    assert len(rv) == 3 and len(rv[0]) == 2
    assert sorted(REORDER_3X9) == list(range(27))
    imgs = np.arange(27)[:, None, None, None] * np.ones((1, 4, 4, 3))
    out = reorder(imgs)
    assert out.shape == (27, 4, 4, 3)
    assert out[13, 0, 0, 0] == 0  # canonical view lands at grid center
    out26 = reorder(imgs[1:])
    assert out26.shape == (27, 4, 4, 3)
    assert (out26[13] == -1).all()  # placeholder first view


def test_pipeline_data_parallel():
    """Batch sharded over the 8-device CPU mesh; vmapped aggregation."""
    import jax

    pipe, pu, pc = _make_pipeline(steps_uncond=3, steps_cond=2)
    pipe_dp = ScenePipeline(
        pipe.fw_uncond, pipe.fw_cond, image_size=32, max_views=4,
        steps_uncond=3, steps_cond=2, guidance=0.0, data_parallel=True,
    )
    views = np.stack([np.asarray(v) for v in build_viewset("3x9", 1)[:2]])
    state, samples, _ = pipe_dp.sample_batch(
        pu, pc, jax.random.PRNGKey(0), views, batch=8
    )
    assert samples.shape == (8, 2, 32, 32, 4)
    assert np.isfinite(np.asarray(samples)).all()
    assert pipe_dp.mesh.shape["data"] == 8


def test_select_nearest_views():
    from ivid_tpu.inference.pipeline import select_nearest_views
    from ivid_tpu.ops import camera as cam

    # Views at yaw angles 0, 0.1, 0.5, 0.9, and a novel view at 0.85:
    # nearest two priors are slots 3 (0.9) and 2 (0.5).
    yaws = [0.0, 0.1, 0.5, 0.9, 0.85]
    mvs = np.stack([np.asarray(cam.orbit_modelview(y, 0.0)) for y in yaws])
    idx = select_nearest_views(mvs[None], j=4, k=2)
    assert idx.shape == (1, 2)
    assert set(idx[0].tolist()) == {3, 2}
    # per-sample selection with differing viewsets
    mvs2 = np.stack([np.asarray(cam.orbit_modelview(y, 0.0)) for y in [0.9, 0.1, 0.5, 0.0, 0.05]])
    idx2 = select_nearest_views(np.stack([mvs, mvs2]), j=4, k=2)
    assert set(idx2[0].tolist()) == {3, 2}
    assert set(idx2[1].tolist()) == {1, 4 - 1}  # slots 1 (0.1) and 3 (0.0)


@pytest.mark.slow  # ~90s on the 1-core dev box; default tier budget is 20 min
def test_pipeline_max_agg_views():
    """Capping aggregation at K >= live views must be exactly the uncapped
    run; a tighter cap still produces a full valid scene."""
    pipe, pu, pc = _make_pipeline()
    views = np.stack([np.asarray(v) for v in build_viewset("3x9", 1)[:4]])
    rng = jax.random.PRNGKey(0)
    noise = jax.random.normal(jax.random.PRNGKey(7), (2, 32, 32, 4))
    _, samples_all, _ = pipe.sample_batch(
        pu, pc, rng, views, batch=2, noise=noise
    )

    mu = pipe.fw_uncond
    pipe_capped = ScenePipeline(
        pipe.fw_uncond, pipe.fw_cond, image_size=32, max_views=4,
        steps_uncond=5, steps_cond=4, guidance=0.0, max_agg_views=3,
    )
    _, samples_cap3, _ = pipe_capped.sample_batch(
        pu, pc, rng, views, batch=2, noise=noise
    )
    # K=3 >= every live-prior count (j<=3) -> must match uncapped exactly.
    np.testing.assert_allclose(
        np.asarray(samples_all), np.asarray(samples_cap3), atol=1e-5
    )

    pipe_cap1 = ScenePipeline(
        pipe.fw_uncond, pipe.fw_cond, image_size=32, max_views=4,
        steps_uncond=5, steps_cond=4, guidance=0.0, max_agg_views=1,
    )
    _, samples_cap1, _ = pipe_cap1.sample_batch(
        pu, pc, rng, views, batch=2, noise=noise
    )
    assert samples_cap1.shape == samples_all.shape
    assert np.isfinite(np.asarray(samples_cap1)).all()


@pytest.mark.parametrize(
    "cap", [None, pytest.param(2, marks=pytest.mark.slow)]
)
def test_cond_chain_matches_per_view(monkeypatch, cap):
    # The chained cond-view scan (IVID_TPU_COND_CHAIN: K views per dispatch,
    # state carried on-device) must reproduce the per-view fused path exactly:
    # same presplit rng keys, same gather semantics (prefix arange below the
    # nearest-view cap, per-sample nearest-K above it), same slot writes.
    views = np.stack([np.asarray(v) for v in build_viewset("3x9", 1)[:4]])

    def run(chain):
        monkeypatch.setenv("IVID_TPU_COND_CHAIN", chain)
        pipe, pu, pc = _make_pipeline(steps_uncond=2, steps_cond=2)
        if cap is not None:
            pipe.max_agg_views = cap
        assert pipe._cond_chain == int(chain)
        state, samples, conds = pipe.sample_batch(
            pu, pc, jax.random.PRNGKey(3), views, batch=2
        )
        return state, np.asarray(samples), np.asarray(conds["color"])

    st1, s1, c1 = run("4")
    st0, s0, c0 = run("0")
    assert st1.valid[:4].all()
    np.testing.assert_allclose(s1, s0, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(c1, c0, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(st1.colors), np.asarray(st0.colors), atol=1e-5, rtol=1e-5
    )
