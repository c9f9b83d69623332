"""CLI smoke tests: run the actual entry points in subprocesses on CPU.

These guard the wiring the unit tests can't see — argument parsing, config
loading, registry dispatch, output layout (reference CLI surfaces:
train.py, inference/sample.py, eval.py)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=900):
    env = dict(os.environ)
    env["IVID_TPU_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env,
        capture_output=True, text=True, timeout=timeout,
    )


@pytest.fixture(scope="module")
def tiny_configs(tmp_path_factory):
    d = tmp_path_factory.mktemp("cfg")
    backbone = {
        "image_size": 32, "in_channels": 4, "out_channels": 4,
        "model_channels": 32, "num_res_blocks": 1,
        "num_classes": None, "has_null_class": False,
        "channel_mult": [1, 2], "attention_resolutions": [16],
        "num_groups": 8, "num_heads": None, "num_head_channels": 16,
        "dropout": 0.0, "use_fp16": False,
    }
    uncond = {
        "backbone": {"name": "AdmUnet2d", "args": dict(backbone)},
        "framework": {"name": "GaussianDiffusion",
                      "args": {"timesteps": 100, "beta_schedule": "linear"}},
        "dataset": {"name": "SyntheticRGBD",
                    "args": {"image_size": 32, "length": 32, "normalize": True,
                             "normalize_depth": True, "prepocess_depth": "z_buffer"}},
        "trainer": {"name": "BasicTrainer",
                    "args": {"max_steps": 2, "batch_size_per_gpu": 1,
                             "i_log": 1, "i_sample": 10**9, "i_save": 10**9,
                             "sample_at_init": False}},
    }
    cond = json.loads(json.dumps(uncond))
    cond["backbone"]["args"]["in_channels"] = 10
    cond["framework"] = {"name": "InpaintCFG",
                         "args": {"timesteps": 100, "beta_schedule": "linear",
                                  "p_uncond": 0.1, "p_uncond_img": 0}}
    p_uncond = d / "uncond.json"
    p_cond = d / "cond.json"
    p_uncond.write_text(json.dumps(uncond))
    p_cond.write_text(json.dumps(cond))
    return str(p_uncond), str(p_cond)


def test_sample_cli_uncond(tiny_configs, tmp_path):
    uncond, _ = tiny_configs
    r = _run([
        "sample.py", "--config_uncond", uncond, "--ckpt_uncond", "random",
        "--viewset", "uncond", "--seeds", "0-1", "--steps_uncond", "4",
        "--output_dir", str(tmp_path),
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    out = tmp_path / "viewset_uncond_steps_u4_c50_guidance3.0"
    assert (out / "results" / "rgb_seed00000.png").exists()
    assert (out / "scenes" / "scene_seed00001.npz").exists()


def test_train_cli(tiny_configs, tmp_path):
    uncond, _ = tiny_configs
    r = _run([
        "train.py", "--config", uncond, "--output_dir", str(tmp_path),
        "--data_dir", str(tmp_path), "--max_steps", "2",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    run_dir = tmp_path / "uncond"
    assert (run_dir / "config.json").exists()
    assert (run_dir / "model_summary.txt").exists()
    log = (run_dir / "log.txt").read_text()
    assert '"loss"' in log


def test_eval_cli(tmp_path):
    import imageio.v2 as imageio

    rng = np.random.default_rng(0)
    (tmp_path / "real").mkdir()
    (tmp_path / "fake").mkdir()
    for i in range(16):
        imageio.imwrite(
            tmp_path / "real" / f"r{i}.png",
            (rng.uniform(size=(40, 50, 3)) * 255).astype(np.uint8),
        )
        imageio.imwrite(
            tmp_path / "fake" / f"f{i}.png",
            (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8),
        )
    # The InceptionV3 CPU compile dominates this test (~7 min cold); give it a
    # contention-proof budget so the full suite doesn't flake on loaded hosts.
    r = _run([
        "eval.py", "--real_images_dir", str(tmp_path / "real"),
        "--fake_images_dir", str(tmp_path / "fake"),
        "--tmp_dir", str(tmp_path / "cache"), "--image_size", "32",
        "--num_samples", "16", "--yes",
    ], timeout=2400)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "frechet_inception_distance" in r.stdout


def test_render_cli(tmp_path):
    """render.py end-to-end: save a 1-view scene, render a 2-frame swing."""
    import jax.numpy as jnp

    from ivid_tpu.inference.scene_io import save_scene
    from ivid_tpu.ops import camera as cam
    from ivid_tpu.ops import geometry as geom

    s = 32
    rng = np.random.default_rng(0)
    rgbd = np.clip(rng.uniform(0.2, 0.8, size=(s, s, 4)), 0, 1).astype(np.float32)
    mv = cam.look_at(
        jnp.array([0.0, 0.0, 1.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    mesh = geom.depth_to_mesh(
        geom.linearize_depth(jnp.asarray(rgbd[..., 3:]), 0.6, 5.0),
        padding="frustum", fov=45.0, modelview=mv,
        atol=0.03, rtol=0.03, erode_rgb=3, cal_normal=True,
    )
    (tmp_path / "scenes").mkdir()
    save_scene(str(tmp_path / "scenes" / "000000.npz"), [mesh], [rgbd[..., :3]])

    r = _run([
        "render.py", "--scene_dir", str(tmp_path), "--traj", "swing",
        "--frames", "2", "--ssaa", "2",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    vids = list((tmp_path / "videos").iterdir())
    assert any(v.suffix in (".gif", ".mp4") for v in vids), vids


def test_sr_cli(tmp_path):
    """sr.py end-to-end: tiny SR config + random params over a saved scene."""
    import jax.numpy as jnp

    from ivid_tpu.inference.scene_io import save_scene
    from ivid_tpu.ops import camera as cam
    from ivid_tpu.ops import geometry as geom

    cfg = {
        "backbone": {"name": "AdmUnet2d", "args": {
            "image_size": 32, "in_channels": 8, "out_channels": 4,
            "model_channels": 32, "num_res_blocks": 1,
            "num_classes": None, "has_null_class": False,
            "channel_mult": [1, 2], "attention_resolutions": [16],
            "num_groups": 8, "num_heads": None, "num_head_channels": 16,
            "dropout": 0.0, "use_fp16": False}},
        "framework": {"name": "SuperResCFG",
                      "args": {"timesteps": 100, "beta_schedule": "linear",
                               "p_uncond": 0.1}},
        "dataset": {"name": "SyntheticRGBDSR",
                    "args": {"image_size": 32, "image_size_lr": 16,
                             "length": 8, "normalize": True,
                             "normalize_depth": True,
                             "prepocess_depth": "z_buffer"}},
        "trainer": {"name": "SuperResTrainer",
                    "args": {"max_steps": 1, "batch_size_per_gpu": 1}},
    }
    cfg_path = tmp_path / "sr.json"
    cfg_path.write_text(json.dumps(cfg))

    s_lr = 16
    rng = np.random.default_rng(0)
    mv = cam.look_at(
        jnp.array([0.0, 0.0, 1.0]), jnp.zeros(3), jnp.array([0.0, 1.0, 0.0])
    )
    meshes, colors = [], []
    for _ in range(2):
        rgbd = np.clip(
            rng.uniform(0.2, 0.8, size=(s_lr, s_lr, 4)), 0, 1
        ).astype(np.float32)
        meshes.append(geom.depth_to_mesh(
            geom.linearize_depth(jnp.asarray(rgbd[..., 3:]), 0.6, 5.0),
            padding="frustum", fov=45.0, modelview=mv,
            atol=0.03, rtol=0.03, erode_rgb=3, cal_normal=True,
        ))
        colors.append(rgbd[..., :3])
    (tmp_path / "scenes").mkdir()
    save_scene(
        str(tmp_path / "scenes" / "scene_seed00003.npz"), meshes, colors
    )

    r = _run([
        "sr.py", "--config_sr", str(cfg_path), "--ckpt_sr", "random",
        "--scene_dir", str(tmp_path), "--steps", "2", "--batchsize", "2",
        "--save_scenes",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    assert (tmp_path / "results_sr" / "scene_seed00003.png").exists()
    assert (tmp_path / "scenes_sr" / "scene_seed00003.npz").exists()
