#!/usr/bin/env python
"""Super-resolution cascade CLI: upsample sampled RGBD views 128 → 256.

The reference ships the SR stage as configs + trainer only
(reference: configs/rgbd_*_256_128_small_sr.json, diffusion/trainers/superres.py)
with no inference entry point; this CLI completes the cascade: load scenes
produced by ``sample.py``, run SuperResCFG guided DDIM (50 steps, the trainer's
own eval setting, reference: superres.py:124) per view, and write upscaled view
PNGs plus optional 256-scene npz files.
"""

import argparse
import glob
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config_sr", type=str, default="configs/rgbd_imagenet_adm_256_128_small_sr.json")
    p.add_argument("--ckpt_sr", type=str, default="ckpts/imagenet256_sr.pt")
    p.add_argument("--scene_dir", type=str, required=True, help="sample.py output dir")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--guidance", type=float, default=3.0)
    p.add_argument(
        "--classes", type=str, default="mod", choices=["mod", "none"],
        help="mod: class = seed %% num_classes parsed from the scene filename "
             "(matches sample.py's default class selection, so guided SR sees "
             "the class each scene was generated with); none: unconditional",
    )
    p.add_argument("--batchsize", type=int, default=27)  # one 3x9 scene; measured MFU-optimal on v5e (52% vs 45% at 9)
    p.add_argument("--near", type=float, default=0.6)
    p.add_argument("--far", type=float, default=5.0)
    p.add_argument("--save_scenes", action="store_true")
    p.add_argument("--max_scenes", type=int, default=None)
    return p.parse_args()


def main():
    opt = parse_args()
    import jax

    from ivid_tpu.utils.runtime import enable_compilation_cache, setup_platform

    setup_platform()
    enable_compilation_cache()
    import jax.numpy as jnp

    from ivid_tpu.config import Config, build_backbone, build_framework_from_config
    from ivid_tpu.diffusion import samplers
    from ivid_tpu.inference.scene_io import load_scene, save_scene
    from ivid_tpu.ops import geometry as geom
    from ivid_tpu.training import checkpoint as ckpt_io
    from ivid_tpu.utils import save_image

    cfg = Config.load(opt.config_sr)
    model = build_backbone(cfg)
    fw = build_framework_from_config(cfg, model)
    s_hi = cfg.backbone["args"]["image_size"]

    x = jnp.zeros((1, s_hi, s_hi, cfg.backbone["args"]["in_channels"]))
    cl = jnp.zeros((1,), jnp.int32) if cfg.backbone["args"].get("num_classes") else None
    if opt.ckpt_sr == "random":
        params = model.init(
            jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), cl
        )["params"]
    else:
        # Shapes only — a live device init is a multi-minute XLA program the
        # checkpoint load never uses (see sample.py build()).
        shapes = jax.eval_shape(
            lambda: model.init(
                jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), cl
            )["params"]
        )
        template = jax.tree.map(lambda sd: np.zeros(sd.shape, sd.dtype), shapes)
        params = ckpt_io.load_params(opt.ckpt_sr, template, cfg.backbone["args"])
    params = jax.device_put(params)

    if opt.output_dir is None:
        opt.output_dir = opt.scene_dir
    os.makedirs(os.path.join(opt.output_dir, "results_sr"), exist_ok=True)
    if opt.save_scenes:
        os.makedirs(os.path.join(opt.output_dir, "scenes_sr"), exist_ok=True)

    @jax.jit
    def sr_batch(p, rng, y, classes):
        cond = {"y": y}
        if classes is not None:
            cond["classes"] = classes
        out = samplers.ddim_sample(
            fw, p, rng, num=y.shape[0], image_size=s_hi,
            cond=cond, guidance=opt.guidance if classes is not None else 0.0,
            steps=opt.steps,
        )
        return out["samples"]

    scenes = sorted(glob.glob(os.path.join(opt.scene_dir, "scenes", "*.npz")))
    if opt.max_scenes:
        scenes = scenes[: opt.max_scenes]
    print(f"Found {len(scenes)} scenes.")

    import re

    num_classes = cfg.backbone["args"].get("num_classes")

    for si, scene_path in enumerate(scenes):
        meshes, colors = load_scene(scene_path)
        name = os.path.basename(scene_path)[:-4]
        # Class label from the scene filename's seed (sample.py names scenes
        # scene_seed%05d and selects classes seed %% num_classes by default);
        # without it CFG can never engage and --guidance was silently dead.
        scene_cls = None
        if num_classes and opt.classes == "mod":
            m = re.search(r"seed(\d+)", name)
            if m:
                scene_cls = int(m.group(1)) % num_classes
        views = []
        for mesh, color in zip(meshes, colors):
            depth_stored = np.asarray(
                geom.project_depth(np.asarray(mesh.depth), opt.near, opt.far)
            )
            views.append(np.concatenate([color, depth_stored], axis=-1))
        views = np.stack(views).astype(np.float32)  # [V, 128, 128, 4] in [0,1]

        out_views = []
        for i in range(0, len(views), opt.batchsize):
            y = jnp.asarray(views[i : i + opt.batchsize] * 2 - 1)
            rng = jax.random.PRNGKey(1000 * si + i)
            cls = (
                jnp.full((y.shape[0],), scene_cls, jnp.int32)
                if scene_cls is not None else None
            )
            out = sr_batch(params, rng, y, cls)
            out_views.append(np.asarray(out) * 0.5 + 0.5)
        out_views = np.concatenate(out_views)

        save_image(
            os.path.join(opt.output_dir, "results_sr", f"{name}.png"),
            out_views[0, ..., :3],
        )
        if opt.save_scenes:
            sr_meshes = []
            for v, mesh in zip(out_views, meshes):
                depth_lin = np.asarray(
                    geom.linearize_depth(
                        jnp.asarray(v[..., 3:]), opt.near, opt.far
                    )
                )
                sr_meshes.append(
                    geom.depth_to_mesh(
                        depth_lin, padding="frustum", fov=mesh.fov,
                        modelview=np.asarray(mesh.modelview),
                        atol=0.03, rtol=0.03, erode_rgb=3, cal_normal=True,
                    )
                )
            save_scene(
                os.path.join(opt.output_dir, "scenes_sr", f"{name}.npz"),
                sr_meshes, [v[..., :3] for v in out_views],
            )
        print(f"[{si + 1}/{len(scenes)}] SR {name}: {out_views.shape}")


if __name__ == "__main__":
    main()
