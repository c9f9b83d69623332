#!/usr/bin/env python
"""Multiview RGBD scene sampling CLI.

Mirrors the reference CLI surface and output layout
(reference: inference/sample.py:240-348): two configs (uncond + cond), seeds or
num_samples, class selection modes, viewsets uncond/random/3x9, and the
``{output_dir}/viewset_{v}_steps_u{u}_c{c}_guidance{g}/{scenes,conds,grids,results}``
directory structure with identical file naming. Checkpoints may be native
msgpack or reference PyTorch ``.pt`` files; ``--ckpt_* random`` uses fresh random
parameters (for pipeline smoke runs without trained weights).
"""

import argparse
import json
import os
import threading

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--config_uncond", type=str, default="configs/rgbd_imagenet_adm_128_large_cfg.json")
    p.add_argument("--config_cond", type=str, default="configs/rgbd_imagenet_adm_128_large_cond.json")
    p.add_argument("--ckpt_uncond", type=str, default="ckpts/imagenet128_uncond.pt")
    p.add_argument("--ckpt_cond", type=str, default="ckpts/imagenet128_cond.pt")
    p.add_argument("--output_dir", type=str, default="samples/imagenet128")
    p.add_argument("--seeds", type=str, default="0-8")
    p.add_argument("--num_samples", type=int, default=None)
    p.add_argument("--classes", type=str, default="mod")
    p.add_argument("--viewset", type=str, default="3x9")
    p.add_argument("--steps_uncond", type=int, default=1000)
    p.add_argument("--steps_cond", type=int, default=50)
    p.add_argument("--guidance", type=float, default=3.0)
    p.add_argument("--batchsize", type=int, default=10)
    p.add_argument("--fov", type=float, default=45)
    p.add_argument("--near", type=float, default=0.6)
    p.add_argument("--far", type=float, default=5)
    p.add_argument("--atol", type=float, default=0.03)
    p.add_argument("--rtol", type=float, default=0.03)
    p.add_argument("--erode_rgb", type=int, default=3)
    p.add_argument(
        "--data_parallel", action="store_true",
        help="Shard the sample batch over all local devices (multi-chip)",
    )
    p.add_argument(
        "--max_agg_views", type=int, default=None,
        help="Aggregate only the K angularly-nearest prior views per novel "
             "view (default: all, reference-exact). LOSSY speed knob: depth "
             "aggregates with binary per-view weights (aggregation.csh:19), "
             "so dropped views change the depth/mask conditioning — measured "
             "at 128² on a consistent synthetic 3x9 scene, K=8 flips 27%% of "
             "mask px (color mean|Δ| 0.10); K=16 flips 5%% (0.026). Exact "
             "only when K >= live views (tests/test_kcap_bound.py)",
    )
    return p.parse_args()


def async_save(meshes, colors, samples, conds, suffix, cfg):
    """Threaded retrying saver (reference: inference/sample.py:150-176)."""
    from ivid_tpu.inference import save_scene
    from ivid_tpu.inference.viewsets import reorder
    from ivid_tpu.utils import colorize_depth, save_image, save_image_grid

    def worker():
        for _ in range(10):
            try:
                out = cfg.output_dir
                if cfg.viewset == "uncond":
                    save_image(
                        os.path.join(out, "results", f"rgb_{suffix}.png"),
                        samples[0, ..., :3] * 0.5 + 0.5,
                    )
                    save_scene(os.path.join(out, "scenes", f"scene_{suffix}.npz"), meshes, colors)
                elif cfg.viewset == "random":
                    save_image_grid(
                        os.path.join(out, "grids", f"rgb_{suffix}.png"),
                        samples[..., :3], nrow=2,
                    )
                    save_image(
                        os.path.join(out, "conds", f"rgb_{suffix}.png"),
                        samples[0, ..., :3] * 0.5 + 0.5,
                    )
                    save_image(
                        os.path.join(out, "results", f"rgb_{suffix}.png"),
                        samples[1, ..., :3] * 0.5 + 0.5,
                    )
                elif cfg.viewset == "3x9":
                    save_image_grid(
                        os.path.join(out, "grids", f"rgb_{suffix}.png"),
                        reorder(samples[..., :3]), nrow=9,
                    )
                    save_image_grid(
                        os.path.join(out, "grids", f"depth_{suffix}.png"),
                        colorize_depth(samples[..., 3:]), nrow=9,
                    )
                    save_image_grid(
                        os.path.join(out, "conds", f"rgb_cond_{suffix}.png"),
                        reorder(conds["color"][..., :3]), nrow=9,
                    )
                    save_image_grid(
                        os.path.join(out, "conds", f"depth_cond_{suffix}.png"),
                        reorder(colorize_depth(conds["depth"])), nrow=9,
                    )
                    save_scene(os.path.join(out, "scenes", f"scene_{suffix}.npz"), meshes, colors)
                else:
                    raise NotImplementedError(cfg.viewset)
                break
            except Exception as e:  # noqa: BLE001 — retried saver, like the reference
                print(e)

    t = threading.Thread(target=worker)
    t.start()
    return t


def main():
    opt = parse_args()
    import jax

    from ivid_tpu.utils.runtime import enable_compilation_cache, setup_platform

    setup_platform()
    enable_compilation_cache()
    import jax.numpy as jnp

    from ivid_tpu.config import Config, build_backbone, build_framework_from_config
    from ivid_tpu.inference import ScenePipeline
    from ivid_tpu.inference.viewsets import build_viewset
    from ivid_tpu.training import checkpoint as ckpt_io
    from ivid_tpu.utils import parse_int_list

    cfg_uncond = Config.load(opt.config_uncond)
    cfg_cond = Config.load(opt.config_cond) if opt.viewset != "uncond" else None

    opt.output_dir = os.path.join(
        opt.output_dir,
        f"viewset_{opt.viewset}_steps_u{opt.steps_uncond}_c{opt.steps_cond}_guidance{opt.guidance}",
    )
    for sub in ["scenes", "conds", "grids", "results"]:
        os.makedirs(os.path.join(opt.output_dir, sub), exist_ok=True)

    # Seeds / classes (reference: sample.py:283-301).
    if opt.num_samples is not None:
        num_samples, seeds = opt.num_samples, None
    else:
        seeds = parse_int_list(opt.seeds)
        num_samples = len(seeds)
    num_classes = cfg_uncond.backbone["args"].get("num_classes")
    classes = None
    if num_classes:
        # --num_samples mode has no seed list; index-derived pseudo-seeds keep
        # the default --classes mod usable (the reference crashes here,
        # sample.py:296 — seeds[i] on None). Local only: downstream
        # seed-derived noise/filenames still see seeds=None in that mode.
        seed_basis = seeds if seeds is not None else list(range(num_samples))
        if opt.classes == "mod":
            classes = [seed_basis[i] % num_classes for i in range(num_samples)]
        elif opt.classes == "random":
            classes = [np.random.randint(num_classes) for _ in range(num_samples)]
        elif opt.classes == "uniform":
            classes = [i % num_classes for i in range(num_samples)]
        else:
            classes = parse_int_list(opt.classes)

    modelviews = build_viewset(opt.viewset, num_samples)
    per_sample_views = isinstance(modelviews[0], list)

    # Build models + params.
    def build(cfg, ckpt_path):
        model = build_backbone(cfg)
        fw = build_framework_from_config(cfg, model)
        s = cfg.backbone["args"]["image_size"]
        c = cfg.backbone["args"]["in_channels"]
        x = jnp.zeros((1, s, s, c))
        t = jnp.zeros((1,), jnp.int32)
        cl = jnp.zeros((1,), jnp.int32) if cfg.backbone["args"].get("num_classes") else None
        if ckpt_path == "random":
            # Only the random-params smoke path needs a real device init.
            params = model.init(jax.random.PRNGKey(0), x, t, cl)["params"]
        else:
            # Checkpoint loads only need SHAPES: a live init of the 550M
            # model is a separate multi-minute XLA program (CLAUDE.md), and
            # the torch loader ignores the template values entirely.
            shapes = jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0), x, t, cl)["params"]
            )
            template = jax.tree.map(
                lambda sd: np.zeros(sd.shape, sd.dtype), shapes
            )
            params = ckpt_io.load_params(
                ckpt_path, template, cfg.backbone["args"]
            )
        return fw, jax.device_put(params)

    fw_uncond, params_uncond = build(cfg_uncond, opt.ckpt_uncond)
    if cfg_cond is not None:
        fw_cond, params_cond = build(cfg_cond, opt.ckpt_cond)
    else:
        fw_cond, params_cond = None, None

    image_size = cfg_uncond.backbone["args"]["image_size"]
    pipe = ScenePipeline(
        fw_uncond, fw_cond,
        image_size=image_size,
        fov=opt.fov, near=opt.near, far=opt.far,
        atol=opt.atol, rtol=opt.rtol, erode_rgb=opt.erode_rgb,
        steps_uncond=opt.steps_uncond, steps_cond=opt.steps_cond,
        guidance=opt.guidance, data_parallel=opt.data_parallel,
        max_agg_views=opt.max_agg_views,
    )

    threads = []
    done = 0
    for start in range(0, num_samples, opt.batchsize):
        bs = min(opt.batchsize, num_samples - start)
        b_classes = (
            jnp.asarray(classes[start : start + bs], jnp.int32)
            if classes is not None else None
        )
        if seeds is not None:
            noise = jnp.concatenate(
                [
                    jax.random.normal(jax.random.PRNGKey(seeds[start + j]), (1, image_size, image_size, 4))
                    for j in range(bs)
                ]
            )
        else:
            noise = None
        views = (
            np.asarray([modelviews[start + j] for j in range(bs)])
            if per_sample_views
            else np.asarray(modelviews)
        )
        state, samples, conds = pipe.sample_batch(
            params_uncond, params_cond, jax.random.PRNGKey(1234 + start),
            views, batch=bs, classes=b_classes, noise=noise,
        )
        samples = np.asarray(samples)
        conds = {k: np.asarray(v) for k, v in conds.items()} if conds else None
        n_views = samples.shape[1]
        for j in range(bs):
            i = start + j
            suffix = []
            if classes is not None:
                suffix.append(f"class{classes[i]:03d}")
            suffix.append(f"seed{seeds[i]:05d}" if seeds is not None else f"{i:05d}")
            suffix = "_".join(suffix)
            meshes, colors = pipe.state_to_host_scene(state, j, n_views)
            s_conds = (
                {k: v[j] for k, v in conds.items()} if conds is not None else None
            )
            threads.append(
                async_save(meshes, colors, samples[j], s_conds, suffix, opt)
            )
            done += 1
            print(f"[{done}/{num_samples}] saved {suffix}")

    for t in threads:
        t.join()


if __name__ == "__main__":
    main()
