#!/usr/bin/env python
"""Free-view fusion rendering CLI.

Mirrors the reference renderer CLI (reference: inference/render.py:17-88): load
saved scenes, render a 60-frame swing orbit or a single random pose with the
aggregation renderer at 5x SSAA, write mp4 videos (color + colorized depth)
or a PNG. mp4 comes from OpenCV's bundled mp4v codec (no ffmpeg binary in
this image); codec-less installs fall back to GIF. Optional per-frame PNGs
via --save_frames; everything matches the reference output layout
(``results/`` for random, ``videos/`` for swing).
"""

import argparse
import glob
import os

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--scene_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--frames", type=int, default=60)
    p.add_argument("--traj", type=str, default="swing", choices=["swing", "random"])
    p.add_argument("--atol", type=float, default=0.03)
    p.add_argument("--rtol", type=float, default=0.03)
    p.add_argument("--erode_rgb", type=int, default=3)
    p.add_argument("--ssaa", type=int, default=5)
    p.add_argument("--max_scenes", type=int, default=None)
    p.add_argument("--save_frames", action="store_true")
    return p.parse_args()


def save_video(path_stem: str, frames, fps: int = 30) -> str:
    """Write mp4 like the reference renderer (inference/render.py:74-88).

    Preferred writer is OpenCV's ``VideoWriter`` (its wheel bundles an mp4v
    codec, no ffmpeg binary needed); falls back to imageio+ffmpeg, then GIF
    on codec-less installs. Returns the path actually written."""
    import numpy as np

    try:
        import cv2

        out = path_stem + ".mp4"
        h, w = np.asarray(frames[0]).shape[:2]
        vw = cv2.VideoWriter(out, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
        if vw.isOpened():
            for f in frames:
                f = np.ascontiguousarray(np.asarray(f)[..., ::-1])  # RGB->BGR
                vw.write(f)
            vw.release()
            return out
        vw.release()
    except ImportError:
        pass

    import imageio.v2 as imageio

    try:
        import imageio_ffmpeg  # noqa: F401 — presence check only

        out = path_stem + ".mp4"
        imageio.mimsave(out, frames, fps=fps)
        return out
    except ImportError:
        out = path_stem + ".gif"
        imageio.mimsave(out, frames, duration=1 / fps, loop=0)
        print(
            "note: no mp4 writer found (cv2 codec-less, no ffmpeg) — wrote "
            f"GIF instead of {path_stem}.mp4."
        )
        return out


def main():
    opt = parse_args()
    import imageio.v2 as imageio
    import jax

    from ivid_tpu.utils.runtime import enable_compilation_cache, setup_platform

    setup_platform()
    enable_compilation_cache()
    import jax.numpy as jnp

    from ivid_tpu.inference.scene_io import load_scene
    from ivid_tpu.inference.viewsets import random_trajectory, swing_trajectory
    from ivid_tpu.ops import geometry as geom
    from ivid_tpu.ops import image as im_ops
    from ivid_tpu.ops import renderer as rend
    from ivid_tpu.utils import colorize_depth, to8b

    if opt.output_dir is None:
        opt.output_dir = opt.scene_dir
    os.makedirs(os.path.join(opt.output_dir, "results"), exist_ok=True)
    os.makedirs(os.path.join(opt.output_dir, "videos"), exist_ok=True)

    scenes = sorted(glob.glob(os.path.join(opt.scene_dir, "scenes", "*.npz")))
    if opt.max_scenes:
        scenes = scenes[: opt.max_scenes]
    print(f"Found {len(scenes)} scenes.")

    max_views = 27
    near, far = 0.1, 200.0

    @jax.jit
    def render_frame(meshes, colors, valid, mv):
        s = colors.shape[1]
        res = rend.render_aggregation(
            meshes, colors, valid, mv, fov=45.0,
            render_size=s * opt.ssaa, near=near, far=far,
            # Sample lattice must be at least as dense as the SSAA factor or
            # the fragment raster leaves sub-pixel holes (measured: level 4 at
            # 5x SSAA covers only 64% of interior pixels; level ssaa+1 -> 100%).
            interior_level=opt.ssaa + 1,
        )
        color = im_ops.resize_lanczos_8bit(res["color"], s)
        depth = im_ops.ssaa_subsample(res["depth"], opt.ssaa)
        return color, depth

    for i, scene_path in enumerate(scenes):
        meshes, colors = load_scene(
            scene_path, atol=opt.atol, rtol=opt.rtol, erode_rgb=opt.erode_rgb
        )
        n = len(meshes)
        zero = jax.tree.map(jnp.zeros_like, meshes[0])
        stacked = rend.stack_meshes(meshes + [zero] * (max_views - n))
        col = jnp.asarray(
            np.stack(colors + [np.zeros_like(colors[0])] * (max_views - n))
        )
        valid = jnp.asarray([True] * n + [False] * (max_views - n))

        name = os.path.basename(scene_path)[:-4]
        if opt.traj == "random":
            mv = jnp.asarray(random_trajectory())
            color, _ = render_frame(stacked, col, valid, mv)
            imageio.imwrite(
                os.path.join(opt.output_dir, "results", f"{name}.png"),
                to8b(np.asarray(color)),
            )
        else:
            frames_c, frames_d = [], []
            for mv in swing_trajectory(opt.frames):
                color, depth = render_frame(stacked, col, valid, jnp.asarray(mv))
                frames_c.append(to8b(np.asarray(color)))
                # Colorize with project_depth's DEFAULT near/far (0.5, 100),
                # not the renderer's (0.1, 200) — the reference tone-maps with
                # the defaults (reference: render.py:83, utils.py:61), and the
                # mismatch saturates the INFERNO map toward the far end.
                d = np.asarray(geom.project_depth(depth, 0.5, 100.0))[..., 0]
                frames_d.append(to8b(colorize_depth(d, vmin=0, vmax=1)))
            save_video(
                os.path.join(opt.output_dir, "videos", name), frames_c
            )
            save_video(
                os.path.join(opt.output_dir, "videos", f"{name}_depth"), frames_d
            )
            if opt.save_frames:
                fdir = os.path.join(opt.output_dir, "videos", name)
                os.makedirs(fdir, exist_ok=True)
                for k, fr in enumerate(frames_c):
                    imageio.imwrite(os.path.join(fdir, f"{k:03d}.png"), fr)
        print(f"[{i + 1}/{len(scenes)}] rendered {name}")


if __name__ == "__main__":
    main()
