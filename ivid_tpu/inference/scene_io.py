"""Scene save/load in the reference's compressed npz layout.

Format (reference: inference/utils.py:74-113): ``np.savez_compressed(path,
data=[{color: png-bytes, depth: png-bytes, fov, modelview}, ...])`` where color
is the 8-bit PNG of the view and depth is the float32 depth map bit-reinterpreted
as an RGBA8 PNG. ``modelview`` is stored as a [4,4] float32 array (the reference
pickles a glm.mat4; the byte layout of the npz container and the PNG payloads is
otherwise identical).
"""

from __future__ import annotations

import io
from typing import List, Tuple

import numpy as np

from ivid_tpu.ops import geometry as geom


def _png_encode(arr: np.ndarray) -> bytes:
    import imageio.v2 as imageio

    with io.BytesIO() as f:
        imageio.imwrite(f, arr, format="png")
        return f.getvalue()


def _png_decode(data: bytes) -> np.ndarray:
    import imageio.v2 as imageio

    return np.asarray(imageio.imread(io.BytesIO(data)))


def save_scene(path: str, meshes: List[geom.Mesh], colors: List[np.ndarray]) -> None:
    """(reference: inference/utils.py:74-101). ``colors`` in [0,1] float."""
    data = []
    for mesh, color in zip(meshes, colors):
        color8 = np.clip(np.asarray(color) * 255, 0, 255).astype(np.uint8)
        depth = np.ascontiguousarray(np.asarray(mesh.depth, dtype=np.float32))
        s = depth.shape[0]
        depth_rgba = np.frombuffer(depth.tobytes(), dtype=np.uint8).reshape(s, s, 4)
        data.append(
            {
                "color": _png_encode(color8),
                "depth": _png_encode(depth_rgba),
                "fov": mesh.fov,
                "modelview": np.asarray(mesh.modelview, dtype=np.float32),
            }
        )
    np.savez_compressed(path, data=np.asarray(data, dtype=object))


def load_scene(
    path: str, atol: float = 0.03, rtol: float = 0.03, erode_rgb: int = 3
) -> Tuple[List[geom.Mesh], List[np.ndarray]]:
    """(reference: inference/utils.py:104-113). Rebuilds meshes with padding=32
    and normals, as the fusion renderer expects."""
    data = np.load(path, allow_pickle=True)["data"]
    meshes, colors = [], []
    for d in data:
        color = _png_decode(d["color"]).astype(np.float32) / 255.0
        s = color.shape[0]
        depth = np.frombuffer(
            _png_decode(d["depth"]).tobytes(), dtype=np.float32
        ).reshape(s, s, 1)
        meshes.append(
            geom.depth_to_mesh(
                depth, padding=32, fov=float(d["fov"]), modelview=np.asarray(d["modelview"]),
                atol=atol, rtol=rtol, erode_rgb=erode_rgb, cal_normal=True,
            )
        )
        colors.append(color)
    return meshes, colors


def load_first_view(path: str, near: float = 0.6, far: float = 5.0) -> np.ndarray:
    """First stored view as an RGBD image with projected depth
    (reference: inference/utils.py:116-123)."""
    d = np.load(path, allow_pickle=True)["data"][0]
    color = _png_decode(d["color"]).astype(np.float32) / 255.0
    s = color.shape[0]
    depth = np.frombuffer(_png_decode(d["depth"]).tobytes(), dtype=np.float32).reshape(s, s, 1)
    depth = np.asarray(geom.project_depth(depth, near, far))
    return np.concatenate([color, depth], axis=-1)
