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
from functools import lru_cache
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
    assert len(meshes) == len(colors), (
        f"{len(meshes)} meshes vs {len(colors)} colors"  # zip would truncate
    )
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


def _normalize_modelview(mv: np.ndarray) -> np.ndarray:
    """Row-major [4,4] view matrix from whatever the npz stored.

    Reference scenes pickle glm.mat4 objects whose numpy conversion is
    COLUMN-major — the transpose of this repo's convention. A rigid row-major
    view matrix has bottom row [0,0,0,1]; the transpose has it in the last
    column instead, so the layout is detectable structurally."""
    mv = np.asarray(mv, np.float32)
    e = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
    if not np.allclose(mv[3], e, atol=1e-5) and np.allclose(mv[:, 3], e, atol=1e-5):
        return np.ascontiguousarray(mv.T)
    return mv


@lru_cache(maxsize=None)
def _mesh_builder(fov: float, atol: float, rtol: float, erode_rgb: int):
    """One jitted depth→mesh rebuild per (fov, tolerance) combination.

    Eager per-op execution here costs ~80 dispatches per view — roughly 3 s
    on the relayed TPU backend — against one jitted call."""
    import jax

    return jax.jit(
        lambda depth, mv: geom.depth_to_mesh(
            depth, padding=32, fov=fov, modelview=mv,
            atol=atol, rtol=rtol, erode_rgb=erode_rgb, cal_normal=True,
        )
    )


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
        build = _mesh_builder(float(d["fov"]), atol, rtol, erode_rgb)
        meshes.append(build(depth, _normalize_modelview(d["modelview"])))
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
