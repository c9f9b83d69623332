"""Binary PLY export for colored meshes (reference: rgbd_3d/utils.py:14-31).

Self-contained little-endian binary_1.0 writer (the reference uses the
``plyfile`` package; this environment ships none, and the format is trivial)."""

from __future__ import annotations

import numpy as np


def save_ply(path: str, positions, colors, faces) -> None:
    """``positions`` [V,3] float, ``colors`` [V,3] float in [0,1],
    ``faces`` [F,3] int."""
    positions = np.asarray(positions, np.float32)
    colors8 = np.clip(np.asarray(colors) * 255, 0, 255).astype(np.uint8)
    faces = np.asarray(faces, np.int32)
    v, f = len(positions), len(faces)

    header = "\n".join(
        [
            "ply",
            "format binary_little_endian 1.0",
            f"element vertex {v}",
            "property float x",
            "property float y",
            "property float z",
            "property uchar red",
            "property uchar green",
            "property uchar blue",
            f"element face {f}",
            "property list uchar int vertex_indices",
            "end_header",
            "",
        ]
    )

    vert_dtype = np.dtype(
        [("xyz", "<f4", 3), ("rgb", "u1", 3)]
    )
    verts = np.empty(v, vert_dtype)
    verts["xyz"] = positions
    verts["rgb"] = colors8

    face_dtype = np.dtype([("n", "u1"), ("idx", "<i4", 3)])
    fdata = np.empty(f, face_dtype)
    fdata["n"] = 3
    fdata["idx"] = faces

    with open(path, "wb") as fp:
        fp.write(header.encode("ascii"))
        fp.write(verts.tobytes())
        fp.write(fdata.tobytes())


def mesh_to_ply(path: str, mesh, color_image) -> None:
    """Export a :class:`ivid_tpu.ops.geometry.Mesh` with its texture baked to
    vertex colors (nearest lookup, like the GL pipeline's texturing)."""
    uv = np.asarray(mesh.uv)
    img = np.asarray(color_image)
    s = img.shape[0]
    j = np.clip((uv[:, 0] * s).astype(int), 0, s - 1)
    i = np.clip((uv[:, 1] * s).astype(int), 0, s - 1)
    save_ply(path, np.asarray(mesh.positions), img[i, j], np.asarray(mesh.faces))
