from ivid_tpu.ops import camera, geometry, image, raster, renderer, warp
from ivid_tpu.ops.geometry import Mesh, depth_to_mesh, linearize_depth, project_depth
from ivid_tpu.ops.renderer import render_aggregation, render_simple, stack_meshes
from ivid_tpu.ops.warp import aggregate_conditions, forward_backward_warp

__all__ = [
    "camera", "geometry", "image", "raster", "renderer", "warp",
    "Mesh", "depth_to_mesh", "linearize_depth", "project_depth",
    "render_aggregation", "render_simple", "stack_meshes",
    "aggregate_conditions", "forward_backward_warp",
]
