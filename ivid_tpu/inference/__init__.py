from ivid_tpu.inference import pipeline, scene_io, viewsets
from ivid_tpu.inference.pipeline import ScenePipeline
from ivid_tpu.inference.scene_io import load_first_view, load_scene, save_scene
from ivid_tpu.inference.viewsets import build_viewset, reorder

__all__ = [
    "pipeline", "scene_io", "viewsets",
    "ScenePipeline", "load_first_view", "load_scene", "save_scene",
    "build_viewset", "reorder",
]
