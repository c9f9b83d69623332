from ivid_tpu.diffusion import frameworks, samplers, schedules
from ivid_tpu.diffusion.frameworks import (
    FRAMEWORKS,
    ClassifierFreeGuidance,
    GaussianDiffusion,
    InpaintCFG,
    SuperResCFG,
    build_framework,
)
from ivid_tpu.diffusion.samplers import PredX0Edits, ddim_sample, ddpm_sample
from ivid_tpu.diffusion.schedules import Schedule, diffuse, extract

__all__ = [
    "frameworks",
    "samplers",
    "schedules",
    "FRAMEWORKS",
    "ClassifierFreeGuidance",
    "GaussianDiffusion",
    "InpaintCFG",
    "SuperResCFG",
    "build_framework",
    "PredX0Edits",
    "ddim_sample",
    "ddpm_sample",
    "Schedule",
    "diffuse",
    "extract",
]
