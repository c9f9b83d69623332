"""ivid-tpu: TPU-native 3D-aware image generation via sequential multiview RGBD diffusion.

A from-scratch JAX/XLA/Pallas framework with the capabilities of JeffreyXiang/ivid
(ICCV 2023). Design stance (see SURVEY.md §7):

- Functional core: flax/linen backbone, frameworks and samplers are pure functions
  over ``(params, rng, ...)``; conditioning is a typed pytree, not kwarg reflection.
- Whole-sampler compilation: DDPM/DDIM reverse processes are single ``lax.scan``
  programs; classifier-free guidance runs as one batched forward, not two calls.
- On-device rendering: the reference's ModernGL/EGL + GLSL pipeline
  (reference: rgbd_3d/moderngl_renderer.py, rgbd_3d/shaders/) is replaced by a JAX
  z-buffer rasterizer so conditioning-view construction stays in one XLA program.
- Data layout is NHWC (TPU-native) throughout; compute is bf16 torso with fp32
  normalization/softmax.
"""

__version__ = "0.1.0"

from ivid_tpu import diffusion, models, ops

__all__ = ["diffusion", "models", "ops", "__version__"]
