"""Runtime setup helpers shared by the CLIs."""

from __future__ import annotations

import os


def setup_platform() -> None:
    """Honor ``IVID_TPU_PLATFORM`` (e.g. ``cpu``) through jax.config.

    Plain ``JAX_PLATFORMS=cpu`` is not enough on machines where a hardware
    plugin self-registers from sitecustomize; the config flag wins."""
    platform = os.environ.get("IVID_TPU_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache.

    XLA compiles of the big programs here (550M-param UNet scans, sort-based
    rasterization) take minutes on remote-compile TPU backends; the persistent
    cache makes every run after the first start instantly."""
    import jax

    path = path or os.environ.get(
        "IVID_TPU_COMP_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache"),
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:  # noqa: BLE001 — older jax without these flags
        pass
