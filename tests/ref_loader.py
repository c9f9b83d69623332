"""Helpers for numeric-parity tests against the reference PyTorch implementation.

The reference at /root/reference is imported directly (never copied) so tests can
compare our JAX implementations against its live behavior on CPU. A minimal
``easydict`` shim is injected because that dependency isn't installed here. All
parity tests must be skipped when the reference checkout is absent.
"""

import os
import sys
import types

REFERENCE_PATH = "/root/reference"

HAVE_REFERENCE = os.path.isdir(os.path.join(REFERENCE_PATH, "diffusion"))


def _install_easydict_shim():
    if "easydict" in sys.modules:
        return
    mod = types.ModuleType("easydict")

    class EasyDict(dict):
        def __init__(self, d=None, **kwargs):
            super().__init__()
            d = dict(d or {}, **kwargs)
            for k, v in d.items():
                self[k] = v

        def __setitem__(self, k, v):
            if isinstance(v, dict) and not isinstance(v, EasyDict):
                v = EasyDict(v)
            super().__setitem__(k, v)
            super().__setattr__(k, v)

        __setattr__ = __setitem__

        def __getattr__(self, k):
            try:
                return self[k]
            except KeyError as e:
                raise AttributeError(k) from e

    mod.EasyDict = EasyDict
    sys.modules["easydict"] = mod


def import_reference():
    """Import the reference ``diffusion`` package (backbones/frameworks/samplers)."""
    _install_easydict_shim()
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import diffusion.backbones as ref_backbones  # noqa
    import diffusion.frameworks as ref_frameworks  # noqa
    import diffusion.samplers as ref_samplers  # noqa

    return types.SimpleNamespace(
        backbones=ref_backbones, frameworks=ref_frameworks, samplers=ref_samplers
    )
