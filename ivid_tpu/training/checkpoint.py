"""Checkpoint IO: native msgpack params, orbax train state, torch migration.

Layout mirrors the reference's three-file-per-step scheme
(reference: diffusion/trainers/basic.py:230-252): ``model_step{N:07d}``,
``ema_{rate}_step{N:07d}``, ``misc_step{N:07d}`` under ``ckpts/``, with
latest-step discovery by filename glob (reference: train.py:22-37). Model/EMA
files are flax msgpack instead of torch .pt; loading ALSO accepts reference
``.pt`` state_dicts (converted via :mod:`ivid_tpu.models.torch_compat`), with
the zero-pad channel-widening finetune path
(reference: diffusion/trainers/inpaint.py:68-94).
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import numpy as np
from flax import serialization


def save_params(path: str, params: Any) -> None:
    """Atomic write (tmp + rename): a mid-save kill must never leave a
    truncated file that `--ckpt latest` resume would then try to decode.
    The trainer writes ``model_step*`` LAST, so a partial save (missing
    model file) makes :func:`find_latest_step` fall back to the previous
    complete step instead of crashing on missing EMA/misc files."""
    params = jax.device_get(params)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(params))
    os.replace(tmp, path)


def load_native_params(path: str, template: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def load_torch_params(path: str, backbone_args: dict) -> Any:
    """Load a reference PyTorch checkpoint (model or EMA state_dict)."""
    import torch

    from ivid_tpu.models.torch_compat import torch_state_dict_to_flax

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items() if "freqs" not in k}
    return torch_state_dict_to_flax(sd, **{
        k: backbone_args[k]
        for k in [
            "image_size", "model_channels", "num_res_blocks", "channel_mult",
            "attention_resolutions",
        ]
    }, num_classes=backbone_args.get("num_classes"))


def load_params(path: str, template: Any = None, backbone_args: Optional[dict] = None):
    """Dispatch on extension: ``.pt`` → torch migration, else flax msgpack."""
    if path.endswith(".pt"):
        assert backbone_args is not None, "torch loading needs backbone args"
        return load_torch_params(path, backbone_args)
    assert template is not None, "native loading needs a params template"
    return load_native_params(path, template)


def finetune_load(path: str, template: Any, backbone_args: dict) -> Any:
    """Load a checkpoint whose first conv may have fewer input channels,
    zero-padding the difference (reference: inpaint.py:68-94).

    Compat note for imported reference *cond* checkpoints: the reference's
    conditional TRAINING normalization applies ``y[..., :3] = y[..., :3]*2-1``
    to a CHW tensor (reference: datasets/base.py:262-263), i.e. it rescales 3
    width columns rather than the RGB channels — reference cond models were
    trained with y-RGB in ~[0,1]. Reference *inference* normalizes fully
    (reference: inference/sample.py:104-106), so running inference here on an
    imported checkpoint matches the reference's own inference behavior; but
    FINETUNING from a reference cond checkpoint with this repo's (correct)
    trainer shifts the conditional input distribution — expect a brief
    re-adaptation period."""
    from ivid_tpu.models.torch_compat import pad_input_channels

    target_in = template["in_conv"]["kernel"].shape[2]
    if path.endswith(".pt"):
        src_args = dict(backbone_args)
        params = load_torch_params(path, src_args)
    else:
        # Native checkpoints carry their own shapes; deserialize loosely.
        with open(path, "rb") as f:
            params = serialization.msgpack_restore(f.read())
    params = pad_input_channels(params, target_in)
    # Validate tree/shape agreement against the template.
    jax.tree.map(
        lambda a, b: None
        if np.shape(a) == np.shape(b)
        else (_ for _ in ()).throw(
            ValueError(f"shape mismatch {np.shape(a)} vs {np.shape(b)}")
        ),
        params,
        jax.device_get(template),
    )
    return params


STEP_RE = re.compile(r"model_step(\d+)\.(msgpack|pt)$")


def find_latest_step(output_dir: str) -> Optional[int]:
    """Latest checkpoint step by glob (reference: train.py:22-37)."""
    ckpt_dir = os.path.join(output_dir, "ckpts")
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(ckpt_dir)
        if (m := STEP_RE.search(name))
    ]
    return max(steps) if steps else None


def model_path(output_dir: str, step: int) -> str:
    return os.path.join(output_dir, "ckpts", f"model_step{step:07d}.msgpack")


def ema_path(output_dir: str, rate: float, step: int) -> str:
    return os.path.join(output_dir, "ckpts", f"ema_{rate}_step{step:07d}.msgpack")


def misc_path(output_dir: str, step: int) -> str:
    return os.path.join(output_dir, "ckpts", f"misc_step{step:07d}.msgpack")
