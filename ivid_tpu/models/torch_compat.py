"""Convert reference PyTorch AdmUnet2d checkpoints into flax parameter pytrees.

This is the migration path for users of the reference implementation: a
``model_step*.pt`` / ``ema_*_step*.pt`` state_dict trained with the reference
(reference: diffusion/trainers/basic.py:230-252) loads directly into
:class:`ivid_tpu.models.AdmUnet2d`. Layout conversions:

- Conv2d ``[O, I, kh, kw]``  → flax ``[kh, kw, I, O]``
- Conv1d ``[O, I, 1]``       → Dense ``[I, O]`` (the reference's attention qkv/proj
  are 1x1 Conv1d over flattened spatial, adm.py:275-278; ours are Dense)
- Linear ``[O, I]``          → Dense ``[I, O]``

The module index layout inside ``input_blocks`` / ``output_blocks`` is recovered by
replaying the reference's construction loops (adm.py:367-481).
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def _conv2d(w):  # [O,I,kh,kw] -> [kh,kw,I,O]
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _conv1d(w):  # [O,I,1] -> [I,O]
    return np.ascontiguousarray(np.transpose(w[:, :, 0], (1, 0)))


def _linear(w):  # [O,I] -> [I,O]
    return np.ascontiguousarray(np.transpose(w, (1, 0)))


def _resblock(sd, prefix: str, has_skip: bool) -> dict:
    out = {
        "in_norm": {"GroupNorm_0": {
            "scale": sd[f"{prefix}.in_layers.0.weight"],
            "bias": sd[f"{prefix}.in_layers.0.bias"],
        }},
        "in_conv": {
            "kernel": _conv2d(sd[f"{prefix}.in_layers.2.weight"]),
            "bias": sd[f"{prefix}.in_layers.2.bias"],
        },
        "emb_proj": {
            "kernel": _linear(sd[f"{prefix}.emb_layers.1.weight"]),
            "bias": sd[f"{prefix}.emb_layers.1.bias"],
        },
        "out_norm": {"GroupNorm_0": {
            "scale": sd[f"{prefix}.out_layers.0.weight"],
            "bias": sd[f"{prefix}.out_layers.0.bias"],
        }},
        "out_conv": {
            "kernel": _conv2d(sd[f"{prefix}.out_layers.3.weight"]),
            "bias": sd[f"{prefix}.out_layers.3.bias"],
        },
    }
    if has_skip:
        out["skip_conv"] = {
            "kernel": _conv2d(sd[f"{prefix}.skip_connection.weight"]),
            "bias": sd[f"{prefix}.skip_connection.bias"],
        }
    return out


def _attnblock(sd, prefix: str) -> dict:
    return {
        "norm": {"GroupNorm_0": {
            "scale": sd[f"{prefix}.norm.weight"],
            "bias": sd[f"{prefix}.norm.bias"],
        }},
        "qkv": {
            "kernel": _conv1d(sd[f"{prefix}.qkv.weight"]),
            "bias": sd[f"{prefix}.qkv.bias"],
        },
        "proj": {
            "kernel": _conv1d(sd[f"{prefix}.proj_out.weight"]),
            "bias": sd[f"{prefix}.proj_out.bias"],
        },
    }


def torch_state_dict_to_flax(
    sd: Dict[str, np.ndarray],
    *,
    image_size: int,
    model_channels: int,
    num_res_blocks: int,
    channel_mult: Sequence[float],
    attention_resolutions: Sequence[int],
    num_classes=None,
    **_unused,
) -> dict:
    """Map a reference state_dict (tensor name → float32 numpy array) to the flax
    param tree of our :class:`AdmUnet2d` with the same architecture args."""
    sd = {k: np.asarray(v, dtype=np.float32) for k, v in sd.items()}
    params: dict = {
        "time_embed_1": {
            "kernel": _linear(sd["time_embed.1.weight"]),
            "bias": sd["time_embed.1.bias"],
        },
        "time_embed_2": {
            "kernel": _linear(sd["time_embed.3.weight"]),
            "bias": sd["time_embed.3.bias"],
        },
        "in_conv": {
            "kernel": _conv2d(sd["input_blocks.0.0.weight"]),
            "bias": sd["input_blocks.0.0.bias"],
        },
    }
    if num_classes is not None:
        params["label_emb"] = sd["label_emb.weight"]

    # Encoder (reference: adm.py:367-416).
    idx = 1
    ds = image_size
    ch = int(channel_mult[0] * model_channels)
    for level, mult in enumerate(channel_mult):
        for i in range(num_res_blocks):
            out_ch = int(mult * model_channels)
            params[f"down_{level}_{i}"] = _resblock(
                sd, f"input_blocks.{idx}.0", has_skip=(out_ch != ch)
            )
            ch = out_ch
            if ds in attention_resolutions:
                params[f"down_{level}_{i}_attn"] = _attnblock(sd, f"input_blocks.{idx}.1")
            idx += 1
        if level != len(channel_mult) - 1:
            params[f"downsample_{level}"] = _resblock(
                sd, f"input_blocks.{idx}.0", has_skip=False
            )
            idx += 1
            ds //= 2

    # Middle (reference: adm.py:418-439).
    params["mid_res1"] = _resblock(sd, "middle_block.0", has_skip=False)
    params["mid_attn"] = _attnblock(sd, "middle_block.1")
    params["mid_res2"] = _resblock(sd, "middle_block.2", has_skip=False)

    # Decoder (reference: adm.py:441-481). Skip-concat input always widens the
    # channel count, so every decoder ResBlock has a skip_connection conv.
    idx = 0
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            params[f"up_{level}_{i}"] = _resblock(
                sd, f"output_blocks.{idx}.0", has_skip=True
            )
            sub = 1
            if ds in attention_resolutions:
                params[f"up_{level}_{i}_attn"] = _attnblock(sd, f"output_blocks.{idx}.{sub}")
                sub += 1
            if level and i == num_res_blocks:
                params[f"upsample_{level}"] = _resblock(
                    sd, f"output_blocks.{idx}.{sub}", has_skip=False
                )
                ds *= 2
            idx += 1

    params["out_norm"] = {"GroupNorm_0": {
        "scale": sd["out.0.weight"], "bias": sd["out.0.bias"],
    }}
    params["out_conv"] = {
        "kernel": _conv2d(sd["out.2.weight"]),
        "bias": sd["out.2.bias"],
    }
    return params


def pad_input_channels(params: dict, new_in_channels: int) -> dict:
    """Zero-pad the first conv's input-channel dim so an unconditional checkpoint
    initializes a conditional model with extra input channels — the reference's
    finetune path (reference: diffusion/trainers/inpaint.py:68-94)."""
    import jax.numpy as jnp

    kernel = params["in_conv"]["kernel"]  # [kh, kw, I, O]
    kh, kw, old_in, out = kernel.shape
    if old_in == new_in_channels:
        return params
    assert old_in < new_in_channels, (old_in, new_in_channels)
    pad = jnp.zeros((kh, kw, new_in_channels - old_in, out), kernel.dtype)
    new_kernel = jnp.concatenate([jnp.asarray(kernel), pad], axis=2)
    out_params = dict(params)
    out_params["in_conv"] = dict(params["in_conv"], kernel=new_kernel)
    return out_params
