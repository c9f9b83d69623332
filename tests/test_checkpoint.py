"""Checkpoint IO tests: native round-trip, torch .pt migration, latest-step."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ivid_tpu.models import build_adm_unet
from ivid_tpu.training import checkpoint as ckpt_io

from ref_loader import HAVE_REFERENCE, import_reference

SMALL = dict(
    image_size=16, in_channels=4, out_channels=4, model_channels=32,
    num_res_blocks=1, channel_mult=[1, 2], attention_resolutions=[8],
    num_groups=8, num_heads=None, num_head_channels=16,
    num_classes=None, has_null_class=False, dropout=0.0, use_fp16=False,
)


def _init(cfg):
    model = build_adm_unet(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg["image_size"], cfg["image_size"], cfg["in_channels"])),
        jnp.zeros((1,), jnp.int32),
    )["params"]
    return model, params


def test_native_roundtrip(tmp_path):
    model, params = _init(SMALL)
    path = str(tmp_path / "p.msgpack")
    ckpt_io.save_params(path, params)
    loaded = ckpt_io.load_params(path, template=params)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_find_latest_step(tmp_path):
    os.makedirs(tmp_path / "ckpts")
    assert ckpt_io.find_latest_step(str(tmp_path)) is None
    for step in [3, 11, 7]:
        open(ckpt_io.model_path(str(tmp_path), step), "wb").close()
    assert ckpt_io.find_latest_step(str(tmp_path)) == 11


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference checkout not available")
def test_torch_pt_migration(tmp_path):
    """A reference-trained .pt state_dict loads through load_params and the
    resulting model matches the torch forward — the migration path for
    reference users (reference ckpt scheme: diffusion/trainers/basic.py:230-252)."""
    import torch

    ref = import_reference()
    tm = ref.backbones.AdmUnet2d(
        image_size=SMALL["image_size"], in_channels=4, model_channels=32,
        out_channels=4, num_res_blocks=1, attention_resolutions=[8],
        channel_mult=[1, 2], num_groups=8, num_heads=1, num_head_channels=16,
    )
    tm.eval()
    pt_path = str(tmp_path / "model_step0000001.pt")
    torch.save(tm.state_dict(), pt_path)

    model, template = _init(SMALL)
    params = ckpt_io.load_params(pt_path, template, SMALL)

    x = np.random.default_rng(0).normal(size=(1, 16, 16, 4)).astype(np.float32)
    t = np.array([42])
    with torch.no_grad():
        ref_out = tm(
            torch.from_numpy(np.transpose(x, (0, 3, 1, 2))), torch.from_numpy(t)
        ).numpy().transpose(0, 2, 3, 1)
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t, jnp.int32))
    np.testing.assert_allclose(np.asarray(out), ref_out, atol=2e-4, rtol=1e-3)


@pytest.mark.skipif(not HAVE_REFERENCE, reason="reference checkout not available")
def test_torch_pt_finetune_channel_pad(tmp_path):
    """Migrating a 4ch reference checkpoint into a 10ch cond model pads the
    input conv with zeros (reference: inpaint.py:68-94)."""
    import torch

    ref = import_reference()
    tm = ref.backbones.AdmUnet2d(
        image_size=SMALL["image_size"], in_channels=4, model_channels=32,
        out_channels=4, num_res_blocks=1, attention_resolutions=[8],
        channel_mult=[1, 2], num_groups=8, num_heads=1, num_head_channels=16,
    )
    pt_path = str(tmp_path / "uncond.pt")
    torch.save(tm.state_dict(), pt_path)

    cfg10 = dict(SMALL, in_channels=10)
    _, template10 = _init(cfg10)
    params = ckpt_io.finetune_load(pt_path, template10, SMALL)
    k = np.asarray(params["in_conv"]["kernel"])
    assert k.shape[2] == 10
    np.testing.assert_array_equal(k[:, :, 4:], 0)
    ref_k = tm.state_dict()["input_blocks.0.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(k[:, :, :4], ref_k, atol=1e-6)
