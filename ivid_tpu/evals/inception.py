"""FID-edition InceptionV3 feature extractor in JAX.

Implements the exact compute graph of the pytorch-fid / torch-fidelity
InceptionV3 port of the original TF "inception-2015-12-05" network — the
network behind every published FID number — loading its torch ``state_dict``
weights (``pt_inception-2015-12-05-6726825d.pth``-style, ``fc`` → 1008
classes). The reference delegates FID to torch-fidelity
(reference: eval.py:133-137); with a locally supplied weights file this module
reproduces that feature space on TPU.

FID-edition quirks faithfully reproduced (they differ from torchvision's
InceptionV3 and change FID values):

- all in-block average pools use ``count_include_pad=False``;
- ``Mixed_7c`` (second InceptionE) uses a MAX pool in its pool branch;
- input is bilinearly resized to 299² (half-pixel centers, no antialias — the
  torch ``F.interpolate(..., align_corners=False)`` convention) and scaled by
  ``(255·x − 128)/128`` for [0,1] inputs, matching torch-fidelity's uint8
  normalization;
- BatchNorm eps 1e-3, convs bias-free.

Features are the 2048-d global-average-pool activations; logits the 1008-way
``fc`` output (used for IS).
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# ------------------------------------------------------------------ blocks
# Each BasicConv2d is (name, out_ch, (kh, kw), (sh, sw), (ph, pw)).


def _inception_a(pool_features: int):
    return {
        "branch1x1": [("branch1x1", 64, (1, 1), 1, (0, 0))],
        "branch5x5": [
            ("branch5x5_1", 48, (1, 1), 1, (0, 0)),
            ("branch5x5_2", 64, (5, 5), 1, (2, 2)),
        ],
        "branch3x3dbl": [
            ("branch3x3dbl_1", 64, (1, 1), 1, (0, 0)),
            ("branch3x3dbl_2", 96, (3, 3), 1, (1, 1)),
            ("branch3x3dbl_3", 96, (3, 3), 1, (1, 1)),
        ],
        "pool": ("avg", [("branch_pool", pool_features, (1, 1), 1, (0, 0))]),
    }


def _inception_b():
    return {
        "branch3x3": [("branch3x3", 384, (3, 3), 2, (0, 0))],
        "branch3x3dbl": [
            ("branch3x3dbl_1", 64, (1, 1), 1, (0, 0)),
            ("branch3x3dbl_2", 96, (3, 3), 1, (1, 1)),
            ("branch3x3dbl_3", 96, (3, 3), 2, (0, 0)),
        ],
        "pool": ("maxpool_s2", []),
    }


def _inception_c(c7: int):
    return {
        "branch1x1": [("branch1x1", 192, (1, 1), 1, (0, 0))],
        "branch7x7": [
            ("branch7x7_1", c7, (1, 1), 1, (0, 0)),
            ("branch7x7_2", c7, (1, 7), 1, (0, 3)),
            ("branch7x7_3", 192, (7, 1), 1, (3, 0)),
        ],
        "branch7x7dbl": [
            ("branch7x7dbl_1", c7, (1, 1), 1, (0, 0)),
            ("branch7x7dbl_2", c7, (7, 1), 1, (3, 0)),
            ("branch7x7dbl_3", c7, (1, 7), 1, (0, 3)),
            ("branch7x7dbl_4", c7, (7, 1), 1, (3, 0)),
            ("branch7x7dbl_5", 192, (1, 7), 1, (0, 3)),
        ],
        "pool": ("avg", [("branch_pool", 192, (1, 1), 1, (0, 0))]),
    }


def _inception_d():
    return {
        "branch3x3": [
            ("branch3x3_1", 192, (1, 1), 1, (0, 0)),
            ("branch3x3_2", 320, (3, 3), 2, (0, 0)),
        ],
        "branch7x7x3": [
            ("branch7x7x3_1", 192, (1, 1), 1, (0, 0)),
            ("branch7x7x3_2", 192, (1, 7), 1, (0, 3)),
            ("branch7x7x3_3", 192, (7, 1), 1, (3, 0)),
            ("branch7x7x3_4", 192, (3, 3), 2, (0, 0)),
        ],
        "pool": ("maxpool_s2", []),
    }


def _inception_e(pool_mode: str):
    # branch3x3 / branch3x3dbl fan out into concatenated (1,3)+(3,1) pairs.
    return {
        "branch1x1": [("branch1x1", 320, (1, 1), 1, (0, 0))],
        "branch3x3_split": (
            [("branch3x3_1", 384, (1, 1), 1, (0, 0))],
            [("branch3x3_2a", 384, (1, 3), 1, (0, 1))],
            [("branch3x3_2b", 384, (3, 1), 1, (1, 0))],
        ),
        "branch3x3dbl_split": (
            [
                ("branch3x3dbl_1", 448, (1, 1), 1, (0, 0)),
                ("branch3x3dbl_2", 384, (3, 3), 1, (1, 1)),
            ],
            [("branch3x3dbl_3a", 384, (1, 3), 1, (0, 1))],
            [("branch3x3dbl_3b", 384, (3, 1), 1, (1, 0))],
        ),
        "pool": (pool_mode, [("branch_pool", 192, (1, 1), 1, (0, 0))]),
    }


STEM = [
    ("Conv2d_1a_3x3", 32, (3, 3), 2, (0, 0)),
    ("Conv2d_2a_3x3", 32, (3, 3), 1, (0, 0)),
    ("Conv2d_2b_3x3", 64, (3, 3), 1, (1, 1)),
    ("maxpool", None, None, None, None),
    ("Conv2d_3b_1x1", 80, (1, 1), 1, (0, 0)),
    ("Conv2d_4a_3x3", 192, (3, 3), 1, (0, 0)),
    ("maxpool", None, None, None, None),
]

MIXED = [
    ("Mixed_5b", _inception_a(32)),
    ("Mixed_5c", _inception_a(64)),
    ("Mixed_5d", _inception_a(64)),
    ("Mixed_6a", _inception_b()),
    ("Mixed_6b", _inception_c(128)),
    ("Mixed_6c", _inception_c(160)),
    ("Mixed_6d", _inception_c(160)),
    ("Mixed_6e", _inception_c(192)),
    ("Mixed_7a", _inception_d()),
    ("Mixed_7b", _inception_e("avg")),
    ("Mixed_7c", _inception_e("max")),  # the TF-port quirk: max, not avg
]

FEATURE_DIM = 2048
LOGIT_DIM = 1008


def expected_keys() -> list:
    """All torch state_dict keys of the FID Inception (for tests/validation)."""
    keys = []

    def basic(prefix):
        keys.extend(
            [
                f"{prefix}.conv.weight",
                f"{prefix}.bn.weight",
                f"{prefix}.bn.bias",
                f"{prefix}.bn.running_mean",
                f"{prefix}.bn.running_var",
            ]
        )

    for name, *_ in STEM:
        if name != "maxpool":
            basic(name)
    for mname, block in MIXED:
        for bname, spec in block.items():
            if bname == "pool":
                for conv in spec[1]:
                    basic(f"{mname}.{conv[0]}")
            elif bname.endswith("_split"):
                for part in spec:
                    for conv in part:
                        basic(f"{mname}.{conv[0]}")
            else:
                for conv in spec:
                    basic(f"{mname}.{conv[0]}")
    keys.extend(["fc.weight", "fc.bias"])
    return keys


def convert_state_dict(sd: Dict[str, "np.ndarray"]) -> Dict[str, np.ndarray]:
    """torch state_dict → numpy params (convs OIHW→HWIO, fc transposed)."""
    out = {}
    for k in expected_keys():
        v = sd[k]
        v = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        if k.endswith("conv.weight"):
            v = v.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif k == "fc.weight":
            v = v.transpose(1, 0)
        out[k] = v.astype(np.float32)
    return out


def load_torch_weights(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    # torch-fidelity prefixes the feature extractor; strip any common prefix.
    if not any(k.startswith("Conv2d_1a_3x3") for k in sd):
        for prefix in ("model.", "inception.", "module."):
            if any(k.startswith(prefix + "Conv2d_1a_3x3") for k in sd):
                sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
                break
    return convert_state_dict(sd)


# ------------------------------------------------------------------ forward


def _make_forward(params: Dict[str, np.ndarray]):
    import jax
    import jax.numpy as jnp

    P = {k: jnp.asarray(v) for k, v in params.items()}

    def basic(prefix, x, stride, pad):
        w = P[f"{prefix}.conv.weight"]
        x = jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(pad[0], pad[0]), (pad[1], pad[1])],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        mean = P[f"{prefix}.bn.running_mean"]
        var = P[f"{prefix}.bn.running_var"]
        scale = P[f"{prefix}.bn.weight"]
        bias = P[f"{prefix}.bn.bias"]
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return jax.nn.relu(x)

    def chain(mname, convs, x):
        for cname, _, k, s, p in convs:
            x = basic(f"{mname}.{cname}", x, s, p)
        return x

    def maxpool(x, stride, pad=0):
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, stride, stride, 1),
            [(0, 0), (pad, pad), (pad, pad), (0, 0)],
        )

    def avgpool_nopad(x):
        """3x3 stride-1 pad-1 average pool with count_include_pad=False."""
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
        ones = jnp.ones(x.shape[1:3], x.dtype)[None, :, :, None]
        cnt = jax.lax.reduce_window(
            ones, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        )
        return s / cnt

    def mixed(mname, block, x):
        outs = []
        for bname, spec in block.items():
            if bname == "pool":
                mode, convs = spec
                if mode == "avg":
                    y = avgpool_nopad(x)
                elif mode == "max":
                    y = maxpool(x, 1, pad=1)
                else:  # maxpool_s2: bare stride-2 max pool branch
                    y = maxpool(x, 2)
                y = chain(mname, convs, y) if convs else y
            elif bname.endswith("_split"):
                trunk, a, b = spec
                y0 = chain(mname, trunk, x)
                y = jnp.concatenate(
                    [chain(mname, a, y0), chain(mname, b, y0)], axis=-1
                )
            else:
                y = chain(mname, spec, x)
            outs.append(y)
        return jnp.concatenate(outs, axis=-1)

    def resize_tf1(x, out=299):
        """Origin-aligned bilinear upsample (TF1 ``resize_bilinear`` with
        ``align_corners=False``: src = dst * in/out, NO half-pixel offset) —
        the kernel torch-fidelity uses
        (interpolate_bilinear_2d_like_tensorflow1x). jax.image.resize's
        half-pixel convention (= pytorch-fid) shifts every feature slightly;
        matching the kernel matters for FID parity with torch-fidelity."""
        b, h, w, c = x.shape

        def axis(n_in):
            coords = jnp.arange(out, dtype=jnp.float32) * (n_in / out)
            lo = jnp.floor(coords).astype(jnp.int32)
            hi = jnp.minimum(lo + 1, n_in - 1)
            return lo, hi, coords - lo

        ylo, yhi, ty = axis(h)
        xlo, xhi, tx = axis(w)
        tx = tx[None, None, :, None]
        ty = ty[None, :, None, None]
        top = x[:, ylo][:, :, xlo] * (1 - tx) + x[:, ylo][:, :, xhi] * tx
        bot = x[:, yhi][:, :, xlo] * (1 - tx) + x[:, yhi][:, :, xhi] * tx
        return top * (1 - ty) + bot * ty

    def forward(imgs):
        """imgs [B,H,W,3] float in [0,1] → (features [B,2048],
        logits [B,1008] — UNBIASED (no fc bias), torch-fidelity's
        'logits_unbiased' feature that its inception score consumes)."""
        x = resize_tf1(imgs)
        x = (x * 255.0 - 128.0) / 128.0
        for name, _, k, s, p in STEM:
            if name == "maxpool":
                x = maxpool(x, 2)
            else:
                x = basic(name, x, s, p)
        for mname, block in MIXED:
            x = mixed(mname, block, x)
        feats = x.mean(axis=(1, 2))
        logits = feats @ P["fc.weight"]
        return feats, logits

    return jax.jit(forward)


class InceptionFeatures:
    """Callable extractor: images [N,H,W,3] in [0,1] → (feats, logits)."""

    feature_dim = FEATURE_DIM
    logit_dim = LOGIT_DIM

    def __init__(self, weights_path: str):
        self._forward = _make_forward(load_torch_weights(weights_path))

    def __call__(self, images: np.ndarray, batch: int = 64) -> Tuple[np.ndarray, np.ndarray]:
        import jax.numpy as jnp

        feats, logits = [], []
        for i in range(0, len(images), batch):
            f, l = self._forward(jnp.asarray(images[i : i + batch], jnp.float32))
            feats.append(np.asarray(f))
            logits.append(np.asarray(l))
        return np.concatenate(feats), np.concatenate(logits)
