"""Numerical parity of the JAX FID-InceptionV3 against a torch mirror.

No pretrained weights exist in this environment, so the test builds a
random-weight state_dict in the exact torch-fidelity/pytorch-fid key format,
runs it through (a) a faithful torch implementation of the FID-edition
network defined here and (b) the JAX implementation
(ivid_tpu/evals/inception.py), and compares features/logits. This validates
the architecture wiring, the FID pooling quirks, the BN math, and the
state_dict conversion — everything except the weight values themselves
(reference: eval.py:133-137 delegates to torch-fidelity's pretrained net)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow
import torch
import torch.nn as nn
import torch.nn.functional as F

from ivid_tpu.evals.inception import (
    LOGIT_DIM,
    convert_state_dict,
    expected_keys,
    _make_forward,
)


class BasicConv2d(nn.Module):
    def __init__(self, cin, cout, **kw):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
        self.bn = nn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class FidInceptionA(nn.Module):
    def __init__(self, cin, pool_features):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
        self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
        self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b5 = self.branch5x5_2(self.branch5x5_1(x))
        b3 = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = self.branch_pool(
            F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
        )
        return torch.cat([b1, b5, b3, bp], 1)


class FidInceptionB(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
        self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
        self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3(x)
        bd = self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x)))
        bp = F.max_pool2d(x, 3, stride=2)
        return torch.cat([b3, bd, bp], 1)


class FidInceptionC(nn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
        self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(
            self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))
            )
        )
        bp = self.branch_pool(
            F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
        )
        return torch.cat([b1, b7, bd, bp], 1)


class FidInceptionD(nn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
        self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
        self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)
        self.pool = lambda x: F.max_pool2d(x, 3, stride=2)

    def forward(self, x):
        b3 = self.branch3x3_2(self.branch3x3_1(x))
        b7 = self.branch7x7x3_4(
            self.branch7x7x3_3(self.branch7x7x3_2(self.branch7x7x3_1(x)))
        )
        return torch.cat([b3, b7, self.pool(x)], 1)


class FidInceptionE(nn.Module):
    def __init__(self, cin, pool_mode):
        super().__init__()
        self.pool_mode = pool_mode
        self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
        self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
        self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
        self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
        self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
        self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

    def forward(self, x):
        b1 = self.branch1x1(x)
        t = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(t), self.branch3x3_2b(t)], 1)
        t = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(t), self.branch3x3dbl_3b(t)], 1)
        if self.pool_mode == "max":
            bp = F.max_pool2d(x, 3, stride=1, padding=1)
        else:
            bp = F.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)
        return torch.cat([b1, b3, bd, self.branch_pool(bp)], 1)


class TorchFidInception(nn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
        self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
        self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
        self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
        self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
        self.Mixed_5b = FidInceptionA(192, 32)
        self.Mixed_5c = FidInceptionA(256, 64)
        self.Mixed_5d = FidInceptionA(288, 64)
        self.Mixed_6a = FidInceptionB(288)
        self.Mixed_6b = FidInceptionC(768, 128)
        self.Mixed_6c = FidInceptionC(768, 160)
        self.Mixed_6d = FidInceptionC(768, 160)
        self.Mixed_6e = FidInceptionC(768, 192)
        self.Mixed_7a = FidInceptionD(768)
        self.Mixed_7b = FidInceptionE(1280, "avg")
        self.Mixed_7c = FidInceptionE(2048, "max")
        self.fc = nn.Linear(2048, LOGIT_DIM)

    @staticmethod
    def _resize_tf1(x, out=299):
        # TF1-style origin-aligned bilinear (torch-fidelity's
        # interpolate_bilinear_2d_like_tensorflow1x): src = dst * in/out.
        b, c, h, w = x.shape

        def axis(n_in):
            coords = torch.arange(out, dtype=torch.float32) * (n_in / out)
            lo = torch.floor(coords).long()
            hi = torch.clamp(lo + 1, max=n_in - 1)
            return lo, hi, coords - lo

        ylo, yhi, ty = axis(h)
        xlo, xhi, tx = axis(w)
        tx = tx.view(1, 1, 1, -1)
        ty = ty.view(1, 1, -1, 1)
        top = x[:, :, ylo][:, :, :, xlo] * (1 - tx) + x[:, :, ylo][:, :, :, xhi] * tx
        bot = x[:, :, yhi][:, :, :, xlo] * (1 - tx) + x[:, :, yhi][:, :, :, xhi] * tx
        return top * (1 - ty) + bot * ty

    def forward(self, x01):
        x = self._resize_tf1(x01)
        x = (x * 255.0 - 128.0) / 128.0
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = F.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = F.max_pool2d(x, 3, stride=2)
        for name in [
            "Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a", "Mixed_6b",
            "Mixed_6c", "Mixed_6d", "Mixed_6e", "Mixed_7a", "Mixed_7b",
            "Mixed_7c",
        ]:
            x = getattr(self, name)(x)
        feats = x.mean(dim=(2, 3))
        # torch-fidelity's 'logits_unbiased': fc matmul WITHOUT the bias.
        return feats, F.linear(feats, self.fc.weight)


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(0)
    net = TorchFidInception().eval()
    # Randomize BN running stats too (fresh BNs have mean 0 / var 1).
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.05)
                m.running_var.uniform_(0.5, 1.5)
    return net


def test_state_dict_keys_match(torch_net):
    ours = set(expected_keys())
    theirs = {
        k for k in torch_net.state_dict() if not k.endswith("num_batches_tracked")
    }
    assert ours == theirs


def test_inception_forward_parity(torch_net):
    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        tf_, tl = torch_net(torch.from_numpy(imgs.transpose(0, 3, 1, 2)))
    params = convert_state_dict(torch_net.state_dict())
    fwd = _make_forward(params)
    jf, jl = fwd(imgs)

    np.testing.assert_allclose(np.asarray(jf), tf_.numpy(), atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jl), tl.numpy(), atol=2e-3, rtol=1e-3)


def test_inception_extractor_end_to_end(torch_net, tmp_path):
    """Save a .pt state_dict, load via the public path, compute metrics."""
    import torch as _t

    path = tmp_path / "pt_inception_random.pt"
    _t.save(torch_net.state_dict(), path)

    from ivid_tpu.evals.metrics import compute_metrics

    rng = np.random.default_rng(1)
    fake = rng.uniform(size=(8, 32, 32, 3)).astype(np.float32)
    real = np.clip(fake + rng.normal(scale=0.05, size=fake.shape), 0, 1).astype(
        np.float32
    )
    m = compute_metrics(
        fake, real, extractor=f"inception:{path}",
        kid=False,  # 8 samples is too few for the subset MMD
        cache_dir=str(tmp_path), real_name="realset",
    )
    assert np.isfinite(m["frechet_inception_distance"])
    assert m["frechet_inception_distance"] >= 0
    assert np.isfinite(m["inception_score_mean"])
    # Real-feature cache was written and reloading gives identical numbers.
    assert any(p.name.startswith("realset-feats") for p in tmp_path.iterdir())
    m2 = compute_metrics(
        fake, real, extractor=f"inception:{path}",
        kid=False, cache_dir=str(tmp_path), real_name="realset",
    )
    assert m2["frechet_inception_distance"] == pytest.approx(
        m["frechet_inception_distance"], rel=1e-6
    )
