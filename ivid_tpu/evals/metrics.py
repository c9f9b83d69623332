"""Generative-quality metrics: FID, KID, IS, with pluggable feature extractors.

The reference delegates to torch-fidelity's InceptionV3-compat pipeline
(reference: eval.py:133-137). This environment has no network egress and no
pretrained Inception weights, so the metric MACHINERY is implemented natively
(Frechet distance, polynomial-kernel MMD, inception score) and the feature
extractor is pluggable:

- ``inception:<path>`` — a local InceptionV3 weight file (torch state_dict of
  the torch-fidelity feature extractor); gives torch-fidelity-comparable FID.
- ``randconv`` (default) — a fixed-seed random convolutional feature network in
  JAX. Random-feature FID is a deterministic RELATIVE metric: it ranks model
  checkpoints and detects distribution drift, but its absolute scale is NOT
  comparable to Inception-FID. Results are labeled with the extractor name.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


# ---------------------------------------------------------------- statistics


def feature_statistics(features: np.ndarray):
    # float64 throughout, like torch-fidelity (and like the KID path below):
    # a float32 mean/outer-product over 10k features deviates measurably.
    features = np.asarray(features, np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """FID between two feature Gaussians (Heusel et al. 2017)."""
    import scipy.linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean, _ = scipy.linalg.sqrtm(sigma1 @ sigma2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def kernel_inception_distance(
    feats1: np.ndarray,
    feats2: np.ndarray,
    subset_size: int = 1000,
    num_subsets: int = 100,
    seed: int = 0,
) -> Dict[str, float]:
    """Unbiased MMD² with the torch-fidelity polynomial kernel
    ``(x·y/d + 1)³`` over random subsets."""
    rng = np.random.default_rng(seed)
    d = feats1.shape[1]
    n = min(subset_size, len(feats1), len(feats2))
    mmds = []
    for _ in range(num_subsets):
        x = feats1[rng.choice(len(feats1), n, replace=False)].astype(np.float64)
        y = feats2[rng.choice(len(feats2), n, replace=False)].astype(np.float64)
        kxx = (x @ x.T / d + 1) ** 3
        kyy = (y @ y.T / d + 1) ** 3
        kxy = (x @ y.T / d + 1) ** 3
        m = n
        sum_xx = (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
        sum_yy = (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
        sum_xy = kxy.mean()
        mmds.append(sum_xx + sum_yy - 2 * sum_xy)
    mmds = np.asarray(mmds)
    return {"mean": float(mmds.mean()), "std": float(mmds.std())}


def inception_score(
    logits: np.ndarray, splits: int = 10
) -> Dict[str, float]:
    """IS from classifier logits: exp(E_x KL(p(y|x) || p(y)))."""
    logits = logits - logits.max(axis=1, keepdims=True)
    probs = np.exp(logits)
    probs /= probs.sum(axis=1, keepdims=True)
    scores = []
    for chunk in np.array_split(probs, min(splits, len(probs))):
        if len(chunk) == 0:
            continue
        marginal = chunk.mean(axis=0, keepdims=True)
        kl = (chunk * (np.log(chunk + 1e-12) - np.log(marginal + 1e-12))).sum(axis=1)
        scores.append(np.exp(kl.mean()))
    return {"mean": float(np.mean(scores)), "std": float(np.std(scores))}


# ----------------------------------------------------------- feature network


class RandConvFeatures:
    """Fixed-seed random convolutional feature extractor (JAX).

    5 conv-pool stages (stride-2, 3x3, leaky-relu) from 3x299-ish inputs down
    to a 2048-d global-average feature plus a 1008-d random logit head (matching
    the Inception feature/logit dims so downstream code is drop-in)."""

    feature_dim = 2048
    logit_dim = 1008

    def __init__(self, seed: int = 0, image_size: int = 128):
        import jax
        import jax.numpy as jnp

        self._jax = jax
        self._jnp = jnp
        key = jax.random.PRNGKey(seed)
        widths = [64, 128, 256, 512, self.feature_dim]
        params = []
        c_in = 3
        for w in widths:
            key, k1 = jax.random.split(key)
            params.append(
                jax.random.normal(k1, (3, 3, c_in, w), jnp.float32)
                * np.sqrt(2.0 / (9 * c_in))
            )
            c_in = w
        key, k2 = jax.random.split(key)
        head = jax.random.normal(
            k2, (self.feature_dim, self.logit_dim), jnp.float32
        ) * np.sqrt(1.0 / self.feature_dim)
        self.params = params
        self.head = head

        def forward(imgs):  # [B,H,W,3] in [0,1]
            x = imgs * 2 - 1
            for kern in self.params:
                x = jax.lax.conv_general_dilated(
                    x, kern, (2, 2), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                x = jax.nn.leaky_relu(x, 0.2)
            feats = x.mean(axis=(1, 2))
            logits = feats @ self.head
            return feats, logits

        self._forward = jax.jit(forward)

    def __call__(self, images: np.ndarray, batch: int = 64):
        feats, logits = [], []
        for i in range(0, len(images), batch):
            f, l = self._forward(self._jnp.asarray(images[i : i + batch]))
            feats.append(np.asarray(f))
            logits.append(np.asarray(l))
        return np.concatenate(feats), np.concatenate(logits)


def get_extractor(name: str, image_size: int = 128):
    if name == "randconv":
        return RandConvFeatures(image_size=image_size)
    if name.startswith("inception:"):
        from ivid_tpu.evals.inception import InceptionFeatures

        return InceptionFeatures(name.split(":", 1)[1])
    raise ValueError(f"unknown extractor {name!r}")


def extract_features(
    images: np.ndarray, ext, cache_path: Optional[str] = None
):
    """Run (or load cached) features+logits for an image set. The feature
    cache mirrors the reference's torch-fidelity stat caching
    (reference: eval.py:11-23) — real-set features are reused across evals.

    Staleness is checked by a content fingerprint of the image set (sampled
    pixel hash + shape), not just the image count: a regenerated set with the
    same count under the same cache name must not score stale features."""
    import os

    fp = _image_set_fingerprint(images)
    if cache_path and os.path.exists(cache_path):
        z = np.load(cache_path)
        if "fingerprint" in z and str(z["fingerprint"]) == fp:
            return z["feats"], z["logits"]
        # Fingerprint mismatch (or a pre-fingerprint cache): the image set
        # changed under the same cache name — recompute rather than silently
        # score stale features.
    feats, logits = ext(images)
    if cache_path:
        os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
        np.savez_compressed(cache_path, feats=feats, logits=logits, fingerprint=fp)
    return feats, logits


def _image_set_fingerprint(images: np.ndarray) -> str:
    """Cheap content hash: shape + sha1 over <=256 deterministically sampled
    images. O(sample) regardless of set size; any regeneration of the set is
    overwhelmingly likely to change it."""
    import hashlib

    n = len(images)
    idx = np.linspace(0, n - 1, num=min(n, 256), dtype=np.int64) if n else []
    h = hashlib.sha1()
    h.update(repr((images.shape, str(images.dtype))).encode())
    for i in idx:
        h.update(np.ascontiguousarray(images[i]).tobytes())
    return h.hexdigest()


def _safe_tag(extractor: str) -> str:
    return extractor.replace("/", "_").replace(":", "-")


def compute_metrics(
    fake_images: np.ndarray,
    real_images: np.ndarray,
    extractor: str = "randconv",
    isc: bool = True,
    fid: bool = True,
    kid: bool = True,
    cache_dir: Optional[str] = None,
    fake_name: Optional[str] = None,
    real_name: Optional[str] = None,
) -> Dict[str, float]:
    """Images are [N,H,W,3] float in [0,1]. Returns a torch-fidelity-shaped
    metrics dict with the extractor recorded. With ``cache_dir`` + names set,
    extracted features are cached as ``<cache_dir>/<name>-feats-<ext>.npz``."""
    import os

    ext = get_extractor(extractor, image_size=fake_images.shape[1])

    def cpath(name):
        if cache_dir is None or name is None:
            return None
        return os.path.join(cache_dir, f"{name}-feats-{_safe_tag(extractor)}.npz")

    f_fake, l_fake = extract_features(fake_images, ext, cpath(fake_name))
    f_real, _ = extract_features(real_images, ext, cpath(real_name))
    out: Dict[str, float] = {"feature_extractor": extractor}
    if fid:
        out["frechet_inception_distance"] = frechet_distance(
            *feature_statistics(f_fake), *feature_statistics(f_real)
        )
    if kid:
        k = kernel_inception_distance(f_fake, f_real)
        out["kernel_inception_distance_mean"] = k["mean"]
        out["kernel_inception_distance_std"] = k["std"]
    if isc:
        s = inception_score(l_fake)
        out["inception_score_mean"] = s["mean"]
        out["inception_score_std"] = s["std"]
    return out
