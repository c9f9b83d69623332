"""Metric machinery tests: FID/KID/IS math on controlled distributions."""

import numpy as np
import pytest

from ivid_tpu.evals.metrics import (
    RandConvFeatures,
    compute_metrics,
    feature_statistics,
    frechet_distance,
    inception_score,
    kernel_inception_distance,
)


def test_frechet_distance_identical_zero():
    rng = np.random.default_rng(0)
    f = rng.normal(size=(500, 16))
    mu, sig = feature_statistics(f)
    assert abs(frechet_distance(mu, sig, mu, sig)) < 1e-6


def test_frechet_distance_mean_shift():
    """For equal covariances, FID = ||mu1 - mu2||²."""
    rng = np.random.default_rng(0)
    f = rng.normal(size=(20000, 8))
    mu, sig = feature_statistics(f)
    shift = np.full(8, 0.5)
    d = frechet_distance(mu, sig, mu + shift, sig)
    np.testing.assert_allclose(d, float(shift @ shift), rtol=1e-3)


def test_kid_sign_and_zero():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(800, 16))
    b = rng.normal(size=(800, 16))
    c = rng.normal(size=(800, 16)) + 1.0
    same = kernel_inception_distance(a, b, subset_size=400, num_subsets=20)
    diff = kernel_inception_distance(a, c, subset_size=400, num_subsets=20)
    assert abs(same["mean"]) < 0.05
    assert diff["mean"] > same["mean"] + 0.1


def test_inception_score_bounds():
    rng = np.random.default_rng(0)
    # Uniform logits → IS ≈ 1.
    flat = np.zeros((1000, 10))
    assert abs(inception_score(flat)["mean"] - 1.0) < 1e-3
    # Confident, diverse predictions → IS near the class count.
    classes = rng.integers(0, 10, 1000)
    sharp = np.full((1000, 10), -20.0)
    sharp[np.arange(1000), classes] = 20.0
    assert inception_score(sharp)["mean"] > 8.0


def test_randconv_extractor_deterministic():
    rng = np.random.default_rng(0)
    imgs = rng.uniform(size=(8, 32, 32, 3)).astype(np.float32)
    e1 = RandConvFeatures(seed=0, image_size=32)
    e2 = RandConvFeatures(seed=0, image_size=32)
    f1, l1 = e1(imgs)
    f2, l2 = e2(imgs)
    np.testing.assert_allclose(f1, f2, atol=1e-6)
    assert f1.shape == (8, 2048) and l1.shape == (8, 1008)


@pytest.mark.slow  # ~72s on the 1-core dev box; default tier budget is 20 min
def test_compute_metrics_discriminates():
    """Same-distribution FID must be far below shifted-distribution FID."""
    rng = np.random.default_rng(0)
    base = rng.uniform(size=(128, 32, 32, 3)).astype(np.float32)
    same = rng.uniform(size=(128, 32, 32, 3)).astype(np.float32)
    shifted = np.clip(same * 0.3, 0, 1)
    m_same = compute_metrics(base, same, isc=False, kid=False)
    m_diff = compute_metrics(base, shifted, isc=False, kid=False)
    # n=128 << d=2048 gives a large finite-sample FID floor; discrimination is
    # relative, not absolute.
    assert m_diff["frechet_inception_distance"] > 1.3 * m_same["frechet_inception_distance"]
