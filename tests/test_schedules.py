"""Golden-value and identity tests for the diffusion schedule tables
(reference formulas: diffusion/frameworks/utils.py, diffusion/samplers/ddpm.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ivid_tpu.diffusion import schedules as sched


def test_linear_betas_golden():
    betas = sched.linear_betas(1000)
    assert betas.shape == (1000,)
    # Ho et al. endpoints at T=1000.
    assert betas[0] == pytest.approx(0.0001)
    assert betas[-1] == pytest.approx(0.02)
    # Scale-invariant extension: T=500 doubles the endpoints.
    betas500 = sched.linear_betas(500)
    assert betas500[0] == pytest.approx(0.0002)
    assert betas500[-1] == pytest.approx(0.04)


def test_cosine_betas_golden():
    betas = sched.cosine_betas(1000)
    assert betas.shape == (1000,)
    assert (betas > 0).all() and (betas <= 0.999).all()
    # First beta from the closed form: 1 - alpha_bar(1/T)/alpha_bar(0).
    a = lambda t: np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
    assert betas[0] == pytest.approx(1 - a(1 / 1000) / a(0))
    # Late betas hit the 0.999 cap.
    assert betas[-1] == pytest.approx(0.999)


def test_table_identities():
    s = sched.Schedule.create("linear", 100)
    acp = np.asarray(s.alphas_cumprod, dtype=np.float64)
    betas = np.asarray(s.betas, dtype=np.float64)
    np.testing.assert_allclose(
        np.asarray(s.sqrt_alphas_cumprod) ** 2, acp, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(s.sqrt_one_minus_alphas_cumprod) ** 2, 1 - acp, rtol=1e-4
    )
    # Posterior mean coefficients sum: c1*sqrt(acp) ... verify the DDPM identity
    # mu = c1*x0 + c2*xt reproduces x0 when xt = sqrt(acp)*x0 (zero noise, t>0).
    t = 50
    x0 = 1.0
    xt = np.sqrt(acp[t]) * x0
    c1 = float(s.posterior_mean_coef1[t])
    c2 = float(s.posterior_mean_coef2[t])
    mu = c1 * x0 + c2 * xt
    # With zero noise the posterior mean must equal sqrt(acp_prev)*x0.
    np.testing.assert_allclose(mu, np.sqrt(acp[t - 1] if t > 0 else 1.0), rtol=1e-5)
    # Variance identity.
    np.testing.assert_allclose(
        np.asarray(s.posterior_variance)[1:],
        betas[1:] * (1 - acp[:-1]) / (1 - acp[1:]),
        rtol=1e-4,
    )


def test_extract_broadcast():
    s = sched.Schedule.create("linear", 1000)
    t = jnp.array([0, 3, 999])
    out = sched.extract(s.betas, t, 4)
    assert out.shape == (3, 1, 1, 1)
    np.testing.assert_allclose(out[:, 0, 0, 0], np.asarray(s.betas)[[0, 3, 999]])


def test_diffuse_reverse_roundtrip():
    s = sched.Schedule.create("linear", 1000)
    x0 = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 4)), jnp.float32)
    noise = jnp.asarray(np.random.default_rng(1).normal(size=x0.shape), jnp.float32)
    t = jnp.array([100, 900])
    xt = sched.diffuse(s, x0, t, noise)
    x0_rec = sched.reverse_diffuse(s, xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-3)
    # eps <-> x0 conversions are mutually inverse.
    eps = sched.predict_eps_from_xstart(s, xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps), np.asarray(noise), atol=1e-2)
    x0_back = sched.predict_xstart_from_eps(s, xt, t, eps)
    np.testing.assert_allclose(np.asarray(x0_back), np.asarray(x0), atol=1e-3)


def test_tables_match_reference_implementation():
    """Cross-check every table against the reference construction
    (reference: diffusion/samplers/ddpm.py:26-41) re-derived in float64."""
    for name, T in [("linear", 1000), ("cosine", 250)]:
        s = sched.Schedule.create(name, T)
        betas = sched.get_betas(name, T).astype(np.float64)
        alphas = 1.0 - betas
        acp = np.cumprod(alphas)
        acp_prev = np.append(1.0, acp[:-1])
        pv = betas * (1.0 - acp_prev) / (1.0 - acp)
        np.testing.assert_allclose(np.asarray(s.alphas_cumprod), acp, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s.sqrt_recip_alphas_cumprod), np.sqrt(1 / acp), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s.sqrt_recipm1_alphas_cumprod), np.sqrt(1 / acp - 1), rtol=1e-4, atol=1e-6
        )
        np.testing.assert_allclose(np.asarray(s.posterior_variance), pv, rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(s.posterior_log_variance_clipped),
            np.log(np.append(pv[1], pv[1:])),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(s.posterior_mean_coef1),
            betas * np.sqrt(acp_prev) / (1.0 - acp),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(s.posterior_mean_coef2),
            (1.0 - acp_prev) * np.sqrt(alphas) / (1.0 - acp),
            rtol=1e-5,
        )
