"""Slice sampler correctness (reference: tests/test_util.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpubq.models.marginalize import slice_sample


def test_slice_sample_gaussian_moments():
    mu, sd = 1.3, 0.7

    def logpdf(u):
        return -0.5 * ((u[0] - mu) / sd) ** 2

    us = slice_sample(
        jax.random.PRNGKey(0), logpdf, jnp.asarray([0.0]), n=4000, nburn=200
    )
    s = np.asarray(us)[:, 0]
    assert abs(s.mean() - mu) < 0.05
    assert abs(s.std() - sd) < 0.05


def test_slice_sample_2d_correlated():
    cov = np.array([[1.0, 0.6], [0.6, 1.0]])
    P = np.linalg.inv(cov)

    def logpdf(u):
        return -0.5 * u @ jnp.asarray(P) @ u

    us = np.asarray(
        slice_sample(jax.random.PRNGKey(1), logpdf, jnp.zeros(2), n=6000, nburn=300)
    )
    emp = np.cov(us.T)
    np.testing.assert_allclose(emp, cov, atol=0.12)


def test_slice_sample_respects_support():
    """-inf logpdf regions are never visited (positivity constraints)."""

    def logpdf(u):
        return jnp.where(u[0] > 0, -u[0], -jnp.inf)

    us = np.asarray(
        slice_sample(jax.random.PRNGKey(2), logpdf, jnp.asarray([1.0]), n=2000, nburn=100)
    )
    assert np.all(us > 0)
    assert abs(us.mean() - 1.0) < 0.1  # Exp(1) mean
