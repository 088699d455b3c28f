"""Closed-form Gaussian-kernel integrals against a Gaussian measure.

Reference parity: these are the capabilities of the reference's Cython layer
``bayesian_quadrature/bq_c.pyx`` (``int_K``, ``int_int_K``, ``int_K1_K2``,
``int_int_K1_K2`` and the ``approx_*`` grid-quadrature twins). The reference
wrote them as per-element C loops because 2014-era NumPy could not fuse them;
here each is a single fused XLA expression (elementwise + small-matrix
solves + dots), which is the idiomatic TPU replacement — the MXU/VPU consume
the whole batch in one dispatch.

Notation. The Gaussian kernel with parameters ``(h, w)`` (``w`` a length-d
vector of per-dimension scales) can be written as a scaled Gaussian density:

    k(a, b) = h^2 exp(-1/2 (a-b)^T W^{-1} (a-b)) = c · N(a | b, W),
    W = diag(w^2),  c = h^2 (2π)^{d/2} |W|^{1/2}.

The measure is ``p(x) = N(x | mu, Sigma)`` with full ``Sigma``. Products and
marginals of Gaussians then give every integral below in closed form; each
function's docstring states the identity it implements so the quadrature
twins in ``approx_*`` can verify it numerically (mirrors the reference's
``tests/test_bq_c.py`` strategy).

Shapes: ``x1: (n1, d)``, ``x2: (n2, d)``, ``mu: (d,)``, ``Sigma: (d, d)``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import scipy as jsp

__all__ = [
    "int_K",
    "int_int_K",
    "int_K1_K2",
    "int_int_K1_K2",
    "int_K1_int_K2",
    "gauss_logpdf",
    "approx_int_K",
    "approx_int_int_K",
    "approx_int_K1_K2",
    "approx_int_int_K1_K2",
    "approx_int_K1_int_K2",
]

_LOG2PI = math.log(2.0 * math.pi)


def _chol(S):
    return jnp.linalg.cholesky(S)


def gauss_logpdf(X: jnp.ndarray, mu: jnp.ndarray, S: jnp.ndarray) -> jnp.ndarray:
    """log N(X | mu, S) for X of shape (..., d) with one shared (d, d) cov."""
    d = S.shape[-1]
    L = _chol(S)
    diff = X - mu
    flat = diff.reshape((-1, d)).T  # (d, m)
    sol = jsp.linalg.solve_triangular(L, flat, lower=True)  # (d, m)
    quad = jnp.sum(sol * sol, axis=0).reshape(diff.shape[:-1])
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diag(L)))
    return -0.5 * (quad + d * _LOG2PI + logdet)


def _scale(h, w):
    """c = h^2 (2π)^{d/2} |W|^{1/2} so that k(a,b) = c N(a | b, W)."""
    d = w.shape[0]
    return (h * h) * ((2.0 * math.pi) ** (0.5 * d)) * jnp.prod(w)


def _W(w):
    return jnp.diag(w * w)


def _check_w(Sigma, *ws):
    """Trace-time guard: every length-scale vector must match the measure's
    dimension. A length-1 w broadcasting elementwise into ``W + Sigma``
    silently computes a different integral (ADVICE r1, medium) — fail instead."""
    d = Sigma.shape[-1]
    for w in ws:
        w = jnp.asarray(w)
        if w.ndim != 1 or w.shape[0] != d:
            raise ValueError(
                f"kernel length-scales must be a ({d},) vector matching the "
                f"measure dimension; got shape {tuple(w.shape)}"
            )


def int_K(x, h, w, mu, Sigma):
    """∫ k(x', x_i) N(x' | mu, Sigma) dx'  →  (n,).

    Identity: c · N(x_i | mu, W + Sigma).
    Reference: bq_c.pyx::int_K.
    """
    _check_w(Sigma, w)
    return _scale(h, w) * jnp.exp(gauss_logpdf(x, mu, _W(w) + Sigma))


def int_int_K(d, h, w, mu, Sigma):
    """∫∫ k(x, x') N(x|mu,Sigma) N(x'|mu,Sigma) dx dx'  →  scalar.

    Identity: c · N(0 | 0, W + 2 Sigma) = h^2 |W|^{1/2} |W + 2 Sigma|^{-1/2}.
    Reference: bq_c.pyx::int_int_K.
    """
    del d, mu
    _check_w(Sigma, w)
    zero = jnp.zeros((w.shape[0],), dtype=w.dtype)
    return _scale(h, w) * jnp.exp(gauss_logpdf(zero, zero, _W(w) + 2.0 * Sigma))


def int_K1_K2(x1, x2, h1, w1, h2, w2, mu, Sigma):
    """∫ k1(x1_i, x) k2(x, x2_j) N(x|mu,Sigma) dx  →  (n1, n2).

    Identity: with C = (W1^{-1} + W2^{-1})^{-1} and
    m_ij = C (W1^{-1} x1_i + W2^{-1} x2_j):
        c1 c2 · N(x1_i | x2_j, W1 + W2) · N(m_ij | mu, C + Sigma).
    Reference: bq_c.pyx::int_K1_K2.
    """
    _check_w(Sigma, w1, w2)
    W1, W2 = _W(w1), _W(w2)
    # Diagonal algebra for C and m (W1, W2 diagonal).
    w1s, w2s = w1 * w1, w2 * w2
    c_diag = w1s * w2s / (w1s + w2s)
    C = jnp.diag(c_diag)
    # pairwise means m_ij: (n1, n2, d)
    m = (w2s * x1[:, None, :] + w1s * x2[None, :, :]) / (w1s + w2s)
    term1 = gauss_logpdf(x1[:, None, :] - x2[None, :, :], jnp.zeros_like(mu), W1 + W2)
    term2 = gauss_logpdf(m, mu, C + Sigma)
    return _scale(h1, w1) * _scale(h2, w2) * jnp.exp(term1 + term2)


def int_int_K1_K2(x1, x2, h1, w1, h2, w2, mu, Sigma):
    """∫∫ k1(x1_a, x) k2(x, x') k1(x', x2_b) p(x) p(x') dx dx'  →  (n1, n2).

    The double integral transporting the inner kernel k2 (the log-GP kernel)
    through two copies of the outer kernel k1 (the linear-GP kernel) — the
    V[Z] workhorse. Identity: with S1 = (W1^{-1} + Sigma^{-1})^{-1} and
    δm_ab = S1 W1^{-1} (x1_a - x2_b):
        c1^2 c2 · N(x1_a | mu, W1+Sigma) · N(x2_b | mu, W1+Sigma)
                · N(δm_ab | 0, 2 S1 + W2).
    Reference: bq_c.pyx::int_int_K1_K2.
    """
    _check_w(Sigma, w1, w2)
    W1, W2 = _W(w1), _W(w2)
    A = W1 + Sigma
    S1 = W1 @ jnp.linalg.solve(A, Sigma)  # (W1^{-1} + Sigma^{-1})^{-1}
    # δm_ab = S1 W1^{-1} (x1_a - x2_b); S1 W1^{-1} = (W1^{-1} S1)^T = Sigma A^{-1}
    M = jnp.linalg.solve(A.T, Sigma.T).T  # Sigma @ A^{-1}
    diff = x1[:, None, :] - x2[None, :, :]
    dm = jnp.einsum("ij,abj->abi", M, diff)
    la = gauss_logpdf(x1, mu, A)
    lb = gauss_logpdf(x2, mu, A)
    lm = gauss_logpdf(dm, jnp.zeros_like(mu), 2.0 * S1 + W2)
    c1 = _scale(h1, w1)
    c2 = _scale(h2, w2)
    return (c1 * c1 * c2) * jnp.exp(la[:, None] + lb[None, :] + lm)


def int_K1_int_K2(x1, h1, w1, h2, w2, mu, Sigma):
    """∫∫ k1(x1_a, x) k2(x, x') p(x) p(x') dx dx'  →  (n1,).

    Identity: with S3 = ((W2+Sigma)^{-1} + Sigma^{-1})^{-1}:
        c1 c2 · N(0 | 0, W2 + 2 Sigma) · N(x1_a | mu, W1 + S3).
    (Cross term between the linear-GP mean and the prior-mean part of the
    transported covariance; see tpubq.models.bq.Z_var.)
    """
    _check_w(Sigma, w1, w2)
    W1, W2 = _W(w1), _W(w2)
    B = W2 + Sigma
    S3 = B @ jnp.linalg.solve(W2 + 2.0 * Sigma, Sigma)
    zero = jnp.zeros_like(mu)
    l0 = gauss_logpdf(zero, zero, W2 + 2.0 * Sigma)
    la = gauss_logpdf(x1, mu, W1 + S3)
    return _scale(h1, w1) * _scale(h2, w2) * jnp.exp(l0 + la)


# ---------------------------------------------------------------------------
# Quadrature twins (1-D trapezoid over a dense grid xo), mirroring the
# reference's approx_* functions used by tests/test_bq_c.py to validate the
# closed forms. Work for any kernel function `kfn(theta, x1, x2)`.
# ---------------------------------------------------------------------------


def _pdf_1d(xo, mu, Sigma):
    s2 = Sigma.reshape(())
    m = mu.reshape(())
    return jnp.exp(-0.5 * (xo - m) ** 2 / s2) / jnp.sqrt(2.0 * math.pi * s2)


def approx_int_K(kfn, theta, x, xo, mu, Sigma):
    """(n,) trapezoid approximation of int_K on the 1-D grid xo (m,)."""
    K = kfn(theta, xo[:, None], x)  # (m, n)
    p = _pdf_1d(xo, mu, Sigma)
    return jnp.trapezoid(K * p[:, None], xo, axis=0)


def approx_int_int_K(kfn, theta, xo, mu, Sigma):
    K = kfn(theta, xo[:, None], xo[:, None])  # (m, m)
    p = _pdf_1d(xo, mu, Sigma)
    inner = jnp.trapezoid(K * p[None, :], xo, axis=1)
    return jnp.trapezoid(inner * p, xo)


def approx_int_K1_K2(k1fn, k2fn, t1, t2, x1, x2, xo, mu, Sigma):
    K1 = k1fn(t1, x1, xo[:, None])  # (n1, m)
    K2 = k2fn(t2, xo[:, None], x2)  # (m, n2)
    p = _pdf_1d(xo, mu, Sigma)
    return jnp.trapezoid(K1[:, :, None] * K2[None, :, :] * p[None, :, None], xo, axis=1)


def approx_int_int_K1_K2(k1fn, k2fn, t1, t2, x1, x2, xo, mu, Sigma):
    p = _pdf_1d(xo, mu, Sigma)
    K1a = k1fn(t1, x1, xo[:, None])  # (n1, m) — k1(x1_a, x)
    K2 = k2fn(t2, xo[:, None], xo[:, None])  # (m, m) — k2(x, x')
    K1b = k1fn(t1, xo[:, None], x2)  # (m, n2) — k1(x', x2_b)
    inner = jnp.trapezoid(K2[:, :, None] * (K1b * p[:, None])[None, :, :], xo, axis=1)
    return jnp.trapezoid((K1a * p[None, :])[:, :, None] * inner[None, :, :], xo, axis=1)


def approx_int_K1_int_K2(k1fn, k2fn, t1, t2, x1, xo, mu, Sigma):
    p = _pdf_1d(xo, mu, Sigma)
    K2 = k2fn(t2, xo[:, None], xo[:, None])
    ik2 = jnp.trapezoid(K2 * p[None, :], xo, axis=1)  # (m,) = ∫k2(x,x')p(x')dx'
    K1 = k1fn(t1, x1, xo[:, None])  # (n1, m)
    return jnp.trapezoid(K1 * (ik2 * p)[None, :], xo, axis=1)
