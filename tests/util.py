"""Shared test fixtures/builders (reference: bayesian_quadrature/tests/util.py).

A seeded 1-D analytic testbed: Gaussian likelihood ℓ(x) = N(x | μ_l, σ_l²)
under a standard-normal measure, so the true evidence has the closed form
Z = N(μ_l | 0, 1 + σ_l²) — the end-to-end oracle for E[Z].
"""

import numpy as np
from scipy import stats

import tpubq

SEED = 2348
MU_L, SIG_L = 0.2, 0.5
X_MEAN, X_VAR = 0.0, 1.0

DEFAULT_OPTIONS = dict(
    n_candidate=12,
    candidate_thresh=0.2,
    x_mean=X_MEAN,
    x_var=X_VAR,
    max_obs=16,
)


def f_l(x):
    return stats.norm.pdf(x, MU_L, SIG_L)


def true_Z():
    return float(stats.norm.pdf(MU_L, X_MEAN, np.sqrt(X_VAR + SIG_L**2)))


def make_x(n=10):
    return np.linspace(-2.2, 2.2, n)


def make_bq(n=10, init=True, **overrides):
    x = make_x(n)
    opts = dict(DEFAULT_OPTIONS)
    opts.update(overrides)
    bq = tpubq.BQ(x, f_l(x), **opts)
    if init:
        bq.init(params_tl=(0.7, 0.8), params_l=(0.3, 0.4))
    return bq


def make_xo(n=4001, lo=-8.0, hi=8.0):
    return np.linspace(lo, hi, n)
