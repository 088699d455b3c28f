"""Hyperparameter marginalization: slice sampling + batched estimation.

Reference parity: ``bayesian_quadrature/util.py::slice_sample`` (Neal-2003
coordinate-wise slice sampling with step-out and shrink) driving
``bq.py::BQ.sample_hypers`` / ``BQ.marginalize``. The reference loops
sequentially: every sample triggers a fresh Cholesky refactorization in
Python. Here the sampler chain is a ``lax.scan`` (sequential by nature) with
the step-out/shrink brackets as bounded ``lax.while_loop``s, and the
*estimation* sweep over the collected samples is one vmapped
batched-Cholesky pipeline (BASELINE.json config 5: E[Z]/V[Z] over 100
sampled length-scales in a single dispatch).

Sampling is in u = log(theta) space (positivity for free) with a weak
N(0, 5²) prior on each coordinate, targeting log_MLL(e^u) + log_prior(u).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from tpubq.models import gp as gpm
from tpubq.models.bq import BQState, Z_mean, Z_var, set_params
from tpubq.ops.kernels import get_kernel
from tpubq.utils.options import BQOptions

__all__ = ["slice_sample", "sample_hypers", "marginalize"]

_MAX_STEPOUT = 32
_MAX_SHRINK = 64
_PRIOR_STD = 5.0


def _slice_coord(key, logpdf: Callable, u, j, lp0, width):
    """One univariate slice-sampling update of coordinate j (Neal 2003).

    util.py::slice_sample parity: step-out with fixed width, then shrink.
    Returns (u_new, lp_new).
    """
    k_y, k_pos, k_shrink = jax.random.split(key, 3)
    logy = lp0 + jnp.log(jax.random.uniform(k_y, dtype=u.dtype))
    x0 = u[j]
    r = jax.random.uniform(k_pos, dtype=u.dtype)
    L0 = x0 - r * width
    R0 = L0 + width

    def f(xj):
        return logpdf(u.at[j].set(xj))

    def out_cond(c):
        edge, n, _side = c
        return jnp.logical_and(f(edge) > logy, n < _MAX_STEPOUT)

    def out_body(c):
        edge, n, side = c
        return edge + side * width, n + 1, side

    L, _, _ = jax.lax.while_loop(out_cond, out_body, (L0, jnp.asarray(0), -1.0))
    R, _, _ = jax.lax.while_loop(out_cond, out_body, (R0, jnp.asarray(0), 1.0))

    def shr_cond(c):
        _key, _L, _R, _x1, lp1, accepted, n = c
        return jnp.logical_and(~accepted, n < _MAX_SHRINK)

    def shr_body(c):
        key, L, R, _x1, _lp1, _acc, n = c
        key, sub = jax.random.split(key)
        x1 = L + jax.random.uniform(sub, dtype=u.dtype) * (R - L)
        lp1 = f(x1)
        acc = lp1 >= logy
        L = jnp.where(jnp.logical_and(~acc, x1 < x0), x1, L)
        R = jnp.where(jnp.logical_and(~acc, x1 >= x0), x1, R)
        return key, L, R, x1, lp1, acc, n + 1

    init = (k_shrink, L, R, x0, lp0, jnp.asarray(False), jnp.asarray(0))
    _, _, _, x1, lp1, accepted, _ = jax.lax.while_loop(shr_cond, shr_body, init)
    x1 = jnp.where(accepted, x1, x0)
    lp1 = jnp.where(accepted, lp1, lp0)
    return u.at[j].set(x1), lp1


def slice_sample(key, logpdf: Callable, u0, n: int, nburn: int = 0, width: float = 1.0):
    """Draw ``n`` samples (after ``nburn``) from logpdf via coordinate-wise
    slice sampling. Returns (n, p) samples. util.py::slice_sample parity."""
    p = u0.shape[0]

    def sweep(carry, key):
        u, lp = carry
        keys = jax.random.split(key, p)
        for j in range(p):  # p is tiny and static — unrolled
            u, lp = _slice_coord(keys[j], logpdf, u, j, lp, jnp.asarray(width, u.dtype))
        return (u, lp), u

    keys = jax.random.split(key, n + nburn)
    (_, _), us = jax.lax.scan(sweep, (u0, logpdf(u0)), keys)
    return us[nburn:]


@partial(jax.jit, static_argnames=("opts", "n", "nburn"))
def sample_hypers(state: BQState, opts: BQOptions, key, n: int, nburn: int = 10):
    """Sample θ_tl (log-GP kernel params) from MLL × weak prior
    (bq.py::BQ.sample_hypers). Returns (n, p) positive θ samples."""
    kfn, _ = get_kernel(opts.kernel)
    gp_tl = state.gp_log_l

    def logpdf(u):
        theta = jnp.exp(u)
        mll = gpm.log_mll(
            kfn, theta, gp_tl.s, state.x_s, state.tl_s, state.obs_mask, opts.base_jitter
        )
        prior = -0.5 * jnp.sum((u / _PRIOR_STD) ** 2)
        return jnp.where(jnp.isfinite(mll), mll + prior, -jnp.inf)

    u0 = jnp.log(gp_tl.theta)
    us = slice_sample(key, logpdf, u0, n, nburn)
    return jnp.exp(us)


@partial(jax.jit, static_argnames=("opts", "funs"))
def marginalize(state: BQState, opts: BQOptions, hyper_samples, funs=(Z_mean, Z_var)):
    """Evaluate ``funs`` under each θ_tl sample in one batched pipeline
    (bq.py::BQ.marginalize). Returns a tuple of (n,) arrays.

    The reference refactorizes and re-estimates in a sequential loop; here
    the per-sample re-anchor → Gram → batched Cholesky → closed-form
    estimate chain is a single ``vmap``ed program.
    """

    def one(theta_tl):
        st = set_params(state, opts, theta_tl=theta_tl, ladder=True)
        return tuple(f(st, opts) for f in funs)

    return jax.vmap(one)(hyper_samples)
