"""Hyperparameter fitting: vmapped multi-restart L-BFGS on the log-MLL.

Reference parity: ``bayesian_quadrature/bq.py::BQ.fit_hypers`` / ``_fit_gp``
run a sequential Python loop of randomized restarts, each calling
``scipy.optimize.minimize`` with the GP's hand-written MLL gradient. Here all
restarts run as ONE batched XLA dispatch: ``optax.lbfgs`` (with zoom
linesearch) stepped by ``lax.scan`` under ``vmap``, gradients by autodiff
through the (fixed-jitter, differentiable) masked Cholesky. Optimization is
in log-parameter space, which enforces positivity without constraints.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from tpubq.models import gp as gpm
from tpubq.ops.kernels import get_kernel

__all__ = [
    "fit_params", "fit_params_with_noise", "random_restarts",
    "resolve_param_names",
]


def resolve_param_names(opts, p_len: int, params):
    """Reference-style hyper names → ``(fit_noise, free_mask)``.

    The ONE place ``fit_hypers(params=...)`` name handling lives — shared by
    ``BQ.fit_hypers`` and ``BQFleet.fit`` so the two surfaces cannot drift
    (they diverged once: the fleet rejected 's').

    ``params``: None (every kernel hyper of the family free, noise fixed —
    the reference default), a single name, or a sequence of names drawn
    from the kernel family's names ('h', 'w', 'p', 'alpha', their '*_l'
    twins where the caller supports them) plus 's' (observation noise,
    reference GP params vector (theta..., s)). Returns ``fit_noise`` (was
    's' named?) and ``free_mask`` over the LOCAL theta vector: None when
    every theta is free, else a (p_len,) bool array (all-False when only
    's' was named). Unknown names raise with the valid list.
    """
    import numpy as _np

    from tpubq.models.marginalize import _names_for

    local = _names_for(opts)
    if params is None:
        params = tuple(sorted(local))
    elif isinstance(params, str):
        params = (params,)
    else:
        params = tuple(params)
    unknown = set(params) - set(local) - {"s"}
    if unknown:
        raise ValueError(
            f"unknown hyperparameters {sorted(unknown)} for kernel "
            f"{opts.kernel!r}; valid: {sorted(local) + ['s']}"
        )
    fit_noise = "s" in params
    free = _np.zeros(p_len, bool)
    for nm in params:
        if nm != "s":
            free[list(local[nm])] = True
    return fit_noise, (None if free.all() else jnp.asarray(free))


def _run_restarts(obj, inits, n_iter: int):
    """All restarts of an L-BFGS minimization as ONE vmapped program;
    returns (u_best, best_value) with non-finite (diverged) restarts losing.
    Shared by fit_params and fit_params_with_noise."""
    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(obj)

    def run_one(u0):
        state0 = opt.init(u0)

        def step(carry, _):
            u, st = carry
            value, grad = value_and_grad(u, state=st)
            updates, st = opt.update(grad, st, u, value=value, grad=grad, value_fn=obj)
            u = optax.apply_updates(u, updates)
            return (u, st), None

        (u, _), _ = jax.lax.scan(step, (u0, state0), None, length=n_iter)
        return u

    u_final = jax.vmap(run_one)(inits)
    vals = jax.vmap(obj)(u_final)
    vals = jnp.where(jnp.isfinite(vals), vals, jnp.inf)
    best = jnp.argmin(vals)
    return u_final[best], vals[best]


def _objective(kfn, s, x, y, mask, jitter, free_mask=None, u_frozen=None):
    """Negative masked log-MLL as a function of u = log(theta).

    ``free_mask``: optional (p,) bool — frozen coordinates are pinned to
    ``u_frozen`` so the optimizer cannot move them (reference
    ``fit_hypers(params)`` subset semantics)."""

    def obj(u):
        if free_mask is not None:
            u = jnp.where(free_mask, u, u_frozen)
        theta = jnp.exp(u)
        mll = gpm.log_mll(kfn, theta, s, x, y, mask, jitter)
        return -mll

    return obj


def random_restarts(key, theta0, x, y, mask, n_restart: int, kernel: str = "gaussian"):
    """Data-driven restart initializations in log-space, (n_restart, p).

    Restart 0 is the current theta (the reference also tries the incumbent);
    the rest sample log h around the live-target scale and each log w_j
    around that dimension's live-input range (per-dimension ranges, not
    dim 0's — ADVICE r1). The periodic family gets kernel-aware seeding:
    its ``w`` is a unitless shape parameter (sampled O(1)) and the period is
    sampled between the dominant observation spacing and twice the range.
    """
    dtype = x.dtype
    m = mask.astype(dtype)
    n_live = jnp.maximum(jnp.sum(m), 1.0)
    ymean = jnp.sum(y * m) / n_live
    ystd = jnp.sqrt(jnp.maximum(jnp.sum(m * (y - ymean) ** 2) / n_live, 1e-12))
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    xr = jnp.maximum(
        jnp.max(jnp.where(mask[:, None], x, -big), axis=0)
        - jnp.min(jnp.where(mask[:, None], x, big), axis=0),
        1e-6,
    )  # (d,) per-dimension live ranges
    p = theta0.shape[0]
    kh, kw, kp = jax.random.split(key, 3)
    log_h = jnp.log(ystd) + jax.random.uniform(kh, (n_restart, 1), dtype, -2.0, 2.0)
    if kernel == "periodic":
        # theta = (h, w, period); w is unitless, period has input units.
        log_w = jax.random.uniform(
            kw, (n_restart, 1), dtype, jnp.log(0.1), jnp.log(2.0)
        )
        spacing = xr[0] / jnp.maximum(n_live - 1.0, 1.0)
        log_p = jax.random.uniform(
            kp, (n_restart, 1), dtype, jnp.log(spacing), jnp.log(2.0 * xr[0])
        )
        u = jnp.concatenate([log_h, log_w, log_p], axis=1)
    elif kernel == "rq":
        # theta = (h, w_1..w_d, alpha); alpha is a unitless mixture shape.
        d = x.shape[1]
        log_w = jnp.log(xr)[None, :] + jax.random.uniform(
            kw, (n_restart, d), dtype, jnp.log(0.05), jnp.log(2.0)
        )
        log_a = jax.random.uniform(
            kp, (n_restart, 1), dtype, jnp.log(0.5), jnp.log(4.0)
        )
        u = jnp.concatenate([log_h, log_w, log_a], axis=1)
    else:
        log_w = jnp.log(xr)[None, :] + jax.random.uniform(
            kw, (n_restart, p - 1), dtype, jnp.log(0.05), jnp.log(2.0)
        )
        u = jnp.concatenate([log_h, log_w], axis=1)
    return u.at[0].set(jnp.log(theta0))


@partial(jax.jit, static_argnames=("kernel", "n_iter"))
def fit_params(
    kernel: str,
    theta0: jnp.ndarray,
    s,
    x,
    y,
    mask,
    key,
    n_restart_inits: jnp.ndarray = None,
    n_iter: int = 60,
    jitter: float = 1e-10,
    free_mask: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Maximize the masked MLL over kernel params; returns (theta_best, mll_best).

    ``n_restart_inits``: optional (R, p) log-space inits; defaults to 10
    ``random_restarts``. All restarts run in one vmapped L-BFGS program.
    ``free_mask``: optional (p,) bool — only True coordinates are optimized;
    the rest return bit-identical to ``theta0`` (reference
    ``fit_hypers(params)`` subsets).
    """
    kfn, _ = get_kernel(kernel)
    u_frozen = jnp.log(theta0)
    obj = _objective(kfn, s, x, y, mask, jitter, free_mask, u_frozen)
    if n_restart_inits is None:
        n_restart_inits = random_restarts(key, theta0, x, y, mask, 10, kernel=kernel)

    u_best, val_best = _run_restarts(obj, n_restart_inits, n_iter)
    theta_best = jnp.exp(u_best)
    if free_mask is not None:
        theta_best = jnp.where(free_mask, theta_best, theta0)  # frozen = bit-identical
    return theta_best, -val_best


@partial(jax.jit, static_argnames=("kernel", "n_restart", "n_iter"))
def fit_params_with_noise(
    kernel: str,
    theta0: jnp.ndarray,
    s0,
    x,
    y,
    mask,
    key,
    n_restart: int = 10,
    n_iter: int = 60,
    jitter: float = 1e-10,
    free_mask: jnp.ndarray = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Maximize the masked MLL over (theta, s) jointly → (theta, s, mll).

    The reference's GP params vector is (theta..., s); ``fit_hypers`` with
    's' among the named params lands here. Optimization is over
    u = (log theta, log s); an ``s0`` of exactly zero starts restarts from a
    small fraction of the target scale instead (log 0 is unusable), and the
    incumbent row keeps s at that floor. ``free_mask`` (over theta only)
    freezes unlisted kernel params; s is always free on this path.
    """
    kfn, _ = get_kernel(kernel)
    dtype = x.dtype
    p = theta0.shape[0]
    m = mask.astype(dtype)
    n_live = jnp.maximum(jnp.sum(m), 1.0)
    ymean = jnp.sum(y * m) / n_live
    ystd = jnp.sqrt(jnp.maximum(jnp.sum(m * (y - ymean) ** 2) / n_live, 1e-12))
    s_floor = 1e-4 * ystd
    s_start = jnp.maximum(jnp.asarray(s0, dtype), s_floor)

    u_frozen = jnp.log(theta0)

    def obj(u):
        ut = u[:p]
        if free_mask is not None:
            ut = jnp.where(free_mask, ut, u_frozen)
        theta = jnp.exp(ut)
        s = jnp.exp(u[p])
        return -gpm.log_mll(kfn, theta, s, x, y, mask, jitter)

    k_theta, k_s = jax.random.split(key)
    u_theta = random_restarts(k_theta, theta0, x, y, mask, n_restart, kernel=kernel)
    log_s = jnp.log(ystd) + jax.random.uniform(
        k_s, (n_restart, 1), dtype, jnp.log(1e-4), jnp.log(0.3)
    )
    inits = jnp.concatenate([u_theta, log_s], axis=1)
    inits = inits.at[0, p].set(jnp.log(s_start))  # incumbent row

    u_best, val_best = _run_restarts(obj, inits, n_iter)
    theta_best = jnp.exp(u_best[:p])
    if free_mask is not None:
        theta_best = jnp.where(free_mask, theta_best, theta0)
    return theta_best, jnp.exp(u_best[p]), -val_best


@partial(jax.jit, static_argnames=("n_iter", "interpret"))
def fit_params_fused(
    theta0,
    s,
    x,
    y,
    mask,
    key,
    restart_inits=None,
    n_iter: int = 150,
    lr: float = 0.05,
    jitter: float = 1e-7,
    interpret=None,
    free_mask=None,
):
    """Multi-restart fit driven by the fused Pallas MLL+grad kernel.

    All restarts advance together: each optimizer iteration is ONE kernel
    launch (tpubq.ops.pallas_kernels.mll_grad_batched) evaluating every
    restart's masked MLL and analytic gradient on-chip, stepped by Adam in
    log-space. Gaussian kernel, 1-D x (the reference's fit regime); the
    autodiff path (fit_params) remains the general/f64 route.
    Returns (theta_best, mll_best).
    """
    import optax as _optax

    from tpubq.ops import pallas_kernels as pk

    if restart_inits is None:
        restart_inits = random_restarts(key, theta0, x, y, mask, 10)
    us = restart_inits.astype(x.dtype)
    if free_mask is not None:
        # pin frozen coordinates: the fused kernel evaluates exp(us) directly
        us = jnp.where(free_mask[None, :], us, jnp.log(theta0)[None, :].astype(x.dtype))
    opt = _optax.adam(lr)
    opt_state = opt.init(us)

    def step(carry, _):
        us, opt_state = carry
        mll, g_theta = pk.mll_grad_batched(
            jnp.exp(us), s, x, y, mask, jitter=jitter, interpret=interpret
        )
        # chain rule to log-space; ascend MLL = descend -MLL
        g_u = -g_theta * jnp.exp(us)
        g_u = jnp.where(jnp.isfinite(g_u), g_u, 0.0)
        if free_mask is not None:
            g_u = jnp.where(free_mask[None, :], g_u, 0.0)
        updates, opt_state = opt.update(g_u, opt_state, us)
        us = _optax.apply_updates(us, updates)
        return (us, opt_state), None

    (us, _), _ = jax.lax.scan(step, (us, opt_state), None, length=n_iter)
    mll, _ = pk.mll_grad_batched(jnp.exp(us), s, x, y, mask, jitter=jitter, interpret=interpret)
    mll = jnp.where(jnp.isfinite(mll), mll, -jnp.inf)
    best = jnp.argmax(mll)
    theta_best = jnp.exp(us[best])
    if free_mask is not None:
        theta_best = jnp.where(free_mask, theta_best, theta0.astype(x.dtype))
    return theta_best, mll[best]
