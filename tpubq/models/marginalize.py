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
from tpubq.models.bq import BQState, Z_mean, Z_var, apply_hyper_sample
from tpubq.ops.kernels import get_kernel
from tpubq.utils.options import BQOptions

__all__ = ["slice_sample", "sample_hypers", "marginalize", "param_coords"]

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


def slice_sample(
    key, logpdf: Callable, u0, n: int, nburn: int = 0, width: float = 1.0, coords=None
):
    """Draw ``n`` samples (after ``nburn``) from logpdf via coordinate-wise
    slice sampling. Returns (n, p) samples. util.py::slice_sample parity.

    ``coords``: static tuple of coordinate indices to sweep (default: all) —
    unlisted coordinates stay fixed at their u0 values, which is how the
    reference's ``sample_hypers(params, ...)`` samples a parameter subset.
    """
    p = u0.shape[0]
    coords = tuple(range(p)) if coords is None else tuple(coords)

    def sweep(carry, key):
        u, lp = carry
        keys = jax.random.split(key, len(coords))
        for i, j in enumerate(coords):  # tiny and static — unrolled
            u, lp = _slice_coord(keys[i], logpdf, u, j, lp, jnp.asarray(width, u.dtype))
        return (u, lp), u

    keys = jax.random.split(key, n + nburn)
    (_, _), us = jax.lax.scan(sweep, (u0, logpdf(u0)), keys)
    return us[nburn:]


def _run_chains(key, logpdf: Callable, u0, n: int, nburn: int, coords, n_chains: int):
    """Dispatch n draws across ``n_chains`` vmapped slice-sampling chains.

    Chain 0 starts at u0 (the incumbent); the rest at log-jittered copies
    (swept coordinates only — frozen ones must stay exact). Draws are
    interleaved round-robin across chains so a truncation to ``n`` keeps a
    balanced mix.
    """
    if n_chains <= 1:
        return slice_sample(key, logpdf, u0, n, nburn, coords=coords)
    import numpy as _np

    per = -(-n // n_chains)  # ceil
    k_init, k_run = jax.random.split(key)
    jitter0 = jax.random.normal(k_init, (n_chains, u0.shape[0]), u0.dtype) * 0.3
    jitter0 = jitter0.at[0].set(0.0)
    swept = _np.zeros(u0.shape[0], bool)
    swept[list(coords)] = True
    u0s = jnp.where(jnp.asarray(swept)[None, :], u0[None, :] + jitter0, u0[None, :])
    keys = jax.random.split(k_run, n_chains)
    us = jax.vmap(
        lambda k, u: slice_sample(k, logpdf, u, per, nburn, coords=coords)
    )(keys, u0s)  # (C, per, p)
    return jnp.swapaxes(us, 0, 1).reshape(n_chains * per, u0.shape[0])[:n]


def _names_for(opts: BQOptions):
    """Per-GP map of reference hyper names → local theta indices."""
    if opts.kernel == "periodic":
        return {"h": (0,), "w": (1,), "p": (2,)}
    if opts.kernel == "rq":
        return {"h": (0,), "w": tuple(range(1, opts.dim + 1)), "alpha": (opts.dim + 1,)}
    return {"h": (0,), "w": tuple(range(1, opts.dim + 1))}


def param_coords(params, opts: BQOptions):
    """Resolve reference-style hyper names to (coords, sample_l).

    Names ``h``/``w`` (and ``p`` for periodic) select the log-GP's params —
    the reference's ``sample_hypers(params, ...)`` vocabulary. Suffixed names
    ``h_l``/``w_l``/``p_l`` select the linear GP's params (capability
    extension: joint marginalization over BOTH GPs' hypers, VERDICT r1 #4).
    Returns coordinate indices into the stacked log-param vector
    u = (log θ_tl, log θ_l) and whether any linear-GP param was named.
    """
    from tpubq.models.bq import theta_len

    local = _names_for(opts)
    p_tl = theta_len(opts)
    coords, sample_l = [], False
    for name in params:
        base, is_l = (name[:-2], True) if name.endswith("_l") else (name, False)
        if base not in local:
            raise ValueError(
                f"unknown hyperparameter {name!r} for kernel {opts.kernel!r}; "
                f"valid: {sorted(local)} (+ '_l' suffix for the linear GP)"
            )
        off = p_tl if is_l else 0
        sample_l = sample_l or is_l
        coords.extend(off + j for j in local[base])
    return tuple(sorted(set(coords))), sample_l


@partial(jax.jit, static_argnames=("opts", "n", "nburn", "params", "n_chains"))
def sample_hypers(
    state: BQState,
    opts: BQOptions,
    key,
    n: int,
    nburn: int = 10,
    params=None,
    n_chains: int = 1,
    prior_std: float = _PRIOR_STD,  # traced scalar: sweeping it never recompiles
):
    """Slice-sample kernel hyperparameters from MLL × weak prior
    (bq.py::BQ.sample_hypers).

    ``prior_std``: standard deviation of the N(0, σ²) prior on each
    log-hyperparameter (default 5 — extremely weak, reference-faithful "MLL
    plus positivity" behavior). With few observations the MLL can be FLAT
    along a hyper direction (e.g. a length-scale the data does not
    constrain); the weak prior then lets samples wander to θ ~ e^{±10} and
    the marginalized E[Z]/V[Z] inherit that spread. Passing a tighter value
    (1–2) regularizes those directions without noticeably biasing the
    well-identified ones.

    ``params`` names which hypers move (reference signature parity); the rest
    stay fixed at their current values. Plain names (``h``, ``w``, ``p``)
    target θ_tl and return (n, p_tl) samples — the reference's behavior.
    If any ``*_l`` name is present, the target is the JOINT posterior over
    (θ_tl, θ_l): the linear GP's MLL is evaluated on candidates re-anchored
    under each θ_tl (the exact dependency ``_fit_gps`` applies), and samples
    come back stacked as (n, p_tl + p_l) — feed them to ``marginalize`` /
    ``choose_next``, which dispatch on the width.

    ``n_chains`` > 1 runs that many slice-sampling chains as ONE vmapped
    program (TPU-native extension: the sampler is inherently sequential, but
    chains are embarrassingly parallel — wall-clock drops ~n_chains× and
    mixing improves). Chain 0 starts at the incumbent θ; the rest start at
    log-jittered copies; each chain burns ``nburn`` and contributes
    ceil(n / n_chains) draws, interleaved then truncated to ``n``.
    """
    if params is None:  # default = every param of the family (θ_tl)
        params = tuple(sorted(_names_for(opts)))
    kfn, _ = get_kernel(opts.kernel)
    gp_tl = state.gp_log_l
    gp_l = state.gp_l
    coords, sample_l = param_coords(params, opts)
    p_tl = gp_tl.theta.shape[0]

    if not sample_l:

        def logpdf(u):
            theta = jnp.exp(u)
            mll = gpm.log_mll(
                kfn, theta, gp_tl.s, state.x_s, state.tl_s, state.obs_mask,
                opts.base_jitter,
            )
            prior = -0.5 * jnp.sum((u / prior_std) ** 2)
            return jnp.where(jnp.isfinite(mll), mll + prior, -jnp.inf)

        u0 = jnp.log(gp_tl.theta)
        us = _run_chains(key, logpdf, u0, n, nburn, coords, n_chains)
        return jnp.exp(us)

    def logpdf(u):
        theta_tl = jnp.exp(u[:p_tl])
        theta_l = jnp.exp(u[p_tl:])
        mll_tl = gpm.log_mll(
            kfn, theta_tl, gp_tl.s, state.x_s, state.tl_s, state.obs_mask,
            opts.base_jitter,
        )
        # Re-anchor the linearization under θ_tl — the same chain _fit_gps
        # applies, so the sampled posterior matches what marginalize evaluates.
        gp_tl_u = gpm.gp_fit(
            kfn, theta_tl, gp_tl.s, state.x_s, state.tl_s, state.obs_mask,
            base_jitter=opts.base_jitter, ladder=False,
        )
        m_tl_c = gpm.gp_mean(kfn, gp_tl_u, state.x_c)
        l_c = jnp.where(state.c_mask, state.gamma * jnp.expm1(m_tl_c), 0.0)
        l_sc = jnp.concatenate(
            [jnp.where(state.obs_mask, state.l_s, 0.0), l_c], axis=0
        )
        mll_l = gpm.log_mll(
            kfn, theta_l, gp_l.s, state.x_sc, l_sc, state.sc_mask, opts.base_jitter
        )
        prior = -0.5 * jnp.sum((u / prior_std) ** 2)
        tot = mll_tl + mll_l + prior
        return jnp.where(jnp.isfinite(tot), tot, -jnp.inf)

    u0 = jnp.concatenate([jnp.log(gp_tl.theta), jnp.log(gp_l.theta)])
    us = _run_chains(key, logpdf, u0, n, nburn, coords, n_chains)
    return jnp.exp(us)


@partial(jax.jit, static_argnames=("opts", "funs"))
def marginalize(state: BQState, opts: BQOptions, hyper_samples, funs=(Z_mean, Z_var)):
    """Evaluate ``funs`` under each hyper sample in one batched pipeline
    (bq.py::BQ.marginalize). Returns a tuple of (n,) arrays.

    ``hyper_samples`` rows are θ_tl draws (width p_tl) or stacked
    (θ_tl, θ_l) draws (width p_tl + p_l, from ``sample_hypers`` with ``*_l``
    params) — ``apply_hyper_sample`` dispatches on the width. The reference
    refactorizes and re-estimates in a sequential loop; here the per-sample
    re-anchor → Gram → batched Cholesky → closed-form estimate chain is a
    single ``vmap``ed program.
    """

    def one(theta):
        st = apply_hyper_sample(state, opts, theta, ladder=True)
        return tuple(f(st, opts) for f in funs)

    return jax.vmap(one)(hyper_samples)
