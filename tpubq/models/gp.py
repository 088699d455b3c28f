"""Gaussian-process regression engine.

Reference parity: the reference outsources its GP to the external ``gp``
package (``gp/gp.py::GP``: Gram assembly, Cholesky posterior, log marginal
likelihood + analytic gradient, cached factorizations). That dependency is
part of the behavior surface, so it is absorbed here — but functionally:
a ``GPState`` NamedTuple (a pytree) carries the data, mask, and cached
Cholesky factor; every operation is a pure function, jit/vmap-friendly, and
gradients of the MLL come from ``jax.grad`` instead of hand-written kernel
jacobians (reference: gp/gp.py::GP.dloglh_dtheta).

All data arrays are statically padded; ``mask`` marks live rows. Padded
rows/columns of the Gram are replaced by identity (see
``tpubq.ops.linalg.pad_gram``) so factorizations, solves and log-dets of the
live submatrix fall out of fixed-shape operations — the pattern that keeps
``add_observation`` recompile-free under jit.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from tpubq.ops import linalg
from tpubq.ops.kernels import get_kernel

_LOG2PI = math.log(2.0 * math.pi)


class GPState(NamedTuple):
    """Immutable GP snapshot (a pytree).

    theta: kernel parameters, e.g. [h, w] (gaussian) or [h, w, p] (periodic).
    s: observation noise standard deviation.
    x: (n, d) padded inputs;  y: (n,) padded targets;  mask: (n,) live flags.
    L: (n, n) Cholesky factor of the padded, conditioned Gram.
    alpha: (n,) K^{-1} y (zero at pads).
    Kinv: (n, n) explicit K^{-1} (identity at pads) — cached at fit time,
      like the reference's gp/gp.py::GP.inv_Kxx cached property; consumed by
      the fused ESM scorer so repeated sweeps skip the triangular solves.
    jitter: the diagonal jitter that was applied (absolute units).
    ok: () bool — False iff the conditioning ladder was exhausted without a
      finite factor (reference analogue: improve_covariance_conditioning
      giving up). When False, ``alpha`` is NaN-poisoned so downstream
      estimates fail loudly instead of returning garbage.
    """

    theta: jnp.ndarray
    s: jnp.ndarray
    x: jnp.ndarray
    y: jnp.ndarray
    mask: jnp.ndarray
    L: jnp.ndarray
    alpha: jnp.ndarray
    Kinv: jnp.ndarray
    jitter: jnp.ndarray
    ok: jnp.ndarray


def _gram(kfn: Callable, theta, s, x, mask):
    K = kfn(theta, x, x)
    eye = jnp.eye(x.shape[0], dtype=K.dtype)
    return K + eye * (s * s) * mask.astype(K.dtype)


def gp_fit(
    kfn: Callable,
    theta,
    s,
    x,
    y,
    mask,
    base_jitter: float = 1e-12,
    ladder: bool = True,
) -> GPState:
    """Factorize the Gram and cache (L, alpha).

    ``ladder=True`` uses the escalating jitter ladder (estimation paths);
    ``ladder=False`` uses a single fixed-jitter factorization and stays
    reverse-differentiable (fitting paths).

    Failure contract by dtype (ADVICE r2): the float64 ladder escalates to
    1e-2×diag, so a pathological Gram usually recovers with heavy jitter;
    the float32 ladder stops at 1e-4×diag (PSD kernel Grams cannot need
    more — see ``linalg.JITTER_LADDER_F32``), so an f32 Gram that would
    only factor at the 1e-3..1e-2 rungs reports ``ok=False`` and
    NaN-poisons ``alpha`` instead of returning a heavily-jittered estimate.
    API wrappers surface that as ``FloatingPointError`` (see
    ``BQ._check_factorized``). In practice only non-finite inputs reach
    that state in f32.

    K⁻¹ is computed unconditionally IN THE TRACE (its own solve, split
    from alpha's): it is consumed by the f32 ESM hot path, the fused
    scorer, the incremental bordering algebra (any dtype), and the
    ``GP.inv_Kxx`` facade — a dtype-conditional cache would break the
    latter two on f64. Because the solve is split, XLA dead-code
    eliminates it on pipelines with no K⁻¹ consumer (marginalize's
    Z-moment batch), so "unconditional" costs nothing there.
    """
    theta = jnp.asarray(theta, dtype=x.dtype)
    s = jnp.asarray(s, dtype=x.dtype)
    K = _gram(kfn, theta, s, x, mask)
    if ladder:
        L, jit_used, ok = linalg.jitter_cholesky(K, mask, base_jitter)
    else:
        L = linalg.cholesky_fixed(K, mask, base_jitter)
        # GPState.jitter is in ABSOLUTE units (the ladder branch records
        # rung*scale); cholesky_fixed applied base_jitter*mean-live-diagonal,
        # so record the same absolute quantity here.
        jit_used = jnp.asarray(base_jitter, x.dtype) * linalg._diag_scale(K, mask)
        ok = jnp.all(jnp.isfinite(L))
    ym = jnp.where(mask, y, 0.0)
    eye = jnp.eye(x.shape[0], dtype=x.dtype)
    # SPLIT solves, not one [y | I] multi-RHS solve (round 5): the values
    # are identical (same factor, same triangular sweeps), but a fused
    # solve welds alpha to K⁻¹ in one op, forcing every pipeline that only
    # reads alpha to pay the n-RHS inverse too. Split, XLA dead-code
    # eliminates the K⁻¹ solve wherever no consumer reads it — the
    # marginalize pipeline (B × n-RHS solves dropped: Z moments read only
    # L/alpha) and any Z-moment-only estimate path. Paths that do read
    # Kinv (f32 ESM, incremental bordering, GP.inv_Kxx) pay one extra
    # solve launch, measured in the noise at n ≤ 128.
    alpha = linalg.chol_solve(L, ym)
    Kinv = linalg.chol_solve(L, eye)
    # Conditioning collapse must fail loudly: poison alpha so every estimate
    # built on this factor is NaN (and record ok for wrappers to raise on).
    alpha = jnp.where(ok, alpha, jnp.nan)
    return GPState(theta, s, x, ym, mask, L, alpha, Kinv, jit_used, ok)


def gp_mean(kfn: Callable, gp: GPState, xo) -> jnp.ndarray:
    """Posterior mean at xo (zero prior mean, as in gp/gp.py::GP.mean)."""
    Kox = kfn(gp.theta, xo, gp.x) * gp.mask.astype(xo.dtype)[None, :]
    return Kox @ gp.alpha


def gp_cov(kfn: Callable, gp: GPState, xo) -> jnp.ndarray:
    """Posterior covariance at xo (gp/gp.py::GP.cov).

    Deliberately the Cholesky-solve form even on the f32 hot path: the
    posterior covariance is a near-total cancellation (Koo − KoxK⁻¹Koxᵀ → ~0
    near observations), and applying the cached explicit K⁻¹ as matmuls
    loses it entirely in f32 (measured: V[Z] clamps to 0), while the
    triangular solve keeps ~1e-3 relative accuracy.
    """
    Kox = kfn(gp.theta, xo, gp.x) * gp.mask.astype(xo.dtype)[None, :]
    Koo = kfn(gp.theta, xo, xo)
    v = linalg.tri_solve(gp.L, Kox.T)  # (n, no)
    return Koo - v.T @ v


def gp_var(kfn: Callable, kdiagfn: Callable, gp: GPState, xo) -> jnp.ndarray:
    """Posterior marginal variance at xo (diagonal of gp_cov)."""
    Kox = kfn(gp.theta, xo, gp.x) * gp.mask.astype(xo.dtype)[None, :]
    v = linalg.tri_solve(gp.L, Kox.T)
    return kdiagfn(gp.theta, xo) - jnp.sum(v * v, axis=0)


def log_mll(kfn: Callable, theta, s, x, y, mask, jitter: float = 1e-12) -> jnp.ndarray:
    """Masked log marginal likelihood (gp/gp.py::GP.log_lh).

    -1/2 y^T K^{-1} y - 1/2 log|K| - n_live/2 log 2π, computed on fixed
    shapes via the identity-padded Gram. Differentiable in (theta, s).
    """
    theta = jnp.asarray(theta, dtype=x.dtype)
    K = _gram(kfn, theta, s, x, mask)
    L = linalg.cholesky_fixed(K, mask, jitter)
    ym = jnp.where(mask, y, 0.0)
    alpha = linalg.chol_solve(L, ym)
    n_live = jnp.sum(mask.astype(x.dtype))
    quad = jnp.dot(ym, alpha)
    logdet = linalg.masked_logdet(L, mask)
    return -0.5 * (quad + logdet + n_live * _LOG2PI)


def log_mll_by_name(kernel: str):
    kfn, _ = get_kernel(kernel)

    def f(theta, s, x, y, mask, jitter=1e-12):
        return log_mll(kfn, theta, s, x, y, mask, jitter)

    return f


def dlog_mll(kfn: Callable, theta, s, x, y, mask, jitter: float = 1e-12):
    """∂MLL/∂theta via autodiff (replaces gp/gp.py::GP.dloglh_dtheta)."""
    return jax.grad(lambda t: log_mll(kfn, t, s, x, y, mask, jitter))(theta)


class GP:
    """Object-style facade over the functional engine — gp/gp.py::GP parity.

    The reference's users hold a ``GP(kernel, x, y, s)`` with cached
    factorizations and ``params`` get/set; this wrapper provides that exact
    surface (``mean``, ``cov``, ``Kxx``, ``inv_Kxx``, ``log_lh``,
    ``dloglh_dtheta``, ``params``, ``copy``) on top of the immutable
    ``GPState``. New code should prefer the functional API.
    """

    def __init__(self, kernel, theta, x, y, s=0.0, jitter: float = 1e-12):
        import numpy as np

        from tpubq.ops.kernels import get_kernel

        self.kernel = kernel
        self._kfn, self._kdiagfn = get_kernel(kernel)
        self._jitter = jitter
        x = jnp.asarray(x, jnp.result_type(float))
        if x.ndim == 1:
            x = x[:, None]
        y = jnp.asarray(y, x.dtype)
        mask = jnp.ones(x.shape[0], bool)
        self._state = gp_fit(
            self._kfn, jnp.asarray(theta, x.dtype), s, x, y, mask, jitter
        )

    # -- reference surface -------------------------------------------------
    @property
    def x(self):
        return self._state.x

    @property
    def y(self):
        return self._state.y

    @property
    def s(self):
        return float(self._state.s)

    @property
    def params(self):
        """(theta..., s) like the reference's params vector."""
        import numpy as np

        return np.concatenate([np.asarray(self._state.theta), [self.s]])

    @params.setter
    def params(self, p):
        p = jnp.asarray(p, self._state.x.dtype)
        self._state = gp_fit(
            self._kfn, p[:-1], p[-1], self._state.x, self._state.y,
            self._state.mask, self._jitter,
        )

    @property
    def Kxx(self):
        return _gram(self._kfn, self._state.theta, self._state.s, self._state.x,
                     self._state.mask)

    @property
    def inv_Kxx(self):
        return self._state.Kinv  # cached at fit time (reference: cached property)

    def mean(self, xo):
        xo = jnp.asarray(xo, self._state.x.dtype)
        if xo.ndim == 1:
            xo = xo[:, None]
        return gp_mean(self._kfn, self._state, xo)

    def cov(self, xo):
        xo = jnp.asarray(xo, self._state.x.dtype)
        if xo.ndim == 1:
            xo = xo[:, None]
        return gp_cov(self._kfn, self._state, xo)

    @property
    def log_lh(self):
        return float(
            log_mll(self._kfn, self._state.theta, self._state.s, self._state.x,
                    self._state.y, self._state.mask, self._jitter)
        )

    @property
    def dloglh_dtheta(self):
        import numpy as np

        return np.asarray(
            dlog_mll(self._kfn, self._state.theta, self._state.s, self._state.x,
                     self._state.y, self._state.mask, self._jitter)
        )

    def copy(self):
        import copy as _copy

        new = object.__new__(GP)
        new.__dict__.update(self.__dict__)  # GPState is immutable — safe to share
        return new
