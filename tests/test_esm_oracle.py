"""Independent ESM oracle for d >= 2 and non-gaussian kernels (VERDICT r2 #3).

The most intricate math in the codebase — the rank-1/Schur affine form of
``acquire._esm_affine_terms`` — previously had an independent check only in
1-D gaussian (native/bq_native.cpp::bq_esm_grid). This module pins the
production ESM against a brute-force numpy implementation that shares ZERO
code with tpubq.models.acquire (reference anchor:
bq_c.pyx::expected_squared_mean and the reference's approx_* twin pattern):

  * every hypothetical point solves the FULL bordered (nsc+1) system from
    scratch with np.linalg.solve — no Schur complement, no rank-1 update;
  * the expectation over l_a integrates (z_aug^T K_aug^{-1} l_aug)^2 over
    tl_a ~ N(m_a, c_a) by Gauss-Hermite — no lognormal-moment closed form;
  * the measure integrals z_i = int k(x', x_i) p(x') dx' use the oracle's
    own tensor-GH quadrature — no int_K closed form, no int_K_measure.

Everything the oracle takes from the production state is DATA (locations,
hypers, jitter levels), never algebra.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

# Brute-force (nsc+1)-system solves per hypothetical point x per GH node:
# minutes-scale. Deselected by CI's fast gate (`make test`); the slow job /
# `make test-all` keep it. The cheap 1-D gaussian C++ oracle twin
# (test_native.py) still runs in the fast gate.
pytestmark = pytest.mark.slow

from tpubq.models import acquire, bq as bqm  # noqa: E402
from tpubq.utils.options import BQOptions  # noqa: E402


# ---------------------------------------------------------------------------
# oracle-local kernel formulas (written from the math, not imported)
# ---------------------------------------------------------------------------


def _o_gaussian(theta):
    h, w = float(theta[0]), np.asarray(theta[1:], float)

    def K(a, b):
        d2 = np.sum(((a[:, None, :] - b[None, :, :]) / w) ** 2, axis=-1)
        return h * h * np.exp(-0.5 * d2)

    return K, h * h


def _o_matern52(theta):
    h, w = float(theta[0]), np.asarray(theta[1:], float)

    def K(a, b):
        r = np.sqrt(np.sum(((a[:, None, :] - b[None, :, :]) / w) ** 2, axis=-1))
        s5r = np.sqrt(5.0) * r
        return h * h * (1.0 + s5r + (5.0 / 3.0) * r * r) * np.exp(-s5r)

    return K, h * h


_ORACLE_KERNELS = {"gaussian": _o_gaussian, "matern52": _o_matern52}


def _measure_nodes(mu, Sig, n1d=160):
    """Tensor Gauss-Hermite nodes/weights for N(mu, Sig) (diagonal Sig)."""
    mu = np.asarray(mu, float)
    Sig = np.asarray(Sig, float)
    d = mu.shape[0]
    # scipy's rule (stable past 384 nodes; numpy's hermegauss weights
    # overflow → NaN there). Node SOURCE shared with production is fine:
    # this oracle's independence is the bordered-solve algebra, and a
    # matching rule makes the quadrature contribution cancel exactly.
    from scipy.special import roots_hermitenorm

    t, w = roots_hermitenorm(n1d)
    w = w / np.sqrt(2.0 * np.pi)
    sd = np.sqrt(np.diag(Sig))
    axes = np.meshgrid(*[mu[j] + sd[j] * t for j in range(d)], indexing="ij")
    nodes = np.stack([a.ravel() for a in axes], axis=1)  # (n1d^d, d)
    wts = np.ones(n1d**d)
    grids = np.meshgrid(*[w] * d, indexing="ij")
    for g in grids:
        wts = wts * g.ravel() if d > 1 else w
    if d == 1:
        wts = w
    return nodes, wts


def esm_oracle(kernel_name, x_s, l_s, x_c, theta_tl, theta_l, s_tl, s_l,
               jit_tl, jit_l, gamma, mu, Sig, thresh, x_a_pts,
               n_meas=160, n_t=96):
    """Brute-force ESM over ``x_a_pts``; float64 numpy throughout."""
    mk = _ORACLE_KERNELS[kernel_name]
    K_tl_fn, kdiag_tl = mk(theta_tl)
    K_l_fn, kdiag_l = mk(theta_l)
    ns = x_s.shape[0]

    tl_s = np.log(l_s / gamma + 1.0)
    K_tl = K_tl_fn(x_s, x_s) + (s_tl**2 + jit_tl) * np.eye(ns)
    a_tl = np.linalg.solve(K_tl, tl_s)

    # candidates anchored through the log-GP mean (the linearization)
    l_c = gamma * np.expm1(K_tl_fn(x_c, x_s) @ a_tl)
    x_sc = np.concatenate([x_s, x_c])
    l_sc = np.concatenate([l_s, l_c])
    nsc = x_sc.shape[0]
    K_l = K_l_fn(x_sc, x_sc) + (s_l**2 + jit_l) * np.eye(nsc)

    nodes, wts = _measure_nodes(mu, Sig, n_meas)
    z = K_l_fn(x_sc, nodes) @ wts  # (nsc,)
    z_mean = z @ np.linalg.solve(K_l, l_sc)

    gt, gw = np.polynomial.hermite_e.hermegauss(n_t)
    gw = gw / np.sqrt(2.0 * np.pi)

    eps = np.finfo(np.float64).eps
    out = np.empty(x_a_pts.shape[0])
    for idx, xa in enumerate(x_a_pts):
        xa1 = xa[None, :]
        # degenerate guards replicate production semantics (data, not algebra):
        # Chebyshev proximity to a live point, or a non-PD bordered pivot
        if np.min(np.max(np.abs(x_sc - xa1), axis=1)) < thresh:
            out[idx] = z_mean * z_mean
            continue
        k = K_l_fn(x_sc, xa1)[:, 0]
        kappa = kdiag_l + s_l**2 + jit_l
        gam = kappa - k @ np.linalg.solve(K_l, k)
        if gam <= eps * kappa:
            out[idx] = z_mean * z_mean
            continue

        K_aug = np.empty((nsc + 1, nsc + 1))
        K_aug[:nsc, :nsc] = K_l
        K_aug[:nsc, nsc] = k
        K_aug[nsc, :nsc] = k
        K_aug[nsc, nsc] = kappa
        zeta = K_l_fn(xa1, nodes)[0] @ wts
        z_aug = np.append(z, zeta)

        ktl = K_tl_fn(xa1, x_s)[0]
        m_a = ktl @ a_tl
        c_a = max(kdiag_tl - ktl @ np.linalg.solve(K_tl, ktl), 0.0)

        acc = 0.0
        for t, wq in zip(gt, gw):
            l_a = gamma * np.expm1(m_a + np.sqrt(c_a) * t)
            l_aug = np.append(l_sc, l_a)
            ez = z_aug @ np.linalg.solve(K_aug, l_aug)
            acc += wq * ez * ez
        out[idx] = acc
    return out


# ---------------------------------------------------------------------------
# comparisons against production
# ---------------------------------------------------------------------------


def _production_state(kernel, d, theta_tl, theta_l, seed=0, ns=8):
    rng = np.random.RandomState(seed)
    x = rng.uniform(-1.8, 1.8, (ns, d))
    mu_true = rng.uniform(-0.3, 0.3, d)
    l = np.exp(-0.5 * np.sum((x - mu_true) ** 2 / 0.35, axis=1)) + 0.05
    mu = rng.uniform(-0.2, 0.2, d)
    Sig = np.diag(rng.uniform(0.7, 1.1, d))
    opts = BQOptions(n_candidate=10, candidate_thresh=0.25, max_obs=16,
                     dtype="float64", dim=d, kernel=kernel)
    state = bqm.init_state(
        x, l, opts, params_tl=theta_tl, params_l=theta_l,
        x_mean=mu, x_var=Sig,
    )
    return state, opts, mu, Sig


def _compare(kernel, d, theta_tl, theta_l, rtol, n_pts=24, seed=0,
             n_meas=160):
    state, opts, mu, Sig = _production_state(kernel, d, theta_tl, theta_l, seed)
    rng = np.random.RandomState(seed + 99)
    x_a = rng.uniform(-2.5, 2.5, (n_pts, d))
    # one deliberately-degenerate point: on top of the first observation
    x_a[0] = np.asarray(state.x_s[0])

    got = np.asarray(acquire.expected_squared_mean(
        state, opts, jnp.asarray(x_a)
    ))

    c_mask = np.asarray(state.c_mask)
    want = esm_oracle(
        kernel,
        np.asarray(state.x_s)[np.asarray(state.obs_mask)],
        np.asarray(state.l_s)[np.asarray(state.obs_mask)],
        np.asarray(state.x_c)[c_mask],
        np.asarray(state.gp_log_l.theta), np.asarray(state.gp_l.theta),
        float(state.gp_log_l.s), float(state.gp_l.s),
        float(state.gp_log_l.jitter), float(state.gp_l.jitter),
        float(state.gamma), mu, Sig, opts.candidate_thresh, x_a,
        n_meas=n_meas,
    )
    scale = np.max(np.abs(want))
    rel = np.abs(got - want) / scale
    assert rel.max() < rtol, (rel.max(), got[rel.argmax()], want[rel.argmax()])
    # the degenerate point must short-circuit to Z_mean^2 in BOTH
    zm = float(bqm.Z_mean(state, opts))
    np.testing.assert_allclose(got[0], zm * zm, rtol=1e-9)
    np.testing.assert_allclose(want[0], zm * zm, rtol=max(1e-7, rtol))


def test_esm_oracle_2d_gaussian():
    """2-D gaussian-kernel ESM vs the independent bordered-solve oracle.

    Tolerance: production uses the closed-form int_K for z/zeta, the oracle
    tensor-GH quadrature (exact to ~1e-12 for gaussian x gaussian); the
    affine/Schur algebra must agree to solver roundoff."""
    _compare("gaussian", 2, (0.7, 0.8, 0.9), (0.35, 0.45, 0.4), rtol=1e-7)


def test_esm_oracle_1d_gaussian_anisotropy_free():
    """1-D gaussian cross-check of the same oracle (ties it to the regime the
    C++ oracle already covers — if both pass, the oracle itself is sane)."""
    _compare("gaussian", 1, (0.7, 0.8), (0.3, 0.4), rtol=1e-7)


def test_esm_oracle_1d_matern52():
    """1-D matern52 ESM vs the oracle. Production now uses the CLOSED-FORM
    Matérn measure integral (integrals._int_K_matern_1d — erfcx-based,
    exact) for z/ζ, while the oracle integrates the measure with a GH rule;
    the matern cusp limits GH to polynomial convergence, so the oracle
    approaches production as its rule densifies. Asserting agreement under
    a TIGHTENING tolerance as n_meas grows pins both the bordered-solve
    algebra and the closed form's exactness (measured gaps: 4.6e-6 @ 512,
    9.3e-8 @ 2048 — the oracle's own quadrature error, shrinking ~n^-2.3,
    converging to the closed form)."""
    _compare("matern52", 1, (0.7, 0.8), (0.35, 0.45), rtol=2e-5, n_meas=512)
    _compare("matern52", 1, (0.7, 0.8), (0.35, 0.45), rtol=5e-7, n_meas=2048)


def test_esm_oracle_2d_matern52():
    """2-D matern52 — production's z/ζ now go through the Gamma scale-
    mixture of gaussian closed forms (integrals.int_K_matern_mixture,
    ~1e-10 mixture error), while the oracle tensor-GH-integrates the
    cusped kernel directly (polynomial convergence). As in the 1-D test,
    the oracle must CONVERGE toward production as its rule densifies —
    measured gaps: 2.0e-3 @ 48/axis, 4.0e-4 @ 96, 2.4e-5 @ 192 (the
    oracle's own cusp error, shrinking ~n^-2.6)."""
    _compare("matern52", 2, (0.7, 0.8, 0.9), (0.35, 0.45, 0.4), rtol=8e-3,
             n_meas=48)
    _compare("matern52", 2, (0.7, 0.8, 0.9), (0.35, 0.45, 0.4), rtol=1e-4,
             n_meas=192)


def _o_periodic(theta):
    h, w, p = float(theta[0]), float(theta[1]), float(theta[2])

    def K(a, b):
        s = np.sin((a[:, None, :] - b[None, :, :]) / (2.0 * p)) ** 2
        return h * h * np.exp(-2.0 * np.sum(s, axis=-1) / (w * w))

    return K, h * h


_ORACLE_KERNELS["periodic"] = _o_periodic


def test_esm_oracle_1d_periodic():
    """1-D periodic-kernel ESM vs the oracle — the reference's second
    kernel family (gp/kernels/periodic.py). No closed form: both sides
    integrate the measure (matching 128-node GH rule pins the algebra;
    the denser rule bounds the quadrature — the periodic integrand is
    smooth, so GH converges fast again)."""
    _compare("periodic", 1, (0.7, 0.8, 1.0), (0.35, 0.6, 1.0), rtol=1e-6,
             n_meas=128)
    _compare("periodic", 1, (0.7, 0.8, 1.0), (0.35, 0.6, 1.0), rtol=1e-4,
             n_meas=192)
