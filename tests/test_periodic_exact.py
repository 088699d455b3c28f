"""Exact periodic measure integrals via the Jacobi–Anger harmonic series.

Supersedes the Gauss–Hermite quadrature that previously served the periodic
kernel's Z/ESM estimates — GH needed n ≥ 32·(σ/(p·min(1,w)))² nodes to
resolve a period p under a measure of scale σ (the round-4
`periodic_gh_floor` rule), while the series is exact once truncated and
converges FASTER as p shrinks. Strategy mirrors the reference's
exact-vs-approx duality (bayesian_quadrature/tests/test_bq_c.py): each
closed form is pinned against an independent quadrature twin, and the old
GH path is retained as an oracle that must CONVERGE TO the closed form.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpubq
from tests import util as tu
from tpubq.models import bq as bqm
from tpubq.ops import integrals as igr
from tpubq.ops.kernels import get_kernel, periodic_K
from tpubq.utils.options import BQOptions


def test_ive_series_vs_scipy():
    """Miller-recurrence scaled Bessel table vs scipy.special.ive, f64 and
    f32, across the z range the kernel validity rule spans (z = 1/w²)."""
    from scipy.special import ive

    for z in (0.01, 0.5, 6.25, 25.0, 100.0, 400.0):
        # table sized by the kernel validity rule: N ≥ 8.5·√z + 8 (the seed
        # offset is tuned to that ceiling — below it, seed error shows)
        N = max(40, int(np.ceil(8.5 * np.sqrt(z))) + 8)
        a = np.asarray(igr.ive_series(jnp.float64(z), N))
        assert np.max(np.abs(a - ive(np.arange(N + 1), z))) < 5e-16, z
    a32 = np.asarray(igr.ive_series(jnp.float32(6.25), 48))
    assert np.max(np.abs(a32 - ive(np.arange(49), 6.25))) < 1e-6
    # traced z under vmap (the marginalize shape): rows match per-z calls
    zs = jnp.asarray([0.5, 12.0, 80.0])
    batch = np.asarray(jax.vmap(lambda z: igr.ive_series(z, 64))(zs))
    for i, z in enumerate(np.asarray(zs)):
        np.testing.assert_allclose(
            batch[i], ive(np.arange(65), z), rtol=0, atol=5e-16
        )


def test_periodic_single_integrals_vs_twins():
    """int_K / int_int_K closed forms vs the generic trapezoid twins."""
    th = np.array([1.3, 0.4, 0.7])
    mu = np.array([0.3])
    Sig = np.array([[1.5]])
    x = np.array([[0.85], [-1.2], [2.0]])
    xo = np.linspace(-12, 12, 40001)

    v = igr.int_K_periodic(jnp.asarray(x), th[0], th[1], th[2], mu, Sig, 64)
    tw = igr.approx_int_K(periodic_K, th, jnp.asarray(x), xo, mu, Sig)
    np.testing.assert_allclose(np.asarray(v), np.asarray(tw), rtol=1e-9)

    q = igr.int_int_K_periodic(th[0], th[1], th[2], mu, Sig, 64)
    qtw = igr.approx_int_int_K(periodic_K, th, xo, mu, Sig)
    np.testing.assert_allclose(float(q), float(qtw), rtol=1e-7)


def test_periodic_cross_integrals_vs_twins():
    """P/T/U closed forms vs the generic trapezoid twins, with INDEPENDENT
    (h, w, p) on the two kernels (the two GPs fit their periods freely)."""
    t1 = np.array([1.1, 0.5, 0.9])
    t2 = np.array([0.8, 0.35, 0.6])
    mu = np.array([0.1])
    Sig = np.array([[0.9]])
    x1 = np.linspace(-1.6, 1.4, 5)[:, None]
    x2 = np.array([-0.9, 0.3, 1.1])[:, None]
    xo = np.linspace(-9, 9, 12001)
    kfn, _ = get_kernel("periodic")
    th1 = (t1[0], t1[1], t1[2])
    th2 = (t2[0], t2[1], t2[2])

    P = igr.int_K1_K2_periodic(jnp.asarray(x1), jnp.asarray(x2), th1, th2,
                               mu, Sig, 90)
    P_tw = igr.approx_int_K1_K2(kfn, kfn, t1, t2, x1, x2, xo, mu, Sig)
    np.testing.assert_allclose(np.asarray(P), np.asarray(P_tw), rtol=1e-7)

    T = igr.int_int_K1_K2_periodic(jnp.asarray(x1), jnp.asarray(x2), th1,
                                   th2, mu, Sig, 90)
    T_tw = igr.approx_int_int_K1_K2(kfn, kfn, t1, t2, x1, x2, xo, mu, Sig)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_tw), rtol=1e-6)

    U = igr.int_K1_int_K2_periodic(jnp.asarray(x1), th1, th2, mu, Sig, 90)
    U_tw = igr.approx_int_K1_int_K2(kfn, kfn, t1, t2, x1, xo, mu, Sig)
    np.testing.assert_allclose(np.asarray(U), np.asarray(U_tw), rtol=1e-6)


def test_small_period_exact_where_gh_failed():
    """The hostile regime that motivated `periodic_gh_floor`: p = σ/20.
    The 128-node GH default errs at >1e-5 there (pinned in
    test_bq.py::test_periodic_small_period_floor); the series is exact."""
    th = np.array([1.0, 1.0, 0.05])
    mu = np.array([0.0])
    Sig = np.array([[1.0]])
    x = np.array([[0.3], [1.1]])
    # dense oracle needs ~40 points per period over ±8σ
    xo = np.linspace(-8, 8, 1_600_001)
    v = np.asarray(igr.int_K_periodic(jnp.asarray(x), th[0], th[1], th[2],
                                      mu, Sig, 64))
    tw = np.asarray(igr.approx_int_K(periodic_K, th, jnp.asarray(x), xo,
                                     mu, Sig))
    np.testing.assert_allclose(v, tw, rtol=1e-10)


def _periodic_state(p=1.0, w=0.8, n=9):
    x = np.linspace(-2.0, 2.0, n)
    l = np.exp(np.cos(2.0 * x)) / 8.0 + 0.05
    opts = BQOptions(kernel="periodic", dim=1, n_candidate=8,
                     candidate_thresh=0.2, max_obs=16)
    st = bqm.init_state(x, l, opts, params_tl=(0.7, w, p),
                        params_l=(0.35, w, p), x_mean=0.0, x_var=1.0)
    return st, opts


def test_zvar_periodic_exact_vs_dense_trapezoid():
    """f64 periodic V[Z] (closed-form assembly) meets the 1e-6 contract
    against the independent dense-trapezoid twin."""
    st, opts = _periodic_state()
    assert bqm._z_var_dispatch(opts) is bqm.Z_var_exact_terms
    v = float(bqm.Z_var(st, opts))
    oracle = float(bqm.approx_Z_var(st, opts, np.linspace(-10, 10, 8001)))
    assert abs(v - oracle) / abs(oracle) < 1e-7, (v, oracle)


def test_zvar_periodic_gh_ladder_converges_to_exact():
    """The superseded GH path, densified, converges TO the closed form —
    and the f32 dispatch still routes to it (cancellation stability)."""
    st, opts = _periodic_state()
    v = float(bqm.Z_var(st, opts))
    errs = []
    for n in (64, 256):
        zg = float(bqm.Z_var_gh(st, dataclasses.replace(opts, n_gh=n)))
        errs.append(abs(zg - v) / abs(v))
    assert errs[1] < errs[0] or errs[1] < 1e-10, errs
    assert errs[1] < 1e-6, errs
    o32 = dataclasses.replace(opts, dtype="float32")
    assert bqm._z_var_dispatch(o32) is bqm._z_var_gh_terms


def test_zmean_periodic_small_period_end_to_end():
    """End-to-end small-period E[Z]: the series-backed Z_mean matches a
    dense direct integral of the linearized posterior mean. Before round 4
    this was the documented invalid regime (default n_gh = 128 resolves
    only p ≥ σ/2)."""
    st, opts = _periodic_state(p=0.11, w=1.2)
    zm = float(bqm.Z_mean(st, opts))
    # direct oracle: ∫ m_l(x) p(x) dx + gamma-shift handled by approx twin
    oracle = float(bqm.approx_Z_mean(st, opts, np.linspace(-8, 8, 400001)))
    assert abs(zm - oracle) / abs(oracle) < 1e-8, (zm, oracle)


def test_periodic_marginalize_and_esm_finite():
    """The series is in-trace (traced θ): marginalize vmaps over sampled
    (h, w) with the period frozen, ESM scores a grid — all finite, V ≥ 0."""
    x = np.linspace(-2.0, 2.0, 9)
    l = np.exp(np.cos(2.0 * x)) / 8.0 + 0.05
    bq = tpubq.BQ(x, l, kernel="periodic", n_candidate=8,
                  candidate_thresh=0.2, x_mean=0.0, x_var=1.0, max_obs=16)
    bq.init(params_tl=(0.7, 0.8, 1.0), params_l=(0.35, 0.8, 1.0))
    zm, zv = bq.marginalize(n=6, params=("h", "w"), seed=3)
    assert np.all(np.isfinite(zm)) and np.all(np.isfinite(zv))
    assert np.all(zv >= 0.0)
    grid = np.linspace(-3, 3, 101)
    xn = bq.choose_next(grid, seed=0)
    assert np.isfinite(float(np.asarray(xn).ravel()[0]))
    ev = bq.expected_Z_var(np.asarray(xn).reshape(1, 1))
    assert np.isfinite(float(np.asarray(ev).ravel()[0]))


def test_series_floor_rule():
    """The truncation rule n_series ≥ 8.5/w + 8 is machine-exact at the
    floor even with NO measure damping (huge period), and visibly wrong
    well below it."""
    mu = np.array([0.0])
    Sig = np.array([[1.5]])
    x = np.array([[0.85], [-1.2]])
    w = 0.12
    need = bqm.periodic_series_floor((1.0, w, 20.0))
    assert need == int(np.ceil(8.5 / w)) + 8
    ref = np.asarray(igr.int_K_periodic(jnp.asarray(x), 1.0, w, 20.0, mu,
                                        Sig, 512))
    at_floor = np.asarray(igr.int_K_periodic(jnp.asarray(x), 1.0, w, 20.0,
                                             mu, Sig, need))
    below = np.asarray(igr.int_K_periodic(jnp.asarray(x), 1.0, w, 20.0, mu,
                                          Sig, max(8, need // 3)))
    assert np.max(np.abs(at_floor - ref) / np.abs(ref)) < 1e-11
    assert np.max(np.abs(below - ref) / np.abs(ref)) > 1e-7
