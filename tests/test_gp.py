"""GP engine: masked MLL/posterior vs NumPy oracle, autodiff grads vs FD
(reference: the gp package's own test strategy, absorbed here)."""

import jax
import jax.numpy as jnp
import numpy as np

from tpubq.models import gp as gpm
from tpubq.ops.kernels import get_kernel

RNG = np.random.RandomState(42)
KFN, KDIAG = get_kernel("gaussian")


def _problem(n=9, n_pad=4, s=0.1):
    x = np.sort(RNG.randn(n))[:, None]
    y = np.sin(2 * x[:, 0]) + 0.05 * RNG.randn(n)
    xp = np.concatenate([x, RNG.randn(n_pad, 1)], axis=0)
    yp = np.concatenate([y, RNG.randn(n_pad)], axis=0)
    mask = np.arange(n + n_pad) < n
    return x, y, jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(mask), s


def _np_mll(theta, s, x, y):
    h, w = theta
    K = h**2 * np.exp(-0.5 * (x - x.T) ** 2 / w**2) + s**2 * np.eye(len(y))
    L = np.linalg.cholesky(K)
    alpha = np.linalg.solve(K, y)
    return float(
        -0.5 * y @ alpha - np.sum(np.log(np.diag(L))) - 0.5 * len(y) * np.log(2 * np.pi)
    )


def test_masked_mll_matches_numpy_oracle():
    x, y, xp, yp, mask, s = _problem()
    theta = jnp.asarray([1.3, 0.8])
    got = float(gpm.log_mll(KFN, theta, s, xp, yp, mask, jitter=0.0))
    want = _np_mll(np.asarray(theta), s, x, y)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_mll_pad_invariance():
    """Padded garbage rows cannot change the MLL (the static-shape contract)."""
    x, y, xp, yp, mask, s = _problem()
    theta = jnp.asarray([1.3, 0.8])
    a = float(gpm.log_mll(KFN, theta, s, xp, yp, mask, jitter=0.0))
    xp2 = xp.at[-1].set(99.0)
    yp2 = yp.at[-1].set(-7.0)
    b = float(gpm.log_mll(KFN, theta, s, xp2, yp2, mask, jitter=0.0))
    assert a == b


def test_mll_grad_vs_finite_differences():
    x, y, xp, yp, mask, s = _problem()
    theta = np.array([1.3, 0.8])

    g = np.asarray(gpm.dlog_mll(KFN, jnp.asarray(theta), s, xp, yp, mask, jitter=0.0))
    eps = 1e-6
    for i in range(2):
        tp = theta.copy()
        tp[i] += eps
        tm = theta.copy()
        tm[i] -= eps
        fd = (_np_mll(tp, s, x, y) - _np_mll(tm, s, x, y)) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=1e-5)


def test_posterior_mean_cov_vs_numpy():
    x, y, xp, yp, mask, s = _problem()
    theta = jnp.asarray([1.1, 0.9])
    gp = gpm.gp_fit(KFN, theta, s, xp, yp, mask, base_jitter=0.0, ladder=False)
    xo = np.linspace(-2, 2, 17)[:, None]
    m = np.asarray(gpm.gp_mean(KFN, gp, jnp.asarray(xo)))
    C = np.asarray(gpm.gp_cov(KFN, gp, jnp.asarray(xo)))
    v = np.asarray(gpm.gp_var(KFN, KDIAG, gp, jnp.asarray(xo)))

    h, w = np.asarray(theta)
    Kxx = h**2 * np.exp(-0.5 * (x - x.T) ** 2 / w**2) + s**2 * np.eye(len(y))
    Kox = h**2 * np.exp(-0.5 * (xo - x.T) ** 2 / w**2)
    Koo = h**2 * np.exp(-0.5 * (xo - xo.T) ** 2 / w**2)
    m_np = Kox @ np.linalg.solve(Kxx, y)
    C_np = Koo - Kox @ np.linalg.solve(Kxx, Kox.T)
    np.testing.assert_allclose(m, m_np, atol=1e-10)
    np.testing.assert_allclose(C, C_np, atol=1e-9)
    np.testing.assert_allclose(v, np.diag(C_np), atol=1e-9)


def test_gp_fit_ladder_vmappable():
    """jitter_cholesky under vmap (batched marginalization pipeline)."""
    x, y, xp, yp, mask, s = _problem()
    thetas = jnp.asarray([[1.0, 0.5], [1.5, 1.0], [0.7, 1.4]])

    def fit_one(t):
        gp = gpm.gp_fit(KFN, t, s, xp, yp, mask)
        return gp.alpha

    alphas = jax.vmap(fit_one)(thetas)
    assert np.all(np.isfinite(np.asarray(alphas)))


def test_conditioning_collapse_fails_loudly():
    """VERDICT r1 #7: an unsalvageable Gram (non-finite inputs) must surface
    as ok=False + NaN-poisoned alpha, and the BQ wrapper must raise."""
    import jax.numpy as jnp
    import pytest

    from tpubq.models import gp as gpm
    from tpubq.ops.kernels import get_kernel

    kfn, _ = get_kernel("gaussian")
    x = jnp.asarray(np.linspace(-1, 1, 6))[:, None].at[2, 0].set(np.nan)
    y = jnp.ones(6)
    mask = jnp.ones(6, bool)
    st = gpm.gp_fit(kfn, jnp.asarray([1.0, 1.0]), 0.0, x, y, mask)
    assert not bool(st.ok)
    assert np.all(np.isnan(np.asarray(st.alpha)))

    # and through the user API: x is not validated for finiteness, so this
    # is exactly the silent-garbage path the check exists for
    import tpubq

    xs = np.linspace(-2, 2, 8)
    xs[3] = np.nan
    bq = tpubq.BQ(xs, np.exp(-0.5 * np.nan_to_num(xs) ** 2), x_mean=0.0, x_var=1.0)
    bq.init()
    with pytest.raises(FloatingPointError):
        bq.Z_mean()


def test_gp_fit_ok_true_on_healthy_gram():
    import jax.numpy as jnp

    from tpubq.models import gp as gpm
    from tpubq.ops.kernels import get_kernel

    kfn, _ = get_kernel("gaussian")
    x = jnp.asarray(np.linspace(-1, 1, 6))[:, None]
    st = gpm.gp_fit(kfn, jnp.asarray([1.0, 1.0]), 0.1, x, jnp.ones(6), jnp.ones(6, bool))
    assert bool(st.ok) and np.all(np.isfinite(np.asarray(st.alpha)))


def test_gp_fit_jitter_units_consistent_across_modes():
    """GPState.jitter is in absolute units in BOTH fit modes: at a rung-0
    factorization, ladder=True and ladder=False must record the same
    applied jitter (base_jitter × mean live diagonal)."""
    from tpubq.ops.kernels import get_kernel

    kfn, _ = get_kernel("gaussian")
    x = jnp.asarray(np.linspace(-2, 2, 7))[:, None]
    y = jnp.asarray(np.exp(-0.5 * np.asarray(x[:, 0]) ** 2))
    mask = jnp.ones(7, bool)
    theta = jnp.asarray([1.3, 0.8])
    g_lad = gpm.gp_fit(kfn, theta, 0.0, x, y, mask, base_jitter=1e-8, ladder=True)
    g_fix = gpm.gp_fit(kfn, theta, 0.0, x, y, mask, base_jitter=1e-8, ladder=False)
    assert bool(g_lad.ok) and bool(g_fix.ok)
    np.testing.assert_allclose(float(g_lad.jitter), float(g_fix.jitter), rtol=1e-12)
    assert float(g_fix.jitter) > 0  # absolute: base * mean diag (h² = 1.69)
    np.testing.assert_allclose(float(g_fix.jitter), 1e-8 * 1.69, rtol=1e-6)
