"""C++ oracle (native/bq_native.cpp) vs the JAX closed forms.

The native library reimplements the reference's bq_c.pyx quantities
independently of the JAX code — agreement at ~1e-12 is a strong check that
both derivations of the Osborne closed forms are right."""

import jax.numpy as jnp
import numpy as np
import pytest

from tests import util as tu
from tpubq.models import acquire
from tpubq.ops import integrals as igr
from tpubq.utils import native

pytestmark = pytest.mark.skipif(not native.available(), reason="no C++ toolchain")

H1, W1, H2, W2 = 0.8, 0.7, 1.3, 0.4
MU, S2 = 0.3, 0.9
RNG = np.random.RandomState(5)
X1 = RNG.randn(6)
X2 = RNG.randn(4)


def _jax_int_K(x, h, w):
    return np.asarray(
        igr.int_K(jnp.asarray(x)[:, None], h, jnp.asarray([w]),
                  jnp.asarray([MU]), jnp.asarray([[S2]]))
    )


def test_int_K_oracle():
    np.testing.assert_allclose(
        native.int_K(X1, H1, W1, MU, S2), _jax_int_K(X1, H1, W1), rtol=1e-12
    )


def test_int_int_K_oracle():
    got = native.int_int_K(H1, W1, MU, S2)
    want = float(igr.int_int_K(1, H1, jnp.asarray([W1]), jnp.asarray([MU]), jnp.asarray([[S2]])))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_int_K1_K2_oracle():
    got = native.int_K1_K2(X1, X2, H1, W1, H2, W2, MU, S2)
    want = np.asarray(
        igr.int_K1_K2(jnp.asarray(X1)[:, None], jnp.asarray(X2)[:, None], H1,
                      jnp.asarray([W1]), H2, jnp.asarray([W2]),
                      jnp.asarray([MU]), jnp.asarray([[S2]]))
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_int_int_K1_K2_oracle():
    got = native.int_int_K1_K2(X1, X2, H1, W1, H2, W2, MU, S2)
    want = np.asarray(
        igr.int_int_K1_K2(jnp.asarray(X1)[:, None], jnp.asarray(X2)[:, None],
                          H1, jnp.asarray([W1]), H2, jnp.asarray([W2]),
                          jnp.asarray([MU]), jnp.asarray([[S2]]))
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_int_K1_int_K2_oracle():
    got = native.int_K1_int_K2(X1, H1, W1, H2, W2, MU, S2)
    want = np.asarray(
        igr.int_K1_int_K2(jnp.asarray(X1)[:, None], H1, jnp.asarray([W1]), H2,
                          jnp.asarray([W2]), jnp.asarray([MU]), jnp.asarray([[S2]]))
    )
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_improve_conditioning_rescues_singular():
    x = np.array([0.0, 1e-9, 1.0])
    K = 1.0 * np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2)
    L, jitter = native.improve_conditioning(K)
    assert jitter > 0
    np.testing.assert_allclose(L @ L.T, K + jitter * np.eye(3), atol=1e-10)


def test_esm_grid_oracle_matches_jax():
    """The C++ sequential ESM loop reproduces the batched XLA scores."""
    bq = tu.make_bq()
    st = bq.state
    m_sc = np.asarray(st.sc_mask)
    m_s = np.asarray(st.obs_mask)
    xsc = np.asarray(st.x_sc)[m_sc, 0]
    alpha = np.asarray(st.gp_l.alpha)[m_sc]
    L_l = np.asarray(st.gp_l.L)[np.ix_(m_sc, m_sc)]
    xs = np.asarray(st.x_s)[m_s, 0]
    alpha_tl = np.asarray(st.gp_log_l.alpha)[m_s]
    L_tl = np.asarray(st.gp_log_l.L)[np.ix_(m_s, m_s)]
    grid = np.linspace(-3, 3, 101)
    got = native.esm_grid(
        grid, xsc, alpha, L_l, xs, alpha_tl, L_tl,
        h_l=float(st.gp_l.theta[0]), w_l=float(st.gp_l.theta[1]),
        h_tl=float(st.gp_log_l.theta[0]), w_tl=float(st.gp_log_l.theta[1]),
        mu=float(st.x_mean[0]), s2=float(st.x_var[0, 0]),
        gamma=float(st.gamma), thresh=bq.options.candidate_thresh,
    )
    want = np.asarray(acquire.expected_squared_mean(st, bq.options, grid))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_int_K_periodic_oracle():
    """Periodic single integral vs the C++ oracle (std::cyl_bessel_i — a
    stdlib Bessel, sharing no numerical code with ive_series' Miller
    recurrence)."""
    got = native.int_K_periodic(X1, 1.3, 0.45, 0.8, MU, S2, nterms=64)
    want = np.asarray(igr.int_K_periodic(
        jnp.asarray(X1)[:, None], 1.3, 0.45, 0.8,
        jnp.asarray([MU]), jnp.asarray([[S2]]), 64))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_int_int_K1_K2_periodic_oracle():
    """The periodic V[Z] workhorse vs the C++ oracle, independent (h, w, p)
    per kernel."""
    t1 = (0.9, 0.5, 1.1)
    t2 = (1.2, 0.4, 0.7)
    got = native.int_int_K1_K2_periodic(X1, X2, t1, t2, MU, S2, nterms=80)
    want = np.asarray(igr.int_int_K1_K2_periodic(
        jnp.asarray(X1)[:, None], jnp.asarray(X2)[:, None], t1, t2,
        jnp.asarray([MU]), jnp.asarray([[S2]]), 80))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-15)
