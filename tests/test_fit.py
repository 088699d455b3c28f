"""Hyperparameter fitting (vmapped multi-restart L-BFGS)."""

import jax
import jax.numpy as jnp
import numpy as np

from tests import util as tu
from tpubq.models import fit as fitm, gp as gpm
from tpubq.ops.kernels import get_kernel

KFN, _ = get_kernel("gaussian")


def test_fit_improves_mll():
    rng = np.random.RandomState(3)
    x = np.sort(rng.uniform(-3, 3, 14))[:, None]
    h_true, w_true, s = 1.5, 0.7, 0.05
    K = h_true**2 * np.exp(-0.5 * (x - x.T) ** 2 / w_true**2) + s**2 * np.eye(14)
    y = np.linalg.cholesky(K) @ rng.randn(14)
    xp, yp = jnp.asarray(x), jnp.asarray(y)
    mask = jnp.ones(14, bool)

    theta0 = jnp.asarray([0.3, 2.5])
    mll0 = float(gpm.log_mll(KFN, theta0, s, xp, yp, mask))
    theta, mll = fitm.fit_params("gaussian", theta0, s, xp, yp, mask, jax.random.PRNGKey(0))
    assert float(mll) > mll0
    # recovered scales in a sane range around truth
    assert 0.2 < float(theta[1]) < 2.5
    assert np.all(np.asarray(theta) > 0)


def test_fit_hypers_end_to_end_improves_accuracy():
    bq = tu.make_bq()
    bq.fit_hypers(seed=0)
    Z = tu.true_Z()
    assert abs(bq.Z_mean() - Z) / Z < 5e-3


def test_fit_deterministic_given_seed():
    bq1 = tu.make_bq().fit_hypers(seed=5)
    bq2 = tu.make_bq().fit_hypers(seed=5)
    np.testing.assert_allclose(
        np.asarray(bq1.gp_log_l.theta), np.asarray(bq2.gp_log_l.theta), rtol=1e-12
    )


def test_random_restarts_per_dimension_ranges():
    """ADVICE r1: length-scale inits must use each dimension's own live
    range, not dim 0's."""
    import jax
    import jax.numpy as jnp

    from tpubq.models.fit import random_restarts

    rng = np.random.RandomState(0)
    x = jnp.asarray(np.stack([rng.uniform(0, 1.0, 64), rng.uniform(0, 100.0, 64)], -1))
    y = jnp.asarray(rng.randn(64))
    mask = jnp.ones(64, bool)
    u = random_restarts(jax.random.PRNGKey(0), jnp.ones(3), x, y, mask, 64)
    w = np.exp(np.asarray(u[1:, 1:]))  # skip the incumbent row
    med0, med1 = np.median(w[:, 0]), np.median(w[:, 1])
    assert med1 / med0 > 20.0  # tracks the 100x range ratio


def test_random_restarts_periodic_seeding():
    """Periodic family: w is unitless (O(1)), period spans spacing..2*range."""
    import jax
    import jax.numpy as jnp

    from tpubq.models.fit import random_restarts

    x = jnp.asarray(np.linspace(0.0, 50.0, 32))[:, None]
    y = jnp.asarray(np.sin(np.asarray(x[:, 0])))
    mask = jnp.ones(32, bool)
    u = random_restarts(
        jax.random.PRNGKey(0), jnp.ones(3), x, y, mask, 64, kernel="periodic"
    )
    th = np.exp(np.asarray(u[1:]))
    assert th[:, 1].max() <= 2.0 + 1e-6 and th[:, 1].min() >= 0.1 - 1e-6
    spacing = 50.0 / 31.0
    assert th[:, 2].min() >= spacing - 1e-6 and th[:, 2].max() <= 100.0 + 1e-6


def test_fit_noise_param():
    """fit_hypers(params=('h','w','s')) fits the observation noise jointly
    (the reference's GP params vector is (theta..., s)). On noisy targets the
    fitted s moves off zero and the MLL-optimal fit keeps E[Z] sane."""
    import tpubq
    from tests import util as tu

    rng = np.random.RandomState(3)
    x = tu.make_x(16)
    l = tu.f_l(x) * np.exp(rng.randn(16) * 0.15)  # multiplicative noise
    bq = tpubq.BQ(x, l, n_candidate=12, candidate_thresh=0.2,
                  x_mean=0.0, x_var=1.0)
    bq.init(params_tl=(0.7, 0.8), params_l=(0.3, 0.4))
    assert float(bq.gp_log_l.s) == 0.0
    bq.fit_hypers(params=("h", "w", "s"), ntry=6, seed=0)
    s_fit = float(bq.gp_log_l.s)
    assert s_fit > 1e-4  # noise detected
    assert bq.s_tl == s_fit  # wrapper attribute tracks the fit
    assert abs(bq.Z_mean() - tu.true_Z()) / tu.true_Z() < 0.25
    # persistence round-trips the fitted noise
    import tempfile, os
    f = os.path.join(tempfile.mkdtemp(), "noisy.npz")
    bq.save(f)
    b2 = tpubq.BQ.load(f)
    assert abs(float(b2.gp_log_l.s) - s_fit) < 1e-12


def test_fit_noise_only_subset():
    """params=('s',) fits noise while every kernel param stays bit-identical."""
    import tpubq
    from tests import util as tu

    rng = np.random.RandomState(4)
    x = tu.make_x(14)
    l = tu.f_l(x) * np.exp(rng.randn(14) * 0.1)
    bq = tpubq.BQ(x, l, n_candidate=12, candidate_thresh=0.2,
                  x_mean=0.0, x_var=1.0)
    bq.init(params_tl=(0.7, 0.8), params_l=(0.3, 0.4))
    bq.fit_hypers(params=("s",), ntry=4, seed=1)
    np.testing.assert_array_equal(np.asarray(bq.gp_log_l.theta), [0.7, 0.8])
    assert float(bq.gp_log_l.s) > 0.0
