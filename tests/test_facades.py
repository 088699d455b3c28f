"""Reference-surface facades: GP class, kernel classes, remove_jitter,
profiling timer (gp/gp.py::GP and gp/kernels/* parity)."""

import jax.numpy as jnp
import numpy as np

from tpubq.models.gp import GP
from tpubq.ops import linalg
from tpubq.ops.kernels import GaussianKernel, PeriodicKernel

RNG = np.random.RandomState(11)


def _data(n=9):
    x = np.sort(RNG.randn(n))
    y = np.sin(2 * x) + 0.05 * RNG.randn(n)
    return x, y


def test_gp_class_surface():
    x, y = _data()
    gp = GP("gaussian", [1.1, 0.9], x, y, s=0.1)
    xo = np.linspace(-2, 2, 7)
    m = np.asarray(gp.mean(xo))
    C = np.asarray(gp.cov(xo))
    assert m.shape == (7,) and C.shape == (7, 7)
    # numpy oracle
    h, w, s = 1.1, 0.9, 0.1
    Kxx = h**2 * np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2 / w**2) + s**2 * np.eye(len(x))
    Kox = h**2 * np.exp(-0.5 * (xo[:, None] - x[None, :]) ** 2 / w**2)
    np.testing.assert_allclose(m, Kox @ np.linalg.solve(Kxx, y), atol=1e-8)
    # Kxx / inv_Kxx round-trip
    KK = np.asarray(gp.Kxx)
    Ki = np.asarray(gp.inv_Kxx)
    np.testing.assert_allclose(KK @ Ki, np.eye(len(x)), atol=1e-6)
    # log_lh + gradient finite; params set/get refits
    assert np.isfinite(gp.log_lh)
    assert gp.dloglh_dtheta.shape == (2,)
    lh0 = gp.log_lh
    gp2 = gp.copy()
    gp2.params = [1.5, 0.5, 0.1]
    assert gp2.log_lh != lh0
    assert gp.log_lh == lh0  # copy isolated


def test_kernel_class_jacobian_matches_fd():
    x, _ = _data(5)
    k = GaussianKernel(1.2, 0.7)
    J = np.asarray(k.jacobian(x, x))
    eps = 1e-6
    for i, dp in enumerate(np.eye(2)):
        kp = GaussianKernel(*(np.array([1.2, 0.7]) + eps * dp))
        km = GaussianKernel(*(np.array([1.2, 0.7]) - eps * dp))
        fd = (np.asarray(kp.K(x, x)) - np.asarray(km.K(x, x))) / (2 * eps)
        np.testing.assert_allclose(J[i], fd, atol=1e-5)
    H = np.asarray(k.hessian(x, x))
    assert H.shape == (2, 2, 5, 5)
    np.testing.assert_allclose(H[0, 1], H[1, 0], atol=1e-10)  # symmetric


def test_periodic_kernel_class():
    x, _ = _data(5)
    k = PeriodicKernel(1.0, 0.8, 1.0)
    K = np.asarray(k.K(x, x))
    assert np.allclose(np.diag(K), 1.0)
    assert np.asarray(k.jacobian(x, x)).shape == (3, 5, 5)


def test_remove_jitter_roundtrip():
    x = np.array([[0.0], [1e-9], [1.0]])
    from tpubq.ops.kernels import gaussian_K

    K = gaussian_K(jnp.asarray([1.0, 1.0]), jnp.asarray(x), jnp.asarray(x))
    mask = jnp.ones(3, bool)
    L, jit_used, ok = linalg.jitter_cholesky(K, mask)
    K_conditioned = K + jnp.eye(3) * jit_used
    back = linalg.remove_jitter(K_conditioned, jit_used, mask)
    np.testing.assert_allclose(np.asarray(back), np.asarray(K), atol=1e-14)


def test_time_fn_runs():
    import jax

    from tpubq.utils.profiling import time_fn

    f = jax.jit(lambda a: a @ a)
    dt, out = time_fn(f, jnp.eye(16), iters=3, warmup=1, repeats=2)
    assert dt > 0 and out.shape == (16, 16)


def test_health_check():
    import jax.numpy as jnp

    from tests import util as tu
    from tpubq.utils import health

    bq = tu.make_bq()
    diag = health.check_state(bq.state, bq.options)
    assert bool(diag["l_s_finite"]) and bool(diag["alpha_l_finite"])
    assert int(diag["ns"]) == 10
    assert float(diag["gp_l"]["cond_estimate"]) >= 1.0
    report = health.format_report(diag)
    assert "finite" in report and "cond~" in report
    # jit/vmap-safe
    import jax

    jax.jit(health.check_state, static_argnums=1)(bq.state, bq.options)
    # the BQ facade spelling
    assert bq.health()["ns"] == diag["ns"]
    assert "cond~" in bq.health(as_report=True)


def test_health_overshoot_bound_flags_ringing():
    """The mean-overshoot bound separates healthy interpolation from the
    ringing failure class (closely-spaced zero-noise design → huge
    cancelling alphas → extrapolation overshoot with every other
    diagnostic green — the case a round-3 fuzz run surfaced)."""
    import numpy as np

    from tpubq.models import bq as bqm
    from tpubq.utils import health
    from tpubq.utils.options import BQOptions

    opts = BQOptions(dim=1, n_candidate=8, candidate_thresh=0.3, max_obs=24)

    def bound(x):
        l = np.exp(-0.5 * (x[:, 0] - 0.2) ** 2 / 0.3) + 1e-6
        st = bqm.init_state(x, l, opts, params_tl=(1.0, 0.9),
                            params_l=(0.4, 0.7))
        diag = health.check_state(st, opts)
        return float(diag["mean_overshoot_bound_l"])

    healthy = bound(np.linspace(-2.2, 2.2, 10)[:, None])
    # same box, but with near-coincident pairs (spacing ~0.07 ≪ lengthscale)
    xs = np.sort(np.concatenate([
        np.linspace(-2.2, 2.2, 10),
        np.linspace(-2.2, 2.2, 10) + 0.07,
    ]))[:, None]
    ringing = bound(xs)
    # the bound is a RELATIVE indicator (loose by construction): well-spaced
    # measures in the tens here, the near-coincident design ~2800x that
    assert healthy < 100.0, healthy
    assert ringing > 100.0 * healthy, (healthy, ringing)


def test_state_io_roundtrip(tmp_path):
    import pytest

    from tests import util as tu
    from tpubq.utils import io as tio

    bq = tu.make_bq()
    f = tmp_path / "state.npz"
    tio.save_state(f, bq.state, bq.options)
    with pytest.raises(IOError):
        tio.save_state(f, bq.state, bq.options)
    st, opts = tio.load_state(f)
    assert opts == bq.options
    from tpubq.models import bq as bqm

    np.testing.assert_allclose(
        float(bqm.Z_mean(st, opts)), bq.Z_mean(), rtol=1e-14
    )
    st2, _ = tio.load_state(f, refit=True)
    np.testing.assert_allclose(
        float(bqm.Z_mean(st2, opts)), bq.Z_mean(), rtol=1e-10
    )


def test_fleet_state_io_roundtrip(tmp_path):
    from scipy import stats

    from tpubq.models import batched, bq as bqm
    from tpubq.utils import io as tio
    from tpubq.utils.options import BQOptions

    opts = BQOptions(n_candidate=10, candidate_thresh=0.2, max_obs=16)
    xs = np.stack([np.linspace(-2.2, 2.2, 10)] * 3)
    ls = np.stack([stats.norm.pdf(xs[i], 0.1 * i, 0.5) for i in range(3)])
    states = batched.init_batch(xs, ls, opts, params_tl=(0.7, 0.8), params_l=(0.3, 0.4))
    f = tmp_path / "fleet.npz"
    tio.save_state(f, states, opts)
    st, opts2 = tio.load_state(f, refit=True)
    np.testing.assert_allclose(
        np.asarray(batched.Z_mean_batch(st, opts2)),
        np.asarray(batched.Z_mean_batch(states, opts)),
        rtol=1e-10,
    )


def test_matern32_and_rq_kernel_facades():
    from tpubq.ops.kernels import Matern32Kernel, RationalQuadraticKernel

    x = np.linspace(-1, 1, 7)
    for k in (Matern32Kernel(0.9, 0.6), RationalQuadraticKernel(0.9, 0.6, 2.0)):
        K = np.asarray(k.K(x, x))
        np.testing.assert_allclose(np.diag(K), 0.81, rtol=1e-6)
        np.testing.assert_allclose(K, K.T, rtol=1e-12)
        assert np.min(np.linalg.eigvalsh(K + 1e-10 * np.eye(7))) > 0
        J = np.asarray(k.jacobian(x, x))
        assert J.shape[0] == len(k.params) and np.all(np.isfinite(J))


def test_rq_limits_to_gaussian():
    """alpha -> inf recovers the gaussian kernel."""
    import jax.numpy as jnp

    from tpubq.ops.kernels import gaussian_K, rq_K

    x = jnp.linspace(-1, 1, 9)[:, None]
    Kg = np.asarray(gaussian_K(jnp.asarray([0.7, 0.5]), x, x))
    Kr = np.asarray(rq_K(jnp.asarray([0.7, 0.5, 1e6]), x, x))
    np.testing.assert_allclose(Kr, Kg, rtol=1e-4)
