"""BQ estimator behavior (reference: tests/test_bq.py)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import tpubq
from tests import util as tu
from tpubq.models import acquire, bq as bqm


def test_init_validation():
    x = tu.make_x()
    with pytest.raises(ValueError):
        tpubq.BQ(x, -tu.f_l(x))  # negative l
    with pytest.raises(ValueError):
        tpubq.BQ(x, np.full_like(x, np.nan))
    with pytest.raises(ValueError):
        tpubq.BQ(x, tu.f_l(x)[:-1])  # shape mismatch
    with pytest.raises(ValueError):
        tpubq.BQ(x, tu.f_l(x), bogus_option=1)


def test_init_rejects_nonpositive_theta():
    """Kernel params are positive scales: w = 0 divides into NaN Grams and
    negative h/w are sign-degenerate. Rejected host-side at BQ.init (and at
    fleet init on the concrete arrays — init_state itself runs under vmap
    and can only shape-check tracers)."""
    from tpubq.models import batched
    from tpubq.utils.options import BQOptions

    x = tu.make_x()
    l = tu.f_l(x)
    for bad in [(1.0, -0.5), (1.0, 0.0), (0.0, 1.0), (np.nan, 1.0), (1.0, np.inf)]:
        with pytest.raises(ValueError, match="finite and > 0"):
            tpubq.BQ(x, l, x_mean=0.0, x_var=1.0).init(params_tl=bad)
        with pytest.raises(ValueError, match="finite and > 0"):
            tpubq.BQ(x, l, x_mean=0.0, x_var=1.0).init(params_l=bad)
    opts = BQOptions(n_candidate=4, candidate_thresh=0.2, max_obs=16)
    xs = np.stack([x, x + 0.05])
    ls = np.stack([l, l])
    with pytest.raises(ValueError, match="finite and > 0"):
        batched.init_batch(xs, ls, opts, params_tl=np.array([[1.0, 0.4], [1.0, 0.0]]))
    # valid params still pass
    tpubq.BQ(x, l, x_mean=0.0, x_var=1.0).init(params_tl=(0.7, 0.8))


def test_candidate_spacing():
    bq = tu.make_bq()
    x_c = bq.x_c[:, 0]
    assert len(x_c) == bq.nc
    d = np.min(np.abs(x_c[:, None] - bq.x_s[:, 0][None, :]), axis=1)
    assert np.all(d >= bq.options.candidate_thresh)


def test_log_transform_roundtrip():
    bq = tu.make_bq()
    np.testing.assert_allclose(
        bq.tl_s, np.log1p(bq.l_s / float(bq.state.gamma)), rtol=1e-12
    )


def test_Z_mean_exact_vs_approx():
    bq = tu.make_bq()
    xo = tu.make_xo()
    exact = bq.Z_mean()
    approx = float(bqm.approx_Z_mean(bq.state, bq.options, xo))
    assert abs(exact - approx) / abs(exact) < 1e-6


def test_Z_var_exact_vs_approx():
    bq = tu.make_bq()
    xo = tu.make_xo()
    exact = bq.Z_var()
    approx = float(bqm.approx_Z_var(bq.state, bq.options, xo))
    assert abs(exact - approx) / abs(exact) < 1e-6


def test_Z_mean_vs_analytic_truth():
    bq = tu.make_bq()
    bq.fit_hypers(seed=0)
    Z = tu.true_Z()
    assert abs(bq.Z_mean() - Z) / Z < 5e-3  # statistical accuracy @ 10 obs
    assert bq.Z_var() > 0


def test_esm_exact_vs_gauss_hermite():
    bq = tu.make_bq()
    grid = np.linspace(-3, 3, 101)
    exact = np.asarray(acquire.expected_squared_mean(bq.state, bq.options, grid))
    gh = np.asarray(acquire.approx_expected_squared_mean(bq.state, bq.options, grid))
    np.testing.assert_allclose(exact, gh, rtol=1e-8)


def test_esm_degenerate_is_Zmean_squared():
    bq = tu.make_bq()
    x_dup = bq.x_s[3]  # exactly an existing observation
    esm = bq.expected_squared_mean(float(x_dup[0]))
    np.testing.assert_allclose(esm, bq.Z_mean() ** 2, rtol=1e-10)


def test_expected_Z_var_identity():
    bq = tu.make_bq()
    grid = np.linspace(-3, 3, 31)
    esm = bq.expected_squared_mean(grid)
    ezv = bq.expected_Z_var(grid)
    np.testing.assert_allclose(ezv, bq.Z_mean() ** 2 + bq.Z_var() - esm, rtol=1e-10)


def test_choose_next_returns_grid_member():
    bq = tu.make_bq()
    grid = np.linspace(-3, 3, 101)
    xn = bq.choose_next(grid)
    assert np.any(np.isclose(grid, xn))


def test_choose_next_marginalized():
    bq = tu.make_bq()
    grid = np.linspace(-3, 3, 41)
    xn = bq.choose_next(grid, n=5, seed=3)
    assert np.any(np.isclose(grid, xn))


def test_add_observation():
    bq = tu.make_bq()
    ns0 = bq.ns
    bq.add_observation(2.7, float(tu.f_l(2.7)))
    assert bq.ns == ns0 + 1
    assert np.isclose(bq.x_s[-1, 0], 2.7)
    assert np.isclose(bq.l_s[-1], tu.f_l(2.7))
    # tl recomputed, GPs refit, estimates finite
    assert np.isfinite(bq.Z_mean()) and np.isfinite(bq.Z_var())


def test_add_observation_rejects_duplicates_and_bad_l():
    bq = tu.make_bq()
    with pytest.raises(ValueError):
        bq.add_observation(float(bq.x_s[0, 0]), 0.5)
    with pytest.raises(ValueError):
        bq.add_observation(3.0, -1.0)


def test_add_observation_grows_capacity():
    bq = tu.make_bq(n=10, max_obs=11)
    bq.add_observation(2.5, float(tu.f_l(2.5)))
    bq.add_observation(2.6, float(tu.f_l(2.6)))  # exceeds max_obs=11 → grow
    assert bq.ns == 12
    assert bq.options.max_obs == 22
    assert np.isfinite(bq.Z_mean())


def test_active_loop_reduces_variance():
    bq = tu.make_bq()
    v0 = bq.Z_var()
    grid = np.linspace(-4, 4, 81)
    for _ in range(3):
        xn = bq.choose_next(grid)
        bq.add_observation(xn, float(tu.f_l(xn)))
    assert bq.Z_var() < v0
    Z = tu.true_Z()
    assert abs(bq.Z_mean() - Z) / Z < 2e-2


def test_scan_active_loop():
    import jax.numpy as jnp
    from scipy import stats

    bq = tu.make_bq()

    def loglik(x):
        s2 = tu.SIG_L**2
        return jnp.exp(-0.5 * (x[0] - tu.MU_L) ** 2 / s2) / jnp.sqrt(2 * jnp.pi * s2)

    grid = np.linspace(-4, 4, 81)
    st, (xs, zms, zvs) = acquire.run_active_loop(
        bq.state, bq.options, loglik, jnp.asarray(grid)[:, None], 3
    )
    assert np.all(np.isfinite(np.asarray(zms)))
    assert int(st.ns) == bq.ns + 3


def test_save_load_roundtrip(tmp_path):
    bq = tu.make_bq()
    bq.fit_hypers(seed=0)
    f = tmp_path / "bq.npz"
    bq.save(f)
    with pytest.raises(IOError):
        bq.save(f)  # no force
    bq.save(f, force=True)
    bq2 = tpubq.BQ.load(f)
    np.testing.assert_allclose(bq2.x_s, bq.x_s)
    np.testing.assert_allclose(bq2.l_s, bq.l_s)
    assert abs(bq2.Z_mean() - bq.Z_mean()) < 1e-12
    assert abs(bq2.Z_var() - bq.Z_var()) < 1e-12

    # the instance-RNG seed round-trips (review r3: reloading previously
    # reset every estimator to seed 0, re-correlating ensembles)
    bq_s = tu.make_bq(seed=11)
    fs = tmp_path / "bq_seeded.npz"
    bq_s.save(fs)
    assert tpubq.BQ.load(fs)._seed == 11


def test_load_reference_style_npz(tmp_path):
    """Checkpoint compatibility shim (SURVEY §5 checkpoint row): a
    reference-produced .npz — alternate field spellings, pickled options
    dict, no opt_* / theta_tl markers — loads into an equivalent BQ. The
    exact reference field set is unverifiable while the mount is empty, so
    the shim is pinned against every plausible spelling."""
    x = tu.make_x()
    l = tu.f_l(x)

    # variant A: reference init() naming + pickled options dict
    fa = tmp_path / "ref_a.npz"
    np.savez(
        fa, x=x, l=l, params_tl=np.array([0.7, 0.8]),
        params_l=np.array([0.3, 0.4]), gamma=1.0, x_mean=0.0, x_var=1.0,
        options=np.asarray({"n_candidate": 7, "candidate_thresh": 0.2,
                            "ntry": 10}, dtype=object),
    )
    with pytest.warns(UserWarning, match="ntry"):
        bq = tpubq.BQ.load(fa)
    assert bq.options.n_candidate == 7
    np.testing.assert_allclose(bq.x_s[:, 0], x)
    # equivalent native-constructed twin gives identical estimates
    twin = tpubq.BQ(x, l, n_candidate=7, candidate_thresh=0.2,
                    x_mean=0.0, x_var=1.0)
    twin.init(params_tl=(0.7, 0.8), params_l=(0.3, 0.4))
    assert abs(bq.Z_mean() - twin.Z_mean()) < 1e-12
    assert abs(bq.Z_var() - twin.Z_var()) < 1e-12

    # variant B: alternate measure/obs spellings, no hypers at all
    fb = tmp_path / "ref_b.npz"
    np.savez(fb, x_so=x, l_so=l, mean=np.array(0.0), cov=np.array(1.0))
    with pytest.warns(UserWarning, match="no hyperparameters"):
        bq_b = tpubq.BQ.load(fb)
    assert np.isfinite(bq_b.Z_mean())

    # variant C: junk file raises a specific error
    fc = tmp_path / "junk.npz"
    np.savez(fc, foo=np.arange(3))
    with pytest.raises(ValueError, match="neither tpubq-native nor reference"):
        tpubq.BQ.load(fc)


def test_marginalize_shapes_and_consistency():
    bq = tu.make_bq()
    zm, zv = bq.marginalize(n=8, seed=2)
    assert zm.shape == (8,) and zv.shape == (8,)
    assert np.all(np.isfinite(zm)) and np.all(np.isfinite(zv))
    Z = tu.true_Z()
    assert abs(zm.mean() - Z) / Z < 5e-2


def test_marginalize_matches_sequential():
    """The vmapped batched-Cholesky pipeline must equal a per-sample loop."""
    from tpubq.models import marginalize as margm

    bq = tu.make_bq()
    thetas = bq.sample_hypers(n=4, seed=7)
    import jax.numpy as jnp

    zm_b, zv_b = margm.marginalize(bq.state, bq.options, jnp.asarray(thetas))
    for i, th in enumerate(thetas):
        st = bqm.set_params(bq.state, bq.options, theta_tl=th)
        np.testing.assert_allclose(float(bqm.Z_mean(st, bq.options)), zm_b[i], rtol=1e-10)
        np.testing.assert_allclose(float(bqm.Z_var(st, bq.options)), zv_b[i], rtol=1e-10)


def test_plotting_smoke():
    bq = tu.make_bq()
    bq.plot(f_l=tu.f_l)
    bq.plot_gp_log_l(f_l=tu.f_l)
    bq.plot_gp_l(f_l=tu.f_l)
    bq.plot_l(f_l=tu.f_l)
    bq.plot_expected_squared_mean()
    bq.plot_expected_variance()
    import matplotlib.pyplot as plt

    plt.close("all")


def test_float32_mode_runs():
    bq = tu.make_bq(dtype="float32")
    assert np.isfinite(bq.Z_mean())
    grid = np.linspace(-3, 3, 64).astype(np.float32)
    esm = bq.expected_squared_mean(grid)
    assert np.all(np.isfinite(esm))


def test_Z_var_gh_matches_exact_in_f64():
    bq = tu.make_bq()
    e = float(bqm.Z_var_exact(bq.state, bq.options))
    g = float(bqm.Z_var_gh(bq.state, bq.options))
    assert abs(e - g) / abs(e) < 1e-6


def test_Z_var_f32_positive_and_accurate():
    """f32 dispatches to the GH-stabilized path; the closed form cancels
    catastrophically in f32 (observed negative on TPU hardware)."""
    import jax

    bq32 = tu.make_bq(dtype="float32")
    v32 = bq32.Z_var()
    assert v32 >= 0.0
    if jax.devices()[0].platform != "tpu":  # f64 reference is CPU-only
        v64 = tu.make_bq().Z_var()
        assert abs(v32 - v64) / abs(v64) < 5e-2
    else:
        assert abs(v32 - 5.108e-06) / 5.108e-06 < 0.2  # known f64 value


def test_periodic_kernel_bq_end_to_end():
    """Non-Gaussian kernel family: Z paths run via GH quadrature
    (reference: gp/kernels/periodic.py used on circular domains)."""
    import tpubq

    x = np.linspace(-2.0, 2.0, 9)
    l = np.exp(np.cos(x))  # positive, 2π-periodic integrand
    bq = tpubq.BQ(x, l, kernel="periodic", n_candidate=10, candidate_thresh=0.2,
                  x_mean=0.0, x_var=1.0, max_obs=16)
    bq.init(params_tl=(1.0, 1.0, 1.0), params_l=(1.0, 1.0, 1.0))
    zm = bq.Z_mean()
    zv = bq.Z_var()
    # truth: ∫ e^{cos x} N(x|0,1) dx via dense quadrature
    xo = np.linspace(-8, 8, 20001)
    p = np.exp(-0.5 * xo**2) / np.sqrt(2 * np.pi)
    z_true = np.trapezoid(np.exp(np.cos(xo)) * p, xo)
    assert abs(zm - z_true) / z_true < 5e-2
    assert zv >= 0
    # quadrature twin agreement
    zm_a = float(bqm.approx_Z_mean(bq.state, bq.options, tu.make_xo()))
    np.testing.assert_allclose(zm, zm_a, rtol=1e-6)
    # ESM + choose_next run
    grid = np.linspace(-3, 3, 41)
    esm = bq.expected_squared_mean(grid)
    assert np.all(np.isfinite(esm))
    xn = bq.choose_next(grid)
    assert np.any(np.isclose(grid, xn))


def test_2d_bq_z_mean_against_truth():
    """General-d closed forms: 2-D Gaussian integrand under a 2-D Gaussian
    measure (the reference is 1-D; d>1 is a capability extension, candidates
    supplied via a denser initial design)."""
    import tpubq
    from scipy import stats

    rng = np.random.RandomState(0)
    mu_l = np.array([0.2, -0.1])
    S_l = np.diag([0.3, 0.5])
    # observations on a 4x4 grid, plus jittered fill-ins
    g = np.linspace(-1.8, 1.8, 4)
    X = np.stack(np.meshgrid(g, g), -1).reshape(-1, 2)
    X = np.concatenate([X, rng.uniform(-2, 2, (8, 2))], axis=0)
    L = stats.multivariate_normal.pdf(X, mu_l, S_l)
    bq = tpubq.BQ(X, L, dim=2, n_candidate=6, candidate_thresh=0.25,
                  x_mean=np.zeros(2), x_var=np.eye(2), max_obs=32)
    bq.init(params_tl=(0.5, 0.9, 0.9), params_l=(0.2, 0.5, 0.5))
    zm = bq.Z_mean()
    z_true = stats.multivariate_normal.pdf(mu_l, np.zeros(2), np.eye(2) + S_l)
    assert abs(zm - z_true) / z_true < 0.1  # statistical accuracy @ 24 obs
    assert np.isfinite(bq.Z_var())
    # ESM over a 2-D grid works
    gg = np.stack(np.meshgrid(np.linspace(-2, 2, 9), np.linspace(-2, 2, 9)), -1).reshape(-1, 2)
    esm = bq.expected_squared_mean(gg)
    assert esm.shape == (81,) and np.all(np.isfinite(esm))


def test_3d_bq_z_mean_against_truth():
    """3-D closed forms + the d=3 tensor-GH V[Z] floor (previously the only
    untested dim below the QMC cutover): Gaussian integrand under a 3-D
    Gaussian measure has analytic Z."""
    import tpubq
    from scipy import stats

    rng = np.random.RandomState(0)
    mu_l = np.array([0.2, -0.1, 0.15])
    S_l = np.diag([0.35, 0.5, 0.4])
    g = np.linspace(-1.6, 1.6, 3)
    X = np.stack(np.meshgrid(g, g, g), -1).reshape(-1, 3)
    X = np.concatenate([X, rng.uniform(-1.8, 1.8, (10, 3))], axis=0)
    L = stats.multivariate_normal.pdf(X, mu_l, S_l)
    bq = tpubq.BQ(X, L, dim=3, n_candidate=6, candidate_thresh=0.3,
                  x_mean=np.zeros(3), x_var=np.eye(3), max_obs=48)
    bq.init(params_tl=(0.5, 0.9, 0.9, 0.9), params_l=(0.2, 0.55, 0.55, 0.55))
    zm = bq.Z_mean()
    z_true = stats.multivariate_normal.pdf(mu_l, np.zeros(3), np.eye(3) + S_l)
    assert abs(zm - z_true) / z_true < 0.15, (float(zm), z_true)
    zv = bq.Z_var()
    assert np.isfinite(zv) and zv >= 0.0
    # f32 routes V[Z] through the d=3 tensor-GH rule; parity vs f64 exact
    o32 = dict(dim=3, n_candidate=6, candidate_thresh=0.3, max_obs=48,
               dtype="float32", x_mean=np.zeros(3), x_var=np.eye(3))
    bq32 = tpubq.BQ(X, L, **o32)
    bq32.init(params_tl=(0.5, 0.9, 0.9, 0.9),
              params_l=(0.2, 0.55, 0.55, 0.55))
    zv32 = float(bq32.Z_var())
    assert zv32 >= 0.0
    assert abs(zv32 - float(zv)) <= 0.05 * max(float(zv), 1e-12), (
        zv32, float(zv))
    # ESM over a 3-D grid
    gg = rng.uniform(-2, 2, (50, 3))
    esm = bq.expected_squared_mean(gg)
    assert esm.shape == (50,) and np.all(np.isfinite(esm))


def test_gamma_not_one_consistency():
    """γ≠1 exercises the transform and the (m_l+γ) V[Z] weighting; the
    quadrature twins are the oracle."""
    bq = tu.make_bq(init=False)
    bq._gamma0 = 0.37
    bq.init(params_tl=(0.7, 0.8), params_l=(0.3, 0.4))
    assert bq.gamma == 0.37
    np.testing.assert_allclose(bq.tl_s, np.log1p(bq.l_s / 0.37), rtol=1e-12)
    xo = tu.make_xo()
    zm, zv = bq.Z_mean(), bq.Z_var()
    np.testing.assert_allclose(zm, float(bqm.approx_Z_mean(bq.state, bq.options, xo)), rtol=1e-6)
    np.testing.assert_allclose(zv, float(bqm.approx_Z_var(bq.state, bq.options, xo)), rtol=1e-6)
    # ESM closed form still matches its Gauss–Hermite twin with γ≠1
    grid = np.linspace(-3, 3, 41)
    e = np.asarray(acquire.expected_squared_mean(bq.state, bq.options, grid))
    g = np.asarray(acquire.approx_expected_squared_mean(bq.state, bq.options, grid))
    np.testing.assert_allclose(e, g, rtol=1e-8)


def test_noisy_gp_paths():
    """Nonzero observation noise s on both GPs (reference s option)."""
    import tpubq

    x = tu.make_x()
    bq = tpubq.BQ(x, tu.f_l(x), s=0.05, **tu.DEFAULT_OPTIONS)
    bq.init(params_tl=(0.7, 0.8), params_l=(0.3, 0.4))
    xo = tu.make_xo()
    np.testing.assert_allclose(
        bq.Z_mean(), float(bqm.approx_Z_mean(bq.state, bq.options, xo)), rtol=1e-6
    )
    np.testing.assert_allclose(
        bq.Z_var(), float(bqm.approx_Z_var(bq.state, bq.options, xo)), rtol=1e-6
    )
    grid = np.linspace(-3, 3, 31)
    e = np.asarray(acquire.expected_squared_mean(bq.state, bq.options, grid))
    g = np.asarray(acquire.approx_expected_squared_mean(bq.state, bq.options, grid))
    np.testing.assert_allclose(e, g, rtol=1e-8)
    bq.fit_hypers(seed=0)
    assert abs(bq.Z_mean() - tu.true_Z()) / tu.true_Z() < 2e-2


def test_single_multidim_point_query():
    """A (d,) query with dim > 1 is ONE point, not d bogus 1-D points."""
    import tpubq
    from scipy import stats

    rng = np.random.RandomState(0)
    X = rng.uniform(-2, 2, (12, 2))
    L = stats.multivariate_normal.pdf(X, [0.2, -0.1], np.diag([0.3, 0.5]))
    bq = tpubq.BQ(X, L, dim=2, n_candidate=6, candidate_thresh=0.25,
                  x_mean=np.zeros(2), x_var=np.eye(2), max_obs=16)
    bq.init(params_tl=(0.5, 0.9, 0.9), params_l=(0.2, 0.5, 0.5))
    single = bq.expected_squared_mean(np.array([0.3, 0.4]))
    assert np.ndim(single) == 0
    batch = bq.expected_squared_mean(np.array([[0.3, 0.4], [1.0, -1.0]]))
    assert batch.shape == (2,)
    np.testing.assert_allclose(float(single), batch[0], rtol=1e-12)
    with pytest.raises(ValueError):
        bq.expected_squared_mean(np.array([0.3, 0.4, 0.5]))  # wrong d


def test_2d_f32_Z_var_gh_stable():
    """Tensor-product GH Z_var: f32 2-D variance is non-negative and tracks
    the f64 closed form (the raw f32 closed form cancels catastrophically)."""
    import dataclasses

    import tpubq
    from scipy import stats

    rng = np.random.RandomState(0)
    X = rng.uniform(-2, 2, (16, 2))
    L = stats.multivariate_normal.pdf(X, [0.2, -0.1], np.diag([0.3, 0.5]))
    kwargs = dict(dim=2, n_candidate=6, candidate_thresh=0.25, max_obs=24,
                  x_mean=np.zeros(2), x_var=np.eye(2))
    import jax

    bq32 = tpubq.BQ(X, L, dtype="float32", n_gh=400, **kwargs).init(
        params_tl=(0.5, 0.9, 0.9), params_l=(0.2, 0.5, 0.5)
    )
    v32 = bq32.Z_var()
    assert v32 >= 0
    if jax.devices()[0].platform == "tpu":  # f64 reference is CPU-only
        return
    bq64 = tpubq.BQ(X, L, **kwargs).init(params_tl=(0.5, 0.9, 0.9), params_l=(0.2, 0.5, 0.5))
    v64 = float(bqm.Z_var_exact(bq64.state, bq64.options))
    assert abs(v32 - v64) / abs(v64) < 5e-3
    # f64 GH with a dense rule converges to the exact closed form
    opts_dense = dataclasses.replace(bq64.options, n_gh=1024)  # 32/axis
    g = float(bqm.Z_var_gh(bq64.state, opts_dense))
    assert abs(g - v64) / abs(v64) < 1e-4


def test_scan_active_loop_marginalized():
    import jax.numpy as jnp

    bq = tu.make_bq()
    hyp = jnp.asarray(bq.sample_hypers(n=4, seed=21))

    def loglik(x):
        s2 = tu.SIG_L**2
        return jnp.exp(-0.5 * (x[0] - tu.MU_L) ** 2 / s2) / jnp.sqrt(2 * jnp.pi * s2)

    grid = np.linspace(-4, 4, 41)
    st, (xs, zms, zvs) = acquire.run_active_loop(
        bq.state, bq.options, loglik, jnp.asarray(grid)[:, None], 2, hyp
    )
    assert int(st.ns) == bq.ns + 2
    assert np.all(np.isfinite(np.asarray(zms)))


def test_matern52_kernel_bq_end_to_end():
    """Third kernel family via the kernel-agnostic quadrature Z paths."""
    import tpubq
    from scipy import stats

    x = np.linspace(-2.2, 2.2, 10)
    l = stats.norm.pdf(x, 0.2, 0.5)
    bq = tpubq.BQ(x, l, kernel="matern52", n_candidate=10, candidate_thresh=0.2,
                  x_mean=0.0, x_var=1.0, max_obs=16)
    bq.init(params_tl=(0.7, 0.8), params_l=(0.3, 0.4))
    zm = bq.Z_mean()
    Z = tu.true_Z()
    assert abs(zm - Z) / Z < 5e-2
    assert bq.Z_var() >= 0
    # quadrature twin agreement (Matérn has a derivative cusp at r=0, so
    # Gauss–Hermite converges polynomially, not geometrically — 1e-3 at
    # n_gh=128 is the expected rate, unlike the smooth kernels' 1e-9)
    np.testing.assert_allclose(
        zm, float(bqm.approx_Z_mean(bq.state, bq.options, tu.make_xo())), rtol=1e-3
    )
    # V[Z] for a Matérn kernel in f64 now runs the exact Gamma-mixture
    # closed form (it replaced the 512-node GH cusp floor, which was
    # quadrature-bound at ~5e-4); pin it against the independent
    # dense-trapezoid twin (gp_mean/gp_cov + trapezoid — no shared
    # quadrature code). Full accuracy story: tests/test_matern_zvar.py.
    np.testing.assert_allclose(
        float(bq.Z_var()),
        float(bqm.approx_Z_var(bq.state, bq.options, tu.make_xo())),
        rtol=1e-7,
    )
    bq.fit_hypers(seed=0)
    assert abs(bq.Z_mean() - Z) / Z < 2e-2
    grid = np.linspace(-3, 3, 41)
    esm = bq.expected_squared_mean(grid)
    gh = np.asarray(
        acquire.approx_expected_squared_mean(bq.state, bq.options, grid)
    )
    np.testing.assert_allclose(esm, gh, rtol=1e-7)


def test_2d_default_init_is_dim_aware():
    """ADVICE r1 (medium): BQ.init() defaults must track dim. A flat (1, 1)
    theta in 2-D silently broadcast into wrong integrals (Z 0.203 vs 0.445);
    now defaults are (h, w_1..w_d) and wrong lengths are hard errors."""
    import tpubq
    from scipy import stats

    rng = np.random.RandomState(0)
    mu_l = np.array([0.2, -0.1])
    S_l = np.diag([0.3, 0.5])
    g = np.linspace(-1.8, 1.8, 4)
    X = np.stack(np.meshgrid(g, g), -1).reshape(-1, 2)
    X = np.concatenate([X, rng.uniform(-2, 2, (8, 2))], axis=0)
    L = stats.multivariate_normal.pdf(X, mu_l, S_l)
    bq = tpubq.BQ(X, L, dim=2, n_candidate=6, candidate_thresh=0.25,
                  x_mean=np.zeros(2), x_var=np.eye(2), max_obs=32)
    bq.init()  # defaults: theta length dim+1
    assert np.asarray(bq.gp_log_l.theta).shape == (3,)
    assert np.asarray(bq.gp_l.theta).shape == (3,)
    bq.fit_hypers(seed=0)
    zm = bq.Z_mean()
    z_true = stats.multivariate_normal.pdf(mu_l, np.zeros(2), np.eye(2) + S_l)
    assert abs(zm - z_true) / z_true < 0.1
    # wrong-length explicit params are rejected, not silently broadcast
    with pytest.raises(ValueError):
        bq.init(params_tl=(1.0, 1.0), params_l=(1.0, 1.0))


def test_scalar_x_mean_broadcasts_in_2d():
    """ADVICE r1: scalar x_mean must broadcast to (d,) like x_var does."""
    import tpubq
    from scipy import stats

    g = np.linspace(-1.5, 1.5, 4)
    X = np.stack(np.meshgrid(g, g), -1).reshape(-1, 2)
    L = stats.multivariate_normal.pdf(X, np.zeros(2), np.eye(2) * 0.4)
    bq = tpubq.BQ(X, L, dim=2, n_candidate=6, candidate_thresh=0.25,
                  x_mean=0.0, x_var=1.0, max_obs=32)
    bq.init()
    np.testing.assert_allclose(bq.x_mean, np.zeros(2))
    np.testing.assert_allclose(bq.x_var, np.eye(2))
    assert np.isfinite(bq.Z_mean())


def test_integral_w_length_guard():
    """ADVICE r1: integral helpers reject length-scale vectors that do not
    match the measure dimension (silent elementwise broadcast before)."""
    from tpubq.ops import integrals as igr
    import jax.numpy as jnp

    x = jnp.asarray(np.random.RandomState(0).randn(5, 2))
    mu = jnp.zeros(2)
    Sig = jnp.eye(2)
    with pytest.raises(ValueError):
        igr.int_K(x, 1.0, jnp.ones(1), mu, Sig)
    with pytest.raises(ValueError):
        igr.int_int_K(2, 1.0, jnp.ones(3), mu, Sig)
    with pytest.raises(ValueError):
        igr.int_K1_K2(x, x, 1.0, jnp.ones(2), 1.0, jnp.ones(1), mu, Sig)


def test_4d_f32_Z_var_qmc_matches_f64_closed_form():
    """VERDICT r1 #9: d > 3 f32 V[Z] goes through the Halton QMC rule instead
    of the cancellation-clamped closed form; accuracy vs the f64 exact form."""
    from scipy import stats

    from tpubq.models import bq as bqm
    from tpubq.utils.options import BQOptions

    rng = np.random.RandomState(0)
    d = 4
    X = rng.uniform(-1.8, 1.8, (40, d))
    L = stats.multivariate_normal.pdf(
        X, [0.2, -0.1, 0.1, 0.0], np.diag([0.4, 0.5, 0.45, 0.6])
    )
    kw = dict(dim=d, n_candidate=8, candidate_thresh=0.3, max_obs=48)
    st_kw = dict(
        params_tl=(0.5,) + (0.9,) * d, params_l=(0.2,) + (0.6,) * d,
        x_mean=np.zeros(d), x_var=np.eye(d),
    )
    import jax

    if jax.devices()[0].platform == "tpu":
        # f64 programs crash the tunneled compiler; value pinned from the
        # CPU f64 closed form on this fixed dataset (rel tol below is 1e-2)
        v_exact = 0.0022478938578462883
    else:
        o64 = BQOptions(dtype="float64", **kw)
        s64 = bqm.init_state(X, L, o64, **st_kw)
        v_exact = float(bqm.Z_var_exact(s64, o64))

    o32 = BQOptions(dtype="float32", **kw)
    s32 = bqm.init_state(X, L, o32, **st_kw)
    v32 = float(bqm.Z_var(s32, o32))  # dispatches to Z_var_qmc
    assert v32 >= 0.0
    assert abs(v32 - v_exact) / abs(v_exact) < 1e-2  # measured: ~4e-4


def test_4d_matern52_Z_var_no_capability_cliff():
    """Matérn at d > 3 no longer raises: f64 V[Z] via the Gamma-mixture
    closed form (any d; it was QMC before round 4 — non-Matérn non-gaussian
    kernels at d > 3 still take the QMC route)."""
    from scipy import stats

    from tpubq.models import bq as bqm
    from tpubq.utils.options import BQOptions

    rng = np.random.RandomState(1)
    d = 4
    X = rng.uniform(-1.5, 1.5, (32, d))
    L = stats.multivariate_normal.pdf(X, np.zeros(d), np.eye(d) * 0.5)
    opts = BQOptions(dim=d, kernel="matern52", n_candidate=6,
                     candidate_thresh=0.3, max_obs=40)
    st = bqm.init_state(X, L, opts, params_tl=(0.5,) + (0.9,) * d,
                        params_l=(0.2,) + (0.6,) * d,
                        x_mean=np.zeros(d), x_var=np.eye(d))
    v = float(bqm.Z_var(st, opts))
    assert np.isfinite(v) and v >= 0.0


@pytest.mark.parametrize("kernel,params", [
    ("matern32", (0.5, 0.8)),
    ("rq", (0.5, 0.8, 1.5)),
])
def test_extra_kernel_families_bq_end_to_end(kernel, params):
    """matern32 / rational-quadratic families run the full BQ pipeline via
    the kernel-agnostic measure quadratures (capability extension; the
    reference's GP engine was kernel-pluggable in principle)."""
    import tpubq
    from tests import util as tu

    x = tu.make_x(12)
    bq = tpubq.BQ(x, tu.f_l(x), kernel=kernel, n_candidate=12,
                  candidate_thresh=0.2, x_mean=0.0, x_var=1.0)
    bq.init(params_tl=params, params_l=params)
    bq.fit_hypers(ntry=4, seed=0)
    zm, zv = bq.Z_mean(), bq.Z_var()
    assert abs(zm - tu.true_Z()) / tu.true_Z() < 0.1
    assert zv >= 0.0
    grid = np.linspace(-4, 4, 101)
    xn = bq.choose_next(grid, n=3, seed=1)
    bq.add_observation(xn, float(tu.f_l(xn)))
    assert bq.ns == 13


def test_rq_param_subset_includes_alpha():
    import tpubq
    from tests import util as tu

    x = tu.make_x(10)
    bq = tpubq.BQ(x, tu.f_l(x), kernel="rq", n_candidate=10,
                  candidate_thresh=0.2, x_mean=0.0, x_var=1.0)
    bq.init()
    th = bq.sample_hypers(params=("alpha",), n=4, seed=0)
    assert th.shape == (4, 3)
    assert np.allclose(th[:, 0], th[0, 0]) and np.allclose(th[:, 1], th[0, 1])
    assert np.std(th[:, 2]) > 0


def test_refine_next_improves_on_coarse_grid():
    """Gradient refinement polishes the grid argmax off-grid: the refined
    ESM is >= the coarse-grid winner's and tracks the dense-grid optimum."""
    import jax.numpy as jnp

    bq = tu.make_bq()
    st, opts = bq.state, bq.options
    coarse = np.linspace(-4, 4, 9)  # deliberately coarse
    x0, scores = acquire.choose_next(st, opts, coarse)
    v0 = float(np.max(np.asarray(scores)))
    x_ref, v_ref = acquire.refine_next(st, opts, x0)
    assert float(v_ref) >= v0 - 1e-12
    # dense-grid oracle for the continuous argmax
    dense = np.linspace(-4, 4, 4001)
    dv = np.asarray(acquire.expected_squared_mean(st, opts, dense))
    x_star, v_star = dense[np.argmax(dv)], float(np.max(dv))
    assert float(v_ref) >= v0  # no worse than the start
    # refined value closes most of the coarse->dense gap
    if v_star - v0 > 1e-14:
        assert (float(v_ref) - v0) / (v_star - v0) > 0.7
    # and through the public API
    xr = bq.choose_next(coarse, refine=True)
    assert np.isfinite(xr)


def test_refine_next_marginalized_runs():
    import jax.numpy as jnp

    bq = tu.make_bq()
    hyp = jnp.asarray(bq.sample_hypers(n=3, seed=5))
    x0, _ = acquire.choose_next(bq.state, bq.options, np.linspace(-4, 4, 9), hyp)
    x_ref, v_ref = acquire.refine_next(bq.state, bq.options, x0, hyp)
    assert np.all(np.isfinite(np.asarray(x_ref))) and np.isfinite(float(v_ref))


def test_2d_candidates_fill_the_box():
    """d > 1 candidates are a space-filling (Halton) design over the live
    bounding box, not a 1-D line through the center (round-2 improvement)."""
    import jax.numpy as jnp

    from tpubq.models.bq import choose_candidates
    from tpubq.utils.options import BQOptions

    rng = np.random.RandomState(0)
    X = jnp.asarray(rng.uniform(-2, 2, (20, 2)))
    mask = jnp.ones(20, bool)
    opts = BQOptions(dim=2, n_candidate=16, candidate_thresh=0.05, max_obs=24)
    x_c, c_mask = choose_candidates(X, mask, opts)
    x_c = np.asarray(x_c)
    lo, hi = np.asarray(X).min(0), np.asarray(X).max(0)
    assert np.all(x_c >= lo - 1e-9) and np.all(x_c <= hi + 1e-9)
    # genuinely 2-D spread: both coordinates vary
    assert np.std(x_c[:, 0]) > 0.2 and np.std(x_c[:, 1]) > 0.2
    # spacing mask still enforced
    live = x_c[np.asarray(c_mask)]
    dmin = np.min(
        np.max(np.abs(live[:, None, :] - np.asarray(X)[None, :, :]), axis=-1), axis=1
    )
    assert np.all(dmin >= opts.candidate_thresh)


@pytest.mark.parametrize("d", [2, 3])
def test_general_d_Z_mean_closed_form_vs_gh_twin(d):
    """The general-d closed-form E[Z] equals Gauss–Hermite integration of the
    actual linear-GP posterior mean over the measure — the exact-vs-approx
    duality pattern, extended beyond the reference's 1-D twins."""
    import jax.numpy as jnp
    from scipy import stats

    from tpubq.models import bq as bqm, gp as gpm
    from tpubq.models.bq import _gh_nodes
    from tpubq.ops.kernels import get_kernel
    from tpubq.utils.options import BQOptions

    rng = np.random.RandomState(d)
    X = rng.uniform(-2, 2, (24, d))
    mu_l = np.linspace(0.2, -0.1, d)
    L = stats.multivariate_normal.pdf(X, mu_l, np.eye(d) * 0.4)
    # correlated measure to exercise the full-Sigma algebra
    A = rng.randn(d, d) * 0.15
    Sig = np.eye(d) + A @ A.T
    opts = BQOptions(dim=d, n_candidate=8, candidate_thresh=0.3, max_obs=32,
                     n_gh=6000 if d == 3 else 3000)
    st = bqm.init_state(X, L, opts, params_tl=(0.5,) + (0.9,) * d,
                        params_l=(0.2,) + (0.6,) * d,
                        x_mean=np.zeros(d), x_var=Sig)
    exact = float(bqm.Z_mean(st, opts))
    kfn, _ = get_kernel(opts.kernel)
    nodes, w = _gh_nodes(st, opts)
    approx = float(gpm.gp_mean(kfn, st.gp_l, nodes) @ w)
    assert abs(exact - approx) / abs(exact) < 5e-4


def test_plotting_raises_for_multidim():
    import tpubq
    from scipy import stats

    rng = np.random.RandomState(0)
    X = rng.uniform(-2, 2, (12, 2))
    L = stats.multivariate_normal.pdf(X, np.zeros(2), np.eye(2) * 0.4)
    bq = tpubq.BQ(X, L, dim=2, n_candidate=6, candidate_thresh=0.25, max_obs=16)
    bq.init()
    with pytest.raises(ValueError, match="1-D"):
        bq.plot_gp_l()


def test_plotting_2d_smoke():
    """d=2 diagnostics (extension: the reference plot_* set is 1-D-only):
    bq.plot routes to the heatmap triptych, plot_2d is callable directly,
    and d=1 problems reject plot_2d."""
    import tpubq
    from scipy import stats

    rng = np.random.RandomState(0)
    X = rng.uniform(-2, 2, (12, 2))
    L = stats.multivariate_normal.pdf(X, np.zeros(2), np.eye(2) * 0.4)
    bq = tpubq.BQ(X, L, dim=2, n_candidate=6, candidate_thresh=0.25, max_obs=24)
    bq.init()
    fig, axes = bq.plot()
    assert len(axes) == 3
    f2d = lambda P: stats.multivariate_normal.pdf(P, np.zeros(2), np.eye(2) * 0.4)
    fig2, _ = bq.plot_2d(n=24, f_l=f2d, xmin=-3.0, xmax=3.0)  # truth contours + bounds
    import matplotlib.pyplot as plt

    plt.close("all")
    with pytest.raises(ValueError, match="d=2"):
        tu.make_bq().plot_2d()


def test_scalar_params_raise_value_error():
    """A 0-d params value must produce the designed ValueError (entry-count
    message), not an IndexError from shape[0] on a scalar."""
    x = tu.make_x()
    with pytest.raises(ValueError, match="entries"):
        bqm.init_state(x, tu.f_l(x), tpubq.BQOptions(max_obs=16), params_tl=1.0)


def test_constructor_seed_controls_hyper_stream():
    """seed= at construction gives independent (and reproducible) hyper
    sample streams across ensemble members (VERDICT r2 weak #6)."""
    a = tu.make_bq(seed=1).sample_hypers(n=5, nburn=2)
    b = tu.make_bq(seed=2).sample_hypers(n=5, nburn=2)
    c = tu.make_bq(seed=1).sample_hypers(n=5, nburn=2)
    assert not np.allclose(a, b)
    np.testing.assert_allclose(a, c)


def test_marginalize_stacked_reference_shape():
    """stacked=True returns the reference's (n, len(funs)) array layout."""
    bq = tu.make_bq()
    out = bq.marginalize(n=6, stacked=True, seed=0)
    assert out.shape == (6, 2)
    zm, zv = bq.marginalize(n=6, stacked=False, seed=0)
    np.testing.assert_allclose(out[:, 0], zm)
    np.testing.assert_allclose(out[:, 1], zv)


def test_z_var_clamp_diagnostics_healthy_state():
    """check_state exposes the pre-clamp V[Z]: on a healthy state raw is
    positive (clamped_rel == 0) and matches Z_var; the gross magnitude
    bounds it (VERDICT r2 weak #4)."""
    from tpubq.utils import health

    bq = tu.make_bq()
    d = health.check_state(bq.state, bq.options)
    raw = float(d["z_var_raw"])
    gross = float(d["z_var_gross"])
    assert float(d["z_var_clamped_rel"]) == 0.0
    assert abs(raw - bq.Z_var()) <= 1e-12 * max(abs(raw), 1.0)
    assert gross >= raw > 0.0
    assert "z_var" in health.format_report(d)


def test_z_var_terms_follow_dispatch():
    """Z_var_terms mirrors the Z_var dispatch for the f32/GH path too."""
    bq = tu.make_bq(dtype="float32")
    raw, gross = bqm.Z_var_terms(bq.state, bq.options)
    # jit (Z_var) vs eager (Z_var_terms) f32 rounding differs slightly
    assert float(raw) == pytest.approx(bq.Z_var(), rel=1e-3)
    assert float(gross) >= float(raw)


def test_f32_esm_adaptive_guard_on_singular_gram():
    """Round-3 robustness regression: on a numerically singular f32 Gram
    (dense s=0 live set), the Schur complement is pure matmul noise
    (±5e-5 vs a true 2e-7); the old fixed eps·κ floor let noise-positive
    draws through and ESM divided by noise — scores 10× the f64 truth
    (max rel err 9.06 measured) at legitimate grid points. The adaptive
    ρ·κ·‖k‖₁ floor (acquire._esm_affine_terms) short-circuits unresolvable
    points to the Z_mean² limit; max error vs f64 truth drops to ~3e-2."""
    import jax
    import jax.numpy as jnp
    from scipy import stats

    from tpubq.models import acquire, batched
    from tpubq.utils.options import BQOptions

    rng = np.random.RandomState(11)
    max_obs, n_candidate, B = 48, 14, 5
    n_obs = max_obs - 6
    half = 0.09 * n_obs
    xs = np.stack([np.sort(rng.uniform(-half, half, n_obs)) for _ in range(B)])
    mus = rng.uniform(-0.5, 0.5, B)
    ls = np.stack([stats.norm.pdf(xs[b], mus[b], 1.0) + 1e-3 for b in range(B)])
    grid = np.linspace(-half - 1, half + 1, 257)[:, None]
    res = {}
    cpu = jax.devices("cpu")[0]
    for dt in ("float32", "float64"):
        # f64 truth pinned to the host CPU device (f64 silently NaNs on
        # the tunneled TPU — same convention as the fleet parity tests)
        import contextlib

        ctx = jax.default_device(cpu) if dt == "float64" else contextlib.nullcontext()
        with ctx:
            opts = BQOptions(n_candidate=n_candidate, candidate_thresh=0.12,
                             max_obs=max_obs, dtype=dt)
            states = batched.init_batch(
                xs, ls, opts, params_tl=(0.7, 0.8), params_l=(0.3, 0.4),
                x_means=np.zeros(1), x_vars=4.0 * np.ones(1),
            )
            res[dt] = np.asarray(jax.vmap(
                acquire.expected_squared_mean, (0, None, None)
            )(states, opts, jnp.asarray(grid, opts.np_dtype)))
    scale = np.abs(res["float64"]).max(axis=1, keepdims=True)
    err = np.abs(res["float32"] - res["float64"]) / scale
    assert err.max() < 0.1, err.max()  # measured 3.4e-2; was 9.06 unguarded


def test_guard_colsum_positive_kernel_invariant():
    """The adaptive Schur-noise guard computes ‖k‖₁ as a PLAIN colsum
    (acquire._esm_affine_terms): Σ|k| ≡ Σk holds only because every kernel
    in the registry is positive-valued (the abs-free form lets XLA fuse the
    reduce into k's producer — benchmarks/guard_fusion.py measured the abs
    materialization at ~8% of the ESM headline). If a signed kernel ever
    lands in ops.kernels._KERNELS, this test fails and jnp.abs must be
    restored in the guard's colsum."""
    import jax.numpy as jnp

    from tpubq.ops.kernels import _KERNELS

    rng = np.random.RandomState(3)
    n_theta = {"gaussian": 3, "periodic": 3, "matern52": 3, "matern32": 3,
               "rq": 4}
    assert set(n_theta) == set(_KERNELS), "new kernel: extend this test"
    for name, (kfn, kdiagfn) in _KERNELS.items():
        d = 1 if name == "periodic" else 2
        nt = n_theta[name] if name == "periodic" else n_theta[name] - 2 + d
        for _ in range(5):
            theta = jnp.asarray(rng.uniform(0.05, 3.0, nt), jnp.float32)
            x1 = jnp.asarray(rng.uniform(-30, 30, (17, d)), jnp.float32)
            x2 = jnp.asarray(rng.uniform(-30, 30, (23, d)), jnp.float32)
            K = np.asarray(kfn(theta, x1, x2))
            assert np.all(K >= 0.0), (name, K.min())
            assert np.all(np.asarray(kdiagfn(theta, x1)) >= 0.0), name
            # the exact property the guard relies on
            np.testing.assert_array_equal(
                np.sum(np.abs(K), axis=0), np.sum(K, axis=0))


def test_periodic_small_period_floor():
    """Weak-spot regime (VERDICT r3): a period p ≪ measure σ oscillates
    faster than the default 128 GH nodes resolve. Pins (a) the measured
    validity rule n_req = 32·(σ/(p·min(1,w)))², (b) that the rule's node
    count converges the measure integral where the default visibly fails,
    and (c) that the API warns a hostile-hyper user at init and fit."""
    import warnings

    import jax.numpy as jnp
    from scipy.special import roots_hermitenorm

    from tpubq.ops import kernels

    h, w, p = 1.0, 1.0, 0.25  # sigma=1 -> rule floor = 512
    need = bqm.periodic_gh_floor((h, w, p), 1.0)
    assert need == 512
    # dense-trapezoid oracle for the single measure integral at x_i = 0.3
    th = jnp.asarray([h, w, p], jnp.float64)
    xi = jnp.asarray([[0.3]], jnp.float64)
    xs = np.linspace(-10, 10, 400001)
    pdf = np.exp(-(xs**2) / 2) / np.sqrt(2 * np.pi)
    kv = np.asarray(kernels.periodic_K(th, jnp.asarray(xs)[:, None], xi))[:, 0]
    i_true = np.trapezoid(kv * pdf, xs)

    def gh(n):
        t, wq = roots_hermitenorm(n)
        kq = np.asarray(kernels.periodic_K(th, jnp.asarray(t)[:, None], xi))[:, 0]
        return float(np.sum(kq * wq / np.sqrt(2 * np.pi)))

    assert abs(gh(128) - i_true) / i_true > 1e-5      # default floor fails
    assert abs(gh(need) - i_true) / i_true < 1e-8     # rule floor converges
    # harmonic hardening: small w raises the floor quadratically
    assert bqm.periodic_gh_floor((h, 0.25, p), 1.0) == 8192

    # API warnings at init. The GH floor now governs only the float32 V[Z]
    # bilinear form (f64 periodic routes through the Jacobi–Anger closed
    # forms, which small periods make CONVERGE FASTER): an f64 init at the
    # hostile period must stay silent, an f32 one must warn.
    x = np.linspace(-2.0, 2.0, 9)
    l = np.exp(np.cos(x)) + 0.01
    kw = dict(kernel="periodic", n_candidate=6, candidate_thresh=0.2,
              x_mean=0.0, x_var=1.0, max_obs=16)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        tpubq.BQ(x, l, **kw).init(params_tl=(h, w, p), params_l=(h, w, p))
    with pytest.warns(UserWarning, match="GH resolution"):
        tpubq.BQ(x, l, dtype="float32", **kw).init(
            params_tl=(h, w, p), params_l=(h, w, p))
    # the series truncation has its own (period-independent) floor in w:
    # n_series < 8.5/w + 8 warns in either dtype
    assert bqm.periodic_series_floor((1.0, 0.1, 1.0)) == 93
    with pytest.warns(UserWarning, match="harmonic-series"):
        tpubq.BQ(x, l, **kw).init(
            params_tl=(1.0, 0.1, 1.0), params_l=(1.0, 0.1, 1.0))
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        tpubq.BQ(x, l, **kw).init(
            params_tl=(1.0, 1.0, 4.0), params_l=(1.0, 1.0, 4.0))


def test_measure_and_gamma_validation():
    """Round-3 robustness: a negative/indefinite x_var previously NaN'd
    every estimate silently, and gamma <= 0 produced silently-wrong
    results (log of a non-positive transform). Both now raise at
    construction, single-problem and fleet."""
    import pytest

    from tpubq.models import batched

    x = np.linspace(-2, 2, 8)
    l = np.exp(-(x**2))
    with pytest.raises(ValueError, match="positive semi-definite"):
        tpubq.BQ(x, l, x_mean=0.0, x_var=-1.0)
    with pytest.raises(ValueError, match="gamma"):
        tpubq.BQ(x, l, x_mean=0.0, x_var=1.0, gamma=0.0)
    with pytest.raises(ValueError, match="gamma"):
        tpubq.BQ(x, l, x_mean=0.0, x_var=1.0, gamma=-2.0)
    with pytest.raises(ValueError, match="positive semi-definite"):
        tpubq.BQ(np.stack([x, x + 0.3], 1), l, dim=2, x_mean=np.zeros(2),
                 x_var=np.array([[1.0, 2.0], [2.0, 1.0]]))
    # x_var = 0 is a legitimate degenerate measure (delta at x_mean)
    bq0 = tpubq.BQ(x, l, n_candidate=8, candidate_thresh=0.2,
                   x_mean=0.0, x_var=0.0)
    bq0.init(params_tl=(0.7, 0.8), params_l=(0.3, 0.4))
    assert abs(bq0.Z_mean() - 1.0) < 0.1  # Z -> l(0) = 1

    # rank-deficient but PSD covariances must pass: eigvalsh reports
    # ~-1e-16 eigenvalues for np.outer(v, v) and a zero-tolerance check
    # rejected them (review r3 finding #1); W + Sigma stays PD downstream
    from tpubq.models import bq as _bqm

    v = np.array([1.0, 2.0, 3.0])
    _bqm.validate_measure(np.outer(v, v))  # must not raise
    _bqm.validate_measure(np.zeros((2, 2)))  # degenerate-in-all-dims OK
    with pytest.raises(ValueError, match="positive semi-definite"):
        _bqm.validate_measure(np.array([[1.0, 0.0], [0.0, -1e-6]]))

    from tpubq.utils.options import BQOptions

    opts = BQOptions(n_candidate=8, candidate_thresh=0.2, max_obs=16)
    xs = np.stack([x, x + 0.1])
    ls = np.stack([l, l])
    with pytest.raises(ValueError, match="positive semi-definite"):
        batched.init_batch(xs, ls, opts, params_tl=(0.7, 0.8),
                           params_l=(0.3, 0.4), x_means=np.zeros(1),
                           x_vars=-1.0 * np.ones(1))
    with pytest.raises(ValueError, match="gamma"):
        batched.init_batch(xs, ls, opts, params_tl=(0.7, 0.8),
                           params_l=(0.3, 0.4), gamma=0.0)

    # ADVICE r3: eigvalsh reads one triangle, so an ASYMMETRIC x_var used
    # to pass PSD validation while the closed forms consumed the full
    # matrix — now rejected explicitly.
    with pytest.raises(ValueError, match="symmetric"):
        _bqm.validate_measure(np.array([[1.0, 0.5], [0.3, 1.0]]))


def test_unsupported_config_raises_not_asserts():
    """VERDICT r3 #6: entry-point precondition checks must survive
    ``python -O`` — ValueError, never bare assert."""
    import pytest

    from tpubq.models import acquire as acq

    bq = tu.make_bq()
    import dataclasses

    bad = dataclasses.replace(bq.options, kernel="matern52")
    with pytest.raises(ValueError, match="gaussian"):
        acq.expected_squared_mean_fused(bq.state, bad, np.array([0.3]))

    from tpubq.models import batched

    with pytest.raises(ValueError, match="packed fleet scorer"):
        batched.expected_squared_mean_fleet(bq.state, bad, np.array([0.3]))


def test_large_n_gh_stays_finite():
    """numpy's hermegauss weight formula 1/(H'_n)^2 overflows for
    n >~ 384 and silently NaNs every GH weight (measured: n_gh=512 gave
    V[Z]=nan); the scipy roots_hermitenorm rule is stable past 1024."""
    bq = tu.make_bq(n_gh=512, dtype="float32")  # f32 dispatches Z_var -> GH
    v = bq.Z_var()
    assert np.isfinite(v) and v > 0


def test_rq_narrow_width_floor_and_warnings():
    """Round-5 (VERDICT r4 missing #2): rq's V[Z] quadrature floor is
    measured and WARNED instead of degrading silently below w ≈ σ/8;
    single integrals (Z_mean / z-vectors) are exact at any width via the
    in-trace Gamma mixture."""
    import warnings

    # the measured rule: max(256, 128 (sigma/w)^2) per axis
    assert bqm.rq_gh_floor((1.0, 1.0, 2.0), 1.0) == 128
    assert bqm.rq_gh_floor((1.0, 0.25, 2.0), 1.0) == 2048
    assert bqm.rq_gh_floor((1.0, 0.125, 2.0), 1.0) == 8192
    # d = 2: the tensor rule needs the per-axis count on each axis
    assert bqm.rq_gh_floor((1.0, 0.5, 1.0, 2.0), np.eye(2)) == 512**2

    x = np.linspace(-2.0, 2.0, 9)
    l = np.exp(-0.5 * x**2) + 0.01
    kw = dict(kernel="rq", n_candidate=6, candidate_thresh=0.2,
              x_mean=0.0, x_var=1.0, max_obs=16)
    # wide width + healthy alpha: silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        tpubq.BQ(x, l, **kw).init(params_tl=(1.0, 1.0, 2.0),
                                  params_l=(1.0, 1.0, 2.0))
    # narrow width at default n_gh: warns naming n_gh
    with pytest.warns(UserWarning, match="GH resolution"):
        tpubq.BQ(x, l, **kw).init(params_tl=(1.0, 0.2, 2.0),
                                  params_l=(1.0, 1.0, 2.0))
    # alpha below the validated mixture envelope: warns
    with pytest.warns(UserWarning, match="rq shape"):
        tpubq.BQ(x, l, **kw).init(params_tl=(1.0, 1.0, 0.3),
                                  params_l=(1.0, 1.0, 2.0))


@pytest.mark.filterwarnings("ignore:.*GH resolution.*")
def test_rq_z_mean_exact_at_narrow_width():
    """rq Z_mean via the in-trace Gamma mixture matches the dense-trapezoid
    twin even at w = sigma/16 (where the retired GH fallback read ~O(1)
    errors; the V[Z] floor warning legitimately fires at this width and is
    filtered — Z_mean does not go through GH)."""
    x = np.sort(np.random.RandomState(3).uniform(-2, 2, 10))
    l = np.exp(-0.5 * (x - 0.2) ** 2 / 0.25) + 1e-3
    bq = tpubq.BQ(x, l, kernel="rq", n_candidate=8, candidate_thresh=0.15,
                  x_mean=0.0, x_var=1.0, max_obs=16)
    bq.init(params_tl=(0.7, 0.0625, 2.0), params_l=(0.3, 0.0625, 2.0))
    zm = bq.Z_mean()
    xo = np.linspace(-8, 8, 200001)
    zm_twin = float(bqm.approx_Z_mean(bq.state, bq.options, xo))
    assert abs(zm - zm_twin) <= 1e-6 * max(abs(zm_twin), 1e-12)


def test_sampled_hyper_floor_warning():
    """Round-5 (VERDICT r4 missing #6): floor checks cover SAMPLED hypers —
    `marginalize`/`choose_next(n>0)` evaluate at sampled θ inside the trace
    where nothing can warn, so the concrete batch is checked host-side and
    the warning names the violating fraction."""
    import warnings

    x = np.linspace(-2.0, 2.0, 9)
    l = np.exp(np.cos(x)) + 0.01
    bq = tpubq.BQ(x, l, kernel="periodic", n_candidate=6,
                  candidate_thresh=0.2, x_mean=0.0, x_var=1.0, max_obs=16)
    bq.init(params_tl=(1.0, 1.0, 4.0), params_l=(1.0, 1.0, 4.0))
    # the batch checker: a batch with 25% of rows below the series floor
    # must warn naming the fraction (rows are natural-space θ_tl = (h,w,p))
    batch = np.array([[1.0, 1.0, 4.0]] * 3 + [[1.0, 0.05, 4.0]])
    with pytest.warns(UserWarning, match="25% of the 4 hyper rows.*harmonic-series"):
        bq._warn_resolution(sampled=batch, context="test")
    # a compliant batch stays silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        bq._warn_resolution(sampled=np.array([[1.0, 1.0, 4.0]] * 4))
    # integration: the public sampling surface routes through the checker —
    # a tight prior around the healthy incumbent stays silent end-to-end
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        bq.sample_hypers(params=("h",), n=8, nburn=2, seed=0,
                         prior_std=0.05)
    # joint rows (θ_tl ∥ θ_l) split into per-GP θ rows: a violating
    # LINEAR-GP w must also be caught (here 1 of the 2 split rows)
    joint = np.array([[1.0, 1.0, 4.0, 1.0, 0.05, 4.0]])
    with pytest.warns(UserWarning, match="50% of the 2 hyper rows"):
        bq._warn_resolution(sampled=joint, context="test")
