"""Float32 user-surface flows — the on-device (TPU) coverage set.

VERDICT r1 #6: the TPU-selected subset must exercise the full user surface,
not just the Pallas kernels. Every test here is pure float32 (the TPU hot
dtype; the tunneled compiler cannot build f64 programs), named ``*_f32`` so
tests/conftest.py selects it on the real chip, and runs identically on CPU
(where the rest of the suite provides the f64 parity oracle).
"""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import tpubq
from tests import util as tu

F32_KW = dict(dtype="float32")


def _make_bq_f32(**overrides):
    kw = dict(F32_KW)
    kw.update(overrides)
    return tu.make_bq(**kw)


def test_end_to_end_estimate_f32():
    bq = _make_bq_f32()
    assert abs(bq.Z_mean() - tu.true_Z()) / tu.true_Z() < 0.05
    assert bq.Z_var() >= 0.0


def test_save_load_roundtrip_f32(tmp_path):
    bq = _make_bq_f32()
    path = tmp_path / "bq_f32.npz"
    bq.save(path)
    b2 = tpubq.BQ.load(path)
    assert b2.options.dtype == "float32"
    np.testing.assert_allclose(b2.Z_mean(), bq.Z_mean(), rtol=1e-6)
    np.testing.assert_allclose(b2.x_s, bq.x_s, rtol=1e-7)


def test_marginalize_f32():
    bq = _make_bq_f32()
    zm, zv = bq.marginalize(n=8, seed=2)
    assert zm.shape == (8,) and zv.shape == (8,)
    assert np.all(np.isfinite(zm)) and np.all(zv >= 0)
    assert abs(np.mean(zm) - tu.true_Z()) / tu.true_Z() < 0.2


def test_marginalize_joint_f32():
    bq = _make_bq_f32()
    th = bq.sample_hypers(params=("h", "w", "h_l", "w_l"), n=6, seed=3)
    assert th.shape == (6, 4)
    zm, zv = bq.marginalize(n=6, params=("h", "w", "h_l", "w_l"), seed=3)
    assert np.all(np.isfinite(zm)) and np.all(np.isfinite(zv))


def test_choose_next_marginalized_f32():
    bq = _make_bq_f32()
    grid = np.linspace(-4, 4, 201).astype(np.float32)
    xn = bq.choose_next(grid, n=5, seed=3)
    assert np.any(np.isclose(grid, xn, atol=1e-6))


def test_active_loop_f32():
    bq = _make_bq_f32()
    grid = np.linspace(-4, 4, 101).astype(np.float32)
    v = [bq.Z_var()]
    for step in range(3):
        xn = bq.choose_next(grid, seed=step)
        bq.add_observation(xn, float(tu.f_l(xn)))
        v.append(bq.Z_var())
    assert bq.ns == 13
    assert v[-1] < v[0]  # expected posterior variance shrinks


def test_scan_active_loop_f32():
    """The fully on-device lax.scan active loop (acquire.run_active_loop)."""
    import jax.numpy as jnp

    from tpubq.models import acquire

    bq = _make_bq_f32()
    grid = jnp.asarray(np.linspace(-4, 4, 101), jnp.float32)

    def loglik(x):
        return jnp.exp(-0.5 * (x[0] - tu.MU_L) ** 2 / tu.SIG_L**2) / jnp.sqrt(
            2 * jnp.pi * tu.SIG_L**2
        )

    st, (xs, zms, zvs) = acquire.run_active_loop(
        bq.state, bq.options, loglik, grid[:, None], 3
    )
    assert int(st.ns) == bq.ns + 3
    assert np.all(np.isfinite(np.asarray(zms)))
    assert float(zvs[-1]) <= float(zvs[0]) + 1e-10


def test_fit_hypers_f32():
    bq = _make_bq_f32()
    mll_path = bq.fit_hypers(seed=0)
    assert np.all(np.asarray(bq.gp_log_l.theta) > 0)
    assert abs(bq.Z_mean() - tu.true_Z()) / tu.true_Z() < 0.05


def test_fit_hypers_subset_f32():
    bq = _make_bq_f32()
    w0 = float(np.asarray(bq.gp_log_l.theta)[1])
    bq.fit_hypers(params=("h",), seed=0)
    assert float(np.asarray(bq.gp_log_l.theta)[1]) == w0


def test_esm_vs_quadrature_twin_f32():
    from tpubq.models import acquire

    bq = _make_bq_f32()
    grid = np.linspace(-3, 3, 64).astype(np.float32)
    exact = np.asarray(acquire.expected_squared_mean(bq.state, bq.options, grid))
    approx = np.asarray(
        acquire.approx_expected_squared_mean(bq.state, bq.options, grid)
    )
    np.testing.assert_allclose(exact, approx, rtol=5e-3, atol=1e-8)


def test_expected_Z_var_identity_f32():
    bq = _make_bq_f32()
    x = np.float32(1.3)
    lhs = bq.expected_Z_var(x)
    rhs = bq.Z_mean() ** 2 + bq.Z_var() - bq.expected_squared_mean(x)
    # values are ~5e-6 built from ~0.1-scale terms: f32 rounding leaves ~3e-8
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-7)


def test_sharded_on_local_mesh_f32():
    """Sharded choose_next/marginalize on whatever mesh the platform offers
    ((1,1) on the single TPU chip; (2,4) on the 8-virtual-device CPU) matches
    the single-device paths."""
    import jax
    import jax.numpy as jnp

    from tpubq.models import acquire, bq as bqm
    from tpubq.models.marginalize import marginalize
    from tpubq.parallel.mesh import make_mesh
    from tpubq.parallel.sharded import choose_next_sharded, marginalize_sharded

    bq = _make_bq_f32()
    st, opts = bq.state, bq.options
    mesh = make_mesh(len(jax.devices()))
    grid = jnp.asarray(np.linspace(-4, 4, 64)[:, None], jnp.float32)
    hyp = jnp.asarray(bq.sample_hypers(n=5, seed=11), jnp.float32)

    x_s, sc_s = choose_next_sharded(st, opts, grid, mesh, hyp)
    x_u, sc_u = acquire.choose_next(st, opts, grid, hyp)
    np.testing.assert_allclose(np.asarray(sc_s), np.asarray(sc_u), rtol=2e-4, atol=1e-8)
    np.testing.assert_allclose(np.asarray(x_s), np.asarray(x_u), rtol=1e-6)

    zm_s, zv_s = marginalize_sharded(st, opts, hyp, mesh)
    zm_u, zv_u = marginalize(st, opts, hyp)
    np.testing.assert_allclose(np.asarray(zm_s), np.asarray(zm_u), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(zv_s), np.asarray(zv_u), rtol=2e-3, atol=1e-9)


def test_health_check_f32():
    from tpubq.utils.health import check_state, format_report

    bq = _make_bq_f32()
    diag = check_state(bq.state, bq.options)
    assert bool(np.asarray(diag["factor_ok_tl"])) and bool(np.asarray(diag["factor_ok_l"]))
    assert bool(np.asarray(diag["alpha_l_finite"]))
    report = format_report(diag)
    assert "factor_ok" in report


def test_plotting_smoke_f32():
    bq = _make_bq_f32()
    bq.plot(f_l=tu.f_l)
    import matplotlib.pyplot as plt

    plt.close("all")


def test_add_observation_capacity_growth_f32():
    bq = _make_bq_f32(max_obs=11)  # one free slot
    grid = np.linspace(-4, 4, 51).astype(np.float32)
    for step in range(3):  # forces a capacity doubling mid-loop
        xn = bq.choose_next(grid, seed=step)
        bq.add_observation(xn, float(tu.f_l(xn)))
    assert bq.ns == 13
    assert bq.options.max_obs >= 13


def test_fleet_batched_f32():
    """Batched (fleet) API in f32: B problems per dispatch."""
    from tpubq.models import batched as bt
    from tpubq.utils.options import BQOptions

    xs = np.stack([tu.make_x(), tu.make_x() + 0.1, tu.make_x() - 0.2])
    ls = np.stack([tu.f_l(x) for x in xs])
    opts = BQOptions(
        n_candidate=12, candidate_thresh=0.2, max_obs=16, dtype="float32"
    )
    fleet = bt.init_batch(xs, ls, opts, params_tl=(0.7, 0.8), params_l=(0.3, 0.4))
    zm = np.asarray(bt.Z_mean_batch(fleet, opts))
    zv = np.asarray(bt.Z_var_batch(fleet, opts))
    assert zm.shape == (3,)
    assert np.all(np.isfinite(zm)) and np.all(zv >= 0)


def test_refine_next_f32():
    from tpubq.models import acquire

    bq = _make_bq_f32()
    x0, scores = acquire.choose_next(bq.state, bq.options, np.linspace(-4, 4, 9).astype(np.float32))
    x_ref, v_ref = acquire.refine_next(bq.state, bq.options, x0)
    assert float(v_ref) >= float(np.max(np.asarray(scores))) - 1e-7
    assert np.all(np.isfinite(np.asarray(x_ref)))


def test_extra_kernels_f32():
    for kernel, params in (("matern32", (0.5, 0.8)), ("rq", (0.5, 0.8, 1.5))):
        bq = _make_bq_f32(kernel=kernel, init=False)
        bq.init(params_tl=params, params_l=params)
        assert abs(bq.Z_mean() - tu.true_Z()) / tu.true_Z() < 0.15
        assert bq.Z_var() >= 0.0


def test_bqfleet_class_f32():
    import tpubq

    xs = np.stack([tu.make_x() + 0.05 * i for i in range(3)])
    ls = np.stack([tu.f_l(x) for x in xs])
    fleet = tpubq.BQFleet(xs, ls, params_tl=(0.7, 0.8), params_l=(0.3, 0.4),
                          n_candidate=12, candidate_thresh=0.2,
                          dtype="float32", max_obs=16)
    zm = fleet.Z_mean()
    assert zm.shape == (3,) and np.all(np.isfinite(zm))
    xn = fleet.choose_next(np.linspace(-4, 4, 51).astype(np.float32))
    fleet.add_observation(xn, tu.f_l(xn[:, 0]))
    assert np.all(fleet.ns == 11)


def test_incremental_loop_f32():
    """Incremental (bordering/Woodbury) active loop in float32: finite, grows
    state, and tracks the full-refit loop within f32 drift tolerance (the
    periodic refresh bounds accumulation; see models/incremental.py)."""
    import jax.numpy as jnp

    from tpubq.models import acquire

    bq = _make_bq_f32(max_obs=32)
    grid = jnp.asarray(np.linspace(-4, 4, 101), jnp.float32)[:, None]

    def loglik(x):
        s2 = tu.SIG_L**2
        return jnp.exp(-0.5 * (x[0] - tu.MU_L) ** 2 / s2) / jnp.sqrt(2 * jnp.pi * s2)

    st_inc, (xs_i, zm_i, zv_i) = acquire.run_active_loop(
        bq.state, bq.options, loglik, grid, 6, incremental=True, refresh_every=4
    )
    st_full, (xs_f, zm_f, zv_f) = acquire.run_active_loop(
        bq.state, bq.options, loglik, grid, 6, incremental=False
    )
    assert int(st_inc.ns) == bq.ns + 6
    assert np.all(np.isfinite(np.asarray(zm_i)))
    np.testing.assert_allclose(np.asarray(zm_i), np.asarray(zm_f), rtol=1e-3)
    assert abs(float(zm_i[-1]) - tu.true_Z()) / tu.true_Z() < 0.05


def test_fleet_checkpoint_roundtrip_f32(tmp_path):
    """BQFleet save/load (utils/io.py fleet checkpoints) on the f32 device
    path: exact (factors reloaded) and refit modes must reproduce the
    estimates (VERDICT r2 #8 — this flow previously had no on-device
    coverage)."""
    import tpubq

    xs = np.stack([tu.make_x() + 0.05 * i for i in range(4)])
    ls = np.stack([tu.f_l(x) for x in xs])
    fleet = tpubq.BQFleet(xs, ls, params_tl=(0.7, 0.8), params_l=(0.3, 0.4),
                          n_candidate=12, candidate_thresh=0.2,
                          dtype="float32", max_obs=16)
    zm = fleet.Z_mean()
    p = str(tmp_path / "fleet_f32.npz")
    fleet.save(p)
    back = tpubq.BQFleet.load(p)
    np.testing.assert_allclose(back.Z_mean(), zm, rtol=1e-6)
    assert back.options.dtype == "float32"
    refit = tpubq.BQFleet.load(p, refit=True)
    np.testing.assert_allclose(refit.Z_mean(), zm, rtol=1e-4)


def test_health_check_under_vmap_f32():
    """utils.health.check_state is documented jit-safe; the fleet usage vmaps
    it over the batch axis — pin that it traces and returns per-problem
    diagnostics on the f32 path (VERDICT r2 #8)."""
    import jax

    from tpubq.models import batched
    from tpubq.utils import health

    xs = np.stack([tu.make_x() + 0.05 * i for i in range(3)])
    ls = np.stack([tu.f_l(x) for x in xs])
    import tpubq

    fleet = tpubq.BQFleet(xs, ls, params_tl=(0.7, 0.8), params_l=(0.3, 0.4),
                          n_candidate=12, candidate_thresh=0.2,
                          dtype="float32", max_obs=16)
    diag = jax.jit(
        jax.vmap(health.check_state, (0, None)), static_argnums=1
    )(fleet._states, fleet.options)
    assert diag["ns"].shape == (3,)
    assert np.all(np.asarray(diag["factor_ok_tl"]))
    assert np.all(np.asarray(diag["factor_ok_l"]))
    assert np.all(np.asarray(diag["alpha_l_finite"]))
    # the new pre-clamp V[Z] diagnostics vmap too; a healthy state's clamped
    # mass is at the rounding floor, far below O(1)
    assert diag["z_var_clamped_rel"].shape == (3,)
    assert np.all(np.asarray(diag["z_var_clamped_rel"]) < 1e-2)
    # per-problem report formatting pulls one problem out
    one = jax.tree_util.tree_map(lambda a: a[0], diag)
    txt = health.format_report(one)
    assert "z_var" in txt and "factor_ok" in txt


def test_fleet_hyper_surface_f32():
    """Fleet fit / sample_hypers / marginalize on the f32 device path."""
    import tpubq

    xs = np.stack([tu.make_x() + 0.05 * i for i in range(3)])
    ls = np.stack([tu.f_l(x) for x in xs])
    fleet = tpubq.BQFleet(xs, ls, params_tl=(0.7, 0.8), params_l=(0.3, 0.4),
                          n_candidate=12, candidate_thresh=0.2,
                          dtype="float32", max_obs=16)
    fleet.fit(seed=0, ntry=4)
    zm = fleet.Z_mean()
    assert np.all(np.isfinite(zm))
    assert np.all(np.abs(zm - tu.true_Z()) / tu.true_Z() < 0.25)
    hs = fleet.sample_hypers(n=10, seed=1)
    assert hs.shape[:2] == (3, 10) and np.all(np.isfinite(hs))
    zms, zvs = fleet.marginalize(n=10, seed=2)
    assert zms.shape == (3, 10) and np.all(np.isfinite(zms))
    assert np.all(zvs >= 0)


def test_matern_2d_mixture_f32():
    """The d >= 2 Matern Gamma-mixture measure integrals
    (integrals.int_K_matern_mixture) compiled and run in f32 on device:
    end-to-end 2-D matern52 estimate + one active step. The 2-D gaussian
    truth is N(0; 0, (1+0.4)I) per axis; the matern GP with data-scaled
    hypers should land within a loose band."""
    from scipy import stats

    rng = np.random.RandomState(3)
    X = rng.uniform(-2, 2, (12, 2)).astype(np.float32)
    L = stats.multivariate_normal.pdf(X, np.zeros(2), np.eye(2) * 0.4)
    bq = tpubq.BQ(X, L, dim=2, kernel="matern52", n_candidate=8,
                  candidate_thresh=0.25, x_mean=np.zeros(2), x_var=np.eye(2),
                  max_obs=24, dtype="float32")
    bq.init(params_tl=(0.7, 0.8, 0.8), params_l=(0.3, 0.4, 0.4))
    z_true = stats.multivariate_normal.pdf(np.zeros(2), np.zeros(2),
                                           np.eye(2) * 1.4)
    zm = float(bq.Z_mean())
    assert abs(zm - z_true) / z_true < 0.5, (zm, z_true)
    assert float(bq.Z_var()) >= 0.0
    g = np.linspace(-2.5, 2.5, 17, dtype=np.float32)
    grid = np.stack(np.meshgrid(g, g), -1).reshape(-1, 2)
    xn = bq.choose_next(grid)
    bq.add_observation(xn, float(stats.multivariate_normal.pdf(
        np.asarray(xn).reshape(2), np.zeros(2), np.eye(2) * 0.4)))
    assert np.isfinite(float(bq.Z_mean()))


def test_periodic_series_f32():
    """The Jacobi-Anger harmonic path (integrals.int_K_periodic +
    ive_series' in-trace Miller recurrence with f32 rescale thresholds)
    compiled and run in f32 on device: periodic Z_mean/ESM route through
    the series on BOTH dtypes (round 4, PARITY addendum (m)). Pins the
    estimate against the f64 CPU twin's value band and runs one active
    step + a hyper marginalization (traced z under vmap)."""
    x = np.linspace(-2.0, 2.0, 9, dtype=np.float32)
    l = (np.exp(np.cos(2.0 * x)) / 8.0 + 0.05).astype(np.float32)
    bq = tpubq.BQ(x, l, kernel="periodic", n_candidate=8,
                  candidate_thresh=0.2, x_mean=0.0, x_var=1.0, max_obs=16,
                  dtype="float32")
    bq.init(params_tl=(0.7, 0.8, 1.0), params_l=(0.35, 0.8, 1.0))
    zm = float(bq.Z_mean())
    # f64 CPU reference for this exact setup: 0.22434 (the f32 pipeline's
    # fidelity is bounded by the Gram's conditioning, not the series)
    assert abs(zm - 0.22434) / 0.22434 < 5e-3, zm
    assert float(bq.Z_var()) >= 0.0
    grid = np.linspace(-3, 3, 201, dtype=np.float32)
    xn = bq.choose_next(grid, seed=0)
    bq.add_observation(xn, float(np.exp(np.cos(
        2.0 * np.asarray(xn).reshape(()))) / 8.0 + 0.05))
    zms, zvs = bq.marginalize(n=4, params=("h", "w"), seed=2)
    assert np.all(np.isfinite(np.asarray(zms)))
    assert np.all(np.asarray(zvs) >= 0.0)
