"""Incremental add_observation (bordering / block Woodbury) vs the full refit.

The incremental algebra in ``tpubq/models/incremental.py`` is exact, so in
float64 a fast-path step must match ``acquire.add_observation``'s full refit
to roundoff; every fallback condition (range extension, duplicates, refresh
cadence, capacity) must produce the full refit's state verbatim.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import util as tu
from tpubq.models import acquire, bq as bqm
from tpubq.models.incremental import add_observation_fast
from tpubq.utils.options import BQOptions


def _assert_states_close(fast, full, rtol=1e-7, atol=1e-10):
    np.testing.assert_array_equal(np.asarray(fast.obs_mask), np.asarray(full.obs_mask))
    np.testing.assert_array_equal(np.asarray(fast.c_mask), np.asarray(full.c_mask))
    assert int(fast.ns) == int(full.ns)
    for name in ("x_s", "l_s", "tl_s", "x_c", "l_c"):
        np.testing.assert_allclose(
            np.asarray(getattr(fast, name)), np.asarray(getattr(full, name)),
            rtol=rtol, atol=atol, err_msg=name,
        )
    for gp_name in ("gp_log_l", "gp_l"):
        gf, gr = getattr(fast, gp_name), getattr(full, gp_name)
        assert bool(gf.ok) and bool(gr.ok)
        np.testing.assert_allclose(
            np.asarray(gf.jitter), np.asarray(gr.jitter), rtol=1e-12,
            err_msg=f"{gp_name}.jitter",
        )
        for f in ("L", "alpha", "Kinv", "y"):
            np.testing.assert_allclose(
                np.asarray(getattr(gf, f)), np.asarray(getattr(gr, f)),
                rtol=rtol, atol=atol, err_msg=f"{gp_name}.{f}",
            )


def test_incremental_add_matches_full_refit():
    """Interior point that also kills a candidate: the richest fast-path case
    (log-GP bordering + candidate flip + linear-GP Woodbury delete + add)."""
    bq = tu.make_bq()
    st = bq.state
    opts = bq.options
    # Sit right on a live candidate so the thresh filter flips it off.
    x_c_live = np.asarray(st.x_c)[np.asarray(st.c_mask)]
    assert x_c_live.shape[0] >= 1
    x_a = jnp.asarray(x_c_live[0])
    l_a = jnp.asarray(float(tu.f_l(float(x_a[0]))))

    fast = add_observation_fast(st, opts, x_a, l_a)
    full = acquire.add_observation(st, opts, x_a, l_a)
    # The flip must actually have exercised the Woodbury deletion.
    assert int(np.sum(np.asarray(fast.c_mask))) < int(np.sum(np.asarray(st.c_mask)))
    _assert_states_close(fast, full)


def test_incremental_add_no_flip_matches_full_refit():
    """Interior point clear of every candidate: pure bordering, no deletion."""
    bq = tu.make_bq()
    st, opts = bq.state, bq.options
    x_c = np.asarray(st.x_c)[np.asarray(st.c_mask), 0]
    x_a = None
    for cand in np.linspace(-2.0, 2.0, 97):
        if (np.abs(x_c - cand).min() > opts.candidate_thresh
                and np.abs(np.asarray(bq.x_s)[:, 0] - cand).min() > 1e-3):
            x_a = cand
            break
    assert x_a is not None
    fast = add_observation_fast(st, opts, jnp.asarray([x_a]), float(tu.f_l(x_a)))
    full = acquire.add_observation(st, opts, jnp.asarray([x_a]), float(tu.f_l(x_a)))
    np.testing.assert_array_equal(np.asarray(fast.c_mask), np.asarray(st.c_mask))
    _assert_states_close(fast, full)


def test_incremental_estimates_match_full():
    """Z moments and ESM computed on the fast-path state agree with the
    full-refit state (the consumers of L/K⁻¹/α all see exact values)."""
    bq = tu.make_bq()
    st, opts = bq.state, bq.options
    x_a, l_a = jnp.asarray([0.55]), float(tu.f_l(0.55))
    fast = add_observation_fast(st, opts, x_a, l_a)
    full = acquire.add_observation(st, opts, x_a, l_a)
    assert np.isclose(float(bqm.Z_mean(fast, opts)), float(bqm.Z_mean(full, opts)), rtol=1e-9)
    assert np.isclose(float(bqm.Z_var(fast, opts)), float(bqm.Z_var(full, opts)), rtol=1e-8)
    grid = jnp.asarray(np.linspace(-3, 3, 64))[:, None]
    np.testing.assert_allclose(
        np.asarray(acquire.expected_squared_mean(fast, opts, grid)),
        np.asarray(acquire.expected_squared_mean(full, opts, grid)),
        rtol=1e-8,
    )


def test_incremental_fallback_out_of_range():
    """A point extending the observed range moves every candidate position —
    the fast path must defer to the full refit (identical state)."""
    bq = tu.make_bq()
    st, opts = bq.state, bq.options
    x_a, l_a = jnp.asarray([3.1]), float(tu.f_l(3.1))
    fast = add_observation_fast(st, opts, x_a, l_a)
    full = acquire.add_observation(st, opts, x_a, l_a)
    # Range extended: candidate grid re-spans the new range in both.
    assert float(np.max(np.asarray(full.x_c))) > 2.3
    # Same refit code in both branches; tolerance absorbs jit-context
    # reassociation (cond-wrapped vs standalone program).
    _assert_states_close(fast, full)


def test_incremental_fallback_near_duplicate_location():
    """A near-duplicate x collapses the bordered Schur complement below the
    √eps·κ guard → full-refit fallback. (Comparison tolerances are loose:
    the Gram is deliberately conditioned at ~1e9, so even two runs of the
    same refit differ at the ~1e-7 level.)"""
    bq = tu.make_bq()
    st, opts = bq.state, bq.options
    x_dup = float(np.asarray(bq.x_s)[4, 0]) + 2e-5
    x_a = jnp.asarray([x_dup])
    l_a = float(tu.f_l(x_dup))
    fast = add_observation_fast(st, opts, x_a, l_a)
    full = acquire.add_observation(st, opts, x_a, l_a)
    _assert_states_close(fast, full, rtol=1e-4, atol=1e-7)
    assert np.all(np.isfinite(np.asarray(fast.gp_l.alpha)))


def test_incremental_refresh_cadence_forces_full():
    """ns hitting the refresh cadence routes through the full-refit branch.

    The fast path is exact, so the branch choice is invisible in the output
    values; instead the fallback (``_fit_gps``) is wrapped with a sentinel
    that stamps ``gamma`` — under ``lax.cond`` both branches trace, but only
    the selected branch's value comes out, so the stamp appears iff the full
    branch actually executed."""
    from tpubq.models import incremental as incm

    bq = tu.make_bq()  # ns = 10
    st, opts = bq.state, bq.options
    x_a, l_a = jnp.asarray([0.55]), float(tu.f_l(0.55))

    real_fit = incm._fit_gps
    SENTINEL = 123.0

    def stamped(state, o, ladder=True):
        out = real_fit(state, o, ladder)
        return out._replace(gamma=out.gamma + SENTINEL)

    incm._fit_gps = stamped
    try:
        on_cadence = add_observation_fast(st, opts, x_a, l_a, refresh_every=11)
        off_cadence = add_observation_fast(st, opts, x_a, l_a, refresh_every=16)
    finally:
        incm._fit_gps = real_fit
    assert float(on_cadence.gamma) > SENTINEL  # 11 % 11 == 0 → full refit ran
    assert float(off_cadence.gamma) < SENTINEL  # fast path selected
    # and the (unstamped) full-cadence state matches the reference transition
    fast = add_observation_fast(st, opts, x_a, l_a, refresh_every=11)
    full = acquire.add_observation(st, opts, x_a, l_a)
    _assert_states_close(fast, full)


def test_incremental_2d_matches_full_refit():
    """d=2: sup-norm candidate filtering + Halton candidate positions."""
    rng = np.random.default_rng(3)
    opts = BQOptions(n_candidate=14, candidate_thresh=0.25, max_obs=16, dim=2)
    x = rng.uniform(-2.0, 2.0, size=(9, 2))
    l = np.exp(-0.5 * np.sum(x**2, axis=1) / 0.8)
    st = bqm.init_state(
        x, l, opts, params_tl=(0.7, 0.9, 0.8), params_l=(0.4, 0.5, 0.45),
        x_mean=[0.0, 0.0], x_var=np.eye(2),
    )
    x_a = jnp.asarray([0.31, -0.42])  # interior of the bounding box
    l_a = float(np.exp(-0.5 * (0.31**2 + 0.42**2) / 0.8))
    fast = add_observation_fast(st, opts, x_a, l_a)
    full = acquire.add_observation(st, opts, x_a, l_a)
    _assert_states_close(fast, full)


def test_incremental_loop_matches_full_loop():
    """run_active_loop(incremental=True) tracks the full-refit loop."""
    bq = tu.make_bq(max_obs=32)
    grid = jnp.asarray(np.linspace(-4, 4, 81))[:, None]

    def loglik(x):
        s2 = tu.SIG_L**2
        return jnp.exp(-0.5 * (x[0] - tu.MU_L) ** 2 / s2) / jnp.sqrt(2 * jnp.pi * s2)

    st_inc, (xs_i, zm_i, zv_i) = acquire.run_active_loop(
        bq.state, bq.options, loglik, grid, 6, incremental=True
    )
    st_full, (xs_f, zm_f, zv_f) = acquire.run_active_loop(
        bq.state, bq.options, loglik, grid, 6, incremental=False
    )
    np.testing.assert_allclose(np.asarray(xs_i), np.asarray(xs_f), atol=1e-12)
    np.testing.assert_allclose(np.asarray(zm_i), np.asarray(zm_f), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(zv_i), np.asarray(zv_f), rtol=1e-6, atol=1e-14)
    assert int(st_inc.ns) == int(st_full.ns) == bq.ns + 6


def test_refresh_every_validated():
    """refresh_every < 1 must raise at trace time, not trace a mod-by-zero
    (ADVICE r2)."""
    import pytest

    from tpubq.models.incremental import add_observation_fast

    bq = tu.make_bq()
    with pytest.raises(ValueError, match="refresh_every"):
        add_observation_fast(bq.state, bq.options, np.array([0.33]), 0.5,
                             refresh_every=0)
    with pytest.raises(ValueError, match="refresh_every"):
        add_observation_fast(bq.state, bq.options, np.array([0.33]), 0.5,
                             refresh_every=-3)


def test_incremental_auto_window():
    """``incremental="auto"`` resolves via the measured v5e win window
    (VERDICT r2 #4 — wins pinned at max_obs 128/192, losses at 96/256)."""
    from tpubq.models.incremental import INCREMENTAL_AUTO_WINDOW, incremental_auto

    lo, hi = INCREMENTAL_AUTO_WINDOW
    assert incremental_auto(128) and incremental_auto(192)
    assert not incremental_auto(96) and not incremental_auto(256)
    assert not incremental_auto(lo - 1) and incremental_auto(lo)
    assert incremental_auto(hi - 1) and not incremental_auto(hi)


def test_run_active_loop_auto_matches_forced_paths():
    """The default incremental="auto" must produce the same trajectory as
    whichever forced path it resolves to (both are exact in f64)."""
    import jax.numpy as jnp

    from tpubq.models import acquire
    from tpubq.models.incremental import incremental_auto

    for max_obs, expect_inc in ((32, False), (128, True)):
        bq = tu.make_bq(max_obs=max_obs)
        assert incremental_auto(max_obs) is expect_inc
        grid = jnp.asarray(np.linspace(-4, 4, 101), bq.state.x_s.dtype)[:, None]

        def loglik(x):
            s2 = tu.SIG_L**2
            return jnp.exp(-0.5 * (x[0] - tu.MU_L) ** 2 / s2) / jnp.sqrt(
                2 * jnp.pi * s2
            )

        st_a, (xs_a, zm_a, _zv_a) = acquire.run_active_loop(
            bq.state, bq.options, loglik, grid, 4
        )
        st_f, (xs_f, zm_f, _zv_f) = acquire.run_active_loop(
            bq.state, bq.options, loglik, grid, 4, incremental=expect_inc
        )
        np.testing.assert_allclose(np.asarray(xs_a), np.asarray(xs_f), atol=1e-12)
        np.testing.assert_allclose(np.asarray(zm_a), np.asarray(zm_f), rtol=1e-10)
        assert int(st_a.ns) == int(bq.ns) + 4
