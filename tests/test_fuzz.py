"""End-to-end property fuzz: randomized problems, model-level invariants.

Complements the exact-vs-twin and oracle tests (which pin VALUES on fixed
data) by sweeping random problem geometries and asserting properties that
must hold for ANY valid input. Calibration notes (learned writing this):
Z_mean > 0 is NOT an invariant of the linearized model under arbitrary
hypers (a mis-scaled log-GP can pull the linear GP's posterior mean
negative over most of the measure — the reference behaves identically),
so positivity is asserted only under data-scaled hypers; V[Z] per-step
monotonicity is likewise approximate (the transport weight m_l + gamma
refits with every observation), so the contraction check allows slack.
Shapes are fixed per config so all seeds share one compile.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpubq.models import acquire, bq as bqm
from tpubq.utils.options import BQOptions

# ~1.5-2 min/worst-case test (randomized sweeps, one compile per config):
# the biggest single block of suite wall time. CI's fast gate deselects it
# (`make test`); `make test-all` and the nightly/slow job keep full coverage.
pytestmark = pytest.mark.slow

# gaussian exercises the gaussian closed forms; 1-D matern the erfcx
# closed form (integrals._int_K_matern_1d) + the exact mixture V[Z]
# (integrals.int_*_matern, round 4); 2-D matern the Gamma-mixture
# z/zeta route (integrals.int_K_matern_mixture) + the fused-mixture
# exact V[Z]; 1-D periodic the Jacobi–Anger harmonic closed forms
# (integrals.int_*_periodic, round 4 — periods randomized per seed,
# including sub-lengthscale ones); rq the in-trace Gamma-mixture
# z/zeta route (integrals.int_K_rq_mixture, round 5 — α randomized per
# seed across the validated [0.5, 128] envelope) + the GH V[Z] rule its
# rq_gh_floor governs; the d > 2 paths (QMC etc.) are pinned by
# dedicated tests elsewhere.
CONFIGS = [(1, "gaussian"), (2, "gaussian"), (1, "matern52"), (2, "matern52"),
           (1, "matern32"), (1, "periodic"), (1, "rq"), (2, "rq")]
SEEDS = [0, 1, 2]


def _random_problem(d, seed, n=12):
    """Random problem with a SPACING-RESPECTING design (min pairwise
    sup-distance ~0.25). Unconstrained uniform x draws contain near-
    coincident pairs (spacing ≪ lengthscale) that make the zero-noise
    linear GP an ill-conditioned exact interpolant whose extrapolation
    rings hard (observed: m_l(−2) ≈ −14 on an l ≤ 1.2 dataset → Z_mean
    −0.52 vs truth +0.57, with the dense-trapezoid twin CONFIRMING the
    closed form — it is the model, not the code; the reference's own
    active loop never produces such designs because candidate_thresh
    enforces spacing). The fuzz therefore generates designs the model is
    specified for; the conditioning pathology itself is covered by the
    jitter-ladder and health-check tests."""
    rng = np.random.RandomState(seed)
    lo, hi = -2.0 - rng.rand(), 2.0 + rng.rand()
    while True:
        x = rng.uniform(lo, hi, (n, d))
        dist = np.abs(x[:, None, :] - x[None, :, :]).max(-1)
        np.fill_diagonal(dist, np.inf)
        if dist.min() >= 0.25:
            break
    # the density is returned too so active-loop tests can observe the SAME
    # function the init data came from (contradictory observations
    # legitimately inflate the posterior variance)
    # positive integrand: mixture of two gaussian bumps
    c1, c2 = rng.uniform(-1, 1, (2, d))
    s1, s2 = 0.3 + rng.rand(2) * 0.5
    def density(pts):
        pts = np.asarray(pts).reshape(-1, d)
        return (np.exp(-0.5 * np.sum((pts - c1) ** 2, -1) / s1**2)
                + 0.7 * np.exp(-0.5 * np.sum((pts - c2) ** 2, -1) / s2**2)
                ) + 1e-6

    l = density(x)
    # data-scaled hypers: lengthscales ~ bump widths, h ~ signal scale
    params_tl = (float(np.exp(rng.uniform(-0.3, 0.3))),) + tuple(
        0.7 + 0.3 * rng.rand(d))
    params_l = (float(0.3 * np.exp(rng.uniform(-0.3, 0.3))),) + tuple(
        0.5 + 0.3 * rng.rand(d))
    return x, l, params_tl, params_l, density


@pytest.mark.parametrize("d,kernel", CONFIGS)
def test_fuzz_invariants(d, kernel):
    opts = BQOptions(dim=d, kernel=kernel, n_candidate=8,
                     candidate_thresh=0.3, max_obs=24)
    for seed in SEEDS:
        x, l, params_tl, params_l, _dens = _random_problem(d, seed)
        if kernel == "periodic":
            # randomized DATA-SCALED periods (≥ the integrand's bump
            # width): a period much shorter than the data scale forces the
            # posterior to alias and rings Z_mean negative — confirmed the
            # MODEL, not the integrals (closed form ≡ dense twin to 1e-9
            # at p = 0.6 where Z_mean = −12.2), same class as the
            # calibration note above. Sub-lengthscale-period EXACTNESS is
            # pinned by tests/test_periodic_exact.py.
            p = (2.8, 2.0, 3.5)[seed % 3]
            params_tl = params_tl + (p,)
            params_l = params_l + (p,)
        if kernel == "rq":
            # randomized shape α across the validated mixture envelope
            # (bq.RQ_ALPHA_FLOOR = 0.5 up to heavy-α near-gaussian)
            a = (0.6, 2.0, 24.0)[seed % 3]
            params_tl = params_tl + (a,)
            params_l = params_l + (a * 1.5,)
        state = bqm.init_state(x, l, opts, params_tl=params_tl,
                               params_l=params_l)
        zm = float(bqm.Z_mean(state, opts))
        zv = float(bqm.Z_var(state, opts))
        # finite moments; V[Z] >= 0 (the clamp contract); positivity holds
        # at data-scaled hypers
        assert np.isfinite(zm), (kernel, d, seed)
        assert np.isfinite(zv) and zv >= 0.0, (kernel, d, seed)
        assert zm > 0.0, (kernel, d, seed, zm)

        if d == 1:
            # exact == dense-trapezoid twin of the SAME posterior (holds for
            # any hypers; pins the closed-form/quadrature integral algebra)
            xo = np.linspace(-6, 6, 4001)
            zm_twin = float(bqm.approx_Z_mean(state, opts, xo))
            assert abs(zm - zm_twin) <= 1e-4 * max(abs(zm), 1e-12), (
                kernel, d, seed, zm, zm_twin)

        # ESM = E[Z'^2] >= 0 everywhere. The Jensen floor ESM >= Z_mean^2
        # holds only against the POST-hypothetical expectation E[Z'] —
        # at points far from the data the log-GP posterior variance c_a is
        # large and the lognormal mean exp(m_a + c_a/2) shifts E[Z'] well
        # off the old Z_mean (measured: 7% below Z_mean^2 at 1.4 box units
        # from the data; model-consistent, the reference shares it) — so
        # the floor is asserted only NEAR observations, where c_a → s and
        # the shift vanishes. The 1% slack covers re-linearization drift.
        rng = np.random.RandomState(100 + seed)
        grid = jnp.asarray(rng.uniform(-3, 3, (64, d)))
        esm = np.asarray(acquire.expected_squared_mean(state, opts, grid))
        assert np.all(np.isfinite(esm)), (kernel, d, seed)
        assert np.all(esm >= -1e-12), (kernel, d, seed, float(esm.min()))
        if d == 1:
            # in d >= 2 even points 0.5 from an observation keep c_a ~ h²/2
            # (the sup-ball is a thin shell of the volume) and the shift
            # reappears at the -3% level, so the near-floor is 1-D only;
            # the d >= 2 floor is pinned exactly at observed points below.
            d_to_data = np.abs(
                np.asarray(grid)[:, None, :] - x[None, :, :]
            ).max(axis=2).min(axis=1)
            # the "near" radius is where the family's correlation keeps
            # c_a ≈ s: 0.5 for gaussian/matern at the fuzz hypers; the
            # periodic kernel decorrelates faster (measured: −4.7% shift
            # at 0.5 box units with p = 2.0, exactly the comment's
            # far-field mechanism; +0.0 at ≤ 0.25)
            near = d_to_data <= (0.25 if kernel == "periodic" else 0.5)
            if near.any():
                assert np.all(
                    esm[near] >= zm * zm - 1e-8 - 1e-2 * zm * zm
                ), (kernel, d, seed, float((esm[near] - zm * zm).min()))

        # degenerate short-circuit: ESM at an observed location is the
        # no-information limit Z_mean^2
        esm_obs = np.asarray(
            acquire.expected_squared_mean(state, opts, x[:1])
        )[0]
        assert abs(esm_obs - zm * zm) <= 1e-6 * max(zm * zm, 1e-12), (
            kernel, d, seed)

        # selection respects the spacing rule: the choice is a grid member
        # at least candidate_thresh (sup-norm) from every observation
        # whenever such points exist on the grid
        xn, scores = acquire.choose_next(state, opts, grid)
        xn = np.asarray(xn)
        assert np.isfinite(np.asarray(scores)).all()
        gd = np.abs(np.asarray(grid) - xn[None, :]).max(axis=1)
        assert gd.min() < 1e-12, "choice is not a grid member"
        d_obs = np.abs(x - xn[None, :]).max(axis=1).min()
        any_far = (
            np.abs(np.asarray(grid)[:, None, :] - x[None, :, :])
            .max(axis=2).min(axis=1) >= opts.candidate_thresh
        ).any()
        if any_far:
            assert d_obs >= opts.candidate_thresh, (kernel, d, seed, d_obs)


@pytest.mark.parametrize("d", [1, 2])
def test_fuzz_variance_contracts_under_observation(d):
    """Adding chosen observations contracts V[Z] net-of-slack (conditioning
    shrinks the GP posterior covariance; the refitted transport weight
    m_l + gamma keeps it from being exactly monotone per step)."""
    opts = BQOptions(dim=d, kernel="gaussian", n_candidate=8,
                     candidate_thresh=0.3, max_obs=24)
    for seed in SEEDS:
        x, l, params_tl, params_l, density = _random_problem(d, seed)
        state = bqm.init_state(x, l, opts, params_tl=params_tl,
                               params_l=params_l)
        rng = np.random.RandomState(200 + seed)
        grid = jnp.asarray(rng.uniform(-3, 3, (128, d)))

        def lik(xa):
            return float(density(xa)[0])

        v0 = v_prev = float(bqm.Z_var(state, opts))
        for _ in range(3):
            xn, _ = acquire.choose_next(state, opts, grid)
            state = acquire.add_observation(state, opts, xn, lik(xn))
            v = float(bqm.Z_var(state, opts))
            assert np.isfinite(v) and v >= 0.0
            # per-step slack, with an absolute band at 1% of the initial
            # variance: once V[Z] has contracted below that, bounces from
            # the refitted transport weight are in the noise (observed:
            # 6.5e-8 -> 6.9e-7 on a v0 ~ 1e-4 problem)
            assert v <= max(v_prev * 1.25, v0 * 0.01) + 1e-12, (
                d, seed, v0, v_prev, v)
            v_prev = v
        assert v_prev <= v0, (d, seed, v0, v_prev)  # net contraction

@pytest.mark.parametrize("d", [1, 2])
def test_fuzz_fleet_equals_singles(d):
    """B random problems through the fleet path == each problem through the
    single-problem path (moments, scores, and selection)."""
    from tpubq.models import batched

    opts = BQOptions(dim=d, kernel="gaussian", n_candidate=8,
                     candidate_thresh=0.3, max_obs=24)
    B = 4
    probs = [_random_problem(d, 300 + i) for i in range(B)]
    xs = np.stack([p[0] for p in probs])
    ls = np.stack([p[1] for p in probs])
    # shared hypers (init_batch broadcasts); per-problem hypers are pinned
    # by the fixed-data equality tests in test_batched.py
    ptl, pl_ = probs[0][2], probs[0][3]
    fleet = batched.init_batch(xs, ls, opts, params_tl=ptl, params_l=pl_)
    rng = np.random.RandomState(42)
    grid = jnp.asarray(rng.uniform(-3, 3, (64, d)))

    zm_b = np.asarray(batched.Z_mean_batch(fleet, opts))
    zv_b = np.asarray(batched.Z_var_batch(fleet, opts))
    esm_b = np.asarray(batched.expected_squared_mean_batch(fleet, opts, grid))
    xn_b, _ = batched.choose_next_batch(fleet, opts, grid)
    xn_b = np.asarray(xn_b)
    for i in range(B):
        st = bqm.init_state(xs[i], ls[i], opts, params_tl=ptl, params_l=pl_)
        zm = float(bqm.Z_mean(st, opts))
        zv = float(bqm.Z_var(st, opts))
        assert abs(zm_b[i] - zm) <= 1e-9 * max(abs(zm), 1.0), (d, i)
        # V[Z] is a near-total cancellation; vmapped vs single summation
        # order legitimately moves the residual at the 1e-3-relative level
        assert abs(zv_b[i] - zv) <= 1e-3 * max(abs(zv), 1e-12), (d, i)
        esm = np.asarray(acquire.expected_squared_mean(st, opts, grid))
        np.testing.assert_allclose(esm_b[i], esm, rtol=1e-9, atol=1e-12)
        xn, _ = acquire.choose_next(st, opts, grid)
        np.testing.assert_allclose(xn_b[i], np.asarray(xn), rtol=0, atol=0)
