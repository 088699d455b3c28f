"""Pallas TPU kernels vs the pure-XLA references (interpret mode on CPU; the
same tests run compiled when TPUBQ_TEST_TPU=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpubq.models import gp as gpm
from tpubq.ops import pallas_kernels as pk
from tpubq.ops.kernels import gaussian_K, get_kernel

RNG = np.random.RandomState(7)
KFN, _ = get_kernel("gaussian")


def test_gram_matches_xla():
    theta = jnp.asarray([1.3, 0.7], jnp.float32)
    x1 = jnp.asarray(RNG.randn(50, 1), jnp.float32)
    x2 = jnp.asarray(RNG.randn(300, 1), jnp.float32)
    G = pk.gaussian_gram(theta, x1, x2)
    G0 = gaussian_K(theta, x1, x2)
    np.testing.assert_allclose(np.asarray(G), np.asarray(G0), atol=1e-6)


def test_gram_multidim():
    theta = jnp.asarray([0.9, 0.5, 1.1, 0.8], jnp.float32)
    x1 = jnp.asarray(RNG.randn(20, 3), jnp.float32)
    x2 = jnp.asarray(RNG.randn(40, 3), jnp.float32)
    G = pk.gaussian_gram(theta, x1, x2)
    G0 = gaussian_K(theta, x1, x2)
    np.testing.assert_allclose(np.asarray(G), np.asarray(G0), atol=1e-6)


def test_cholesky_batched_matches_lapack():
    B, N = 9, 21
    Ks = []
    for _ in range(B):
        A = RNG.randn(N, N)
        Ks.append(A @ A.T + N * np.eye(N))
    Ks = jnp.asarray(np.stack(Ks), jnp.float32)
    Ls = np.asarray(pk.cholesky_batched(Ks))
    want = np.linalg.cholesky(np.asarray(Ks, np.float64))
    np.testing.assert_allclose(Ls, want, atol=5e-5)
    # strictly lower-triangular factor
    assert np.allclose(Ls, np.tril(Ls))


def test_mll_grad_matches_autodiff():
    n = 11
    x = jnp.asarray(np.sort(RNG.randn(n))[:, None], jnp.float32)
    y = jnp.asarray(np.sin(2 * np.asarray(x[:, 0])) + 0.05 * RNG.randn(n), jnp.float32)
    mask = jnp.ones(n, bool)
    thetas = jnp.asarray([[1.2, 0.8], [0.5, 1.5], [2.0, 0.3]], jnp.float32)
    mll, grad = pk.mll_grad_batched(thetas, 0.1, x, y, mask, jitter=0.0)
    x64 = jnp.asarray(x, jnp.float64)
    y64 = jnp.asarray(y, jnp.float64)
    for i, th in enumerate(np.asarray(thetas, np.float64)):
        m0 = float(gpm.log_mll(KFN, jnp.asarray(th), 0.1, x64, y64, mask, 0.0))
        g0 = np.asarray(gpm.dlog_mll(KFN, jnp.asarray(th), 0.1, x64, y64, mask, 0.0))
        np.testing.assert_allclose(float(mll[i]), m0, rtol=5e-4)
        np.testing.assert_allclose(np.asarray(grad[i]), g0, rtol=5e-3, atol=1e-3)


def test_mll_grad_masked_pad_invariance():
    n, pad = 9, 5
    x = np.sort(RNG.randn(n))
    y = np.cos(x)
    xp = jnp.asarray(np.concatenate([x, RNG.randn(pad)])[:, None], jnp.float32)
    yp = jnp.asarray(np.concatenate([y, RNG.randn(pad)]), jnp.float32)
    mask = jnp.asarray(np.arange(n + pad) < n)
    thetas = jnp.asarray([[1.0, 0.7]], jnp.float32)
    mll_p, grad_p = pk.mll_grad_batched(thetas, 0.05, xp, yp, mask, jitter=0.0)
    mll_u, grad_u = pk.mll_grad_batched(
        thetas, 0.05, jnp.asarray(x[:, None], jnp.float32), jnp.asarray(y, jnp.float32),
        jnp.ones(n, bool), jitter=0.0,
    )
    np.testing.assert_allclose(float(mll_p[0]), float(mll_u[0]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(grad_p), np.asarray(grad_u), rtol=1e-4)


def test_fused_fit_improves_mll():
    from tpubq.models import fit as fitm

    rng = np.random.RandomState(3)
    x = np.sort(rng.uniform(-3, 3, 14))[:, None]
    h_true, w_true, s = 1.5, 0.7, 0.05
    K = h_true**2 * np.exp(-0.5 * (x - x.T) ** 2 / w_true**2) + s**2 * np.eye(14)
    y = np.linalg.cholesky(K) @ rng.randn(14)
    xj = jnp.asarray(x, jnp.float32)
    yj = jnp.asarray(y, jnp.float32)
    mask = jnp.ones(14, bool)
    theta0 = jnp.asarray([0.3, 2.5], jnp.float32)
    mll0, _ = pk.mll_grad_batched(theta0[None], s, xj, yj, mask)
    theta, mll = fitm.fit_params_fused(theta0, s, xj, yj, mask, jax.random.PRNGKey(0))
    assert float(mll) > float(mll0[0])
    assert np.all(np.asarray(theta) > 0)
    assert 0.2 < float(theta[1]) < 2.5


def test_esm_fused_matches_xla_path():
    """The fully fused Pallas scorer reproduces the batched-XLA ESM."""
    import numpy as np
    from scipy import stats

    import tpubq
    from tpubq.models import acquire

    x = np.linspace(-2.2, 2.2, 10)
    l = stats.norm.pdf(x, 0.2, 0.5)
    bq = tpubq.BQ(x, l, n_candidate=12, candidate_thresh=0.2, x_mean=0.0,
                  x_var=1.0, dtype="float32")
    bq.init(params_tl=(0.7, 0.8), params_l=(0.3, 0.4))
    grid = np.linspace(-4, 4, 777).astype(np.float32)
    ref = np.asarray(acquire.expected_squared_mean(bq.state, bq.options, grid))
    fused = np.asarray(
        acquire.expected_squared_mean_fused(bq.state, bq.options, grid)
    )
    np.testing.assert_allclose(fused, ref, rtol=2e-5)
    # degenerate (duplicate) candidates short-circuit identically
    dup = np.asarray(bq.x_s[:3, 0], np.float32)
    fd = np.asarray(acquire.expected_squared_mean_fused(bq.state, bq.options, dup))
    np.testing.assert_allclose(fd, bq.Z_mean() ** 2, rtol=1e-5)


def test_cholesky_blocked_matches_lapack():
    rng = np.random.RandomState(1)
    for N in (100, 300):
        A = rng.randn(N, N)
        K = (A @ A.T + N * np.eye(N)).astype(np.float32)
        L = np.asarray(pk.cholesky_blocked(jnp.asarray(K)))
        want = np.linalg.cholesky(K.astype(np.float64))
        np.testing.assert_allclose(L, want, rtol=2e-5, atol=2e-4)
        assert np.allclose(L, np.tril(L))


def test_tri_solve_blocked_matches_scipy():
    rng = np.random.RandomState(2)
    N, M = 200, 33
    A = rng.randn(N, N)
    K = (A @ A.T + N * np.eye(N)).astype(np.float32)
    L = np.linalg.cholesky(K.astype(np.float64)).astype(np.float32)
    R = rng.randn(N, M).astype(np.float32)
    X = np.asarray(pk.tri_solve_blocked(jnp.asarray(L), jnp.asarray(R)))
    want = np.linalg.solve(L.astype(np.float64), R)
    np.testing.assert_allclose(X, want, rtol=2e-4, atol=2e-4)


def test_esm_fused_matches_xla_path_2d_f32():
    """VERDICT r1 #8: the fused scorer generalizes to d <= 3 — d = 2 parity
    against the batched-XLA ESM, including the sup-norm degenerate guard."""
    import numpy as np
    from scipy import stats

    import tpubq
    from tpubq.models import acquire

    rng = np.random.RandomState(0)
    g = np.linspace(-1.8, 1.8, 4)
    X = np.stack(np.meshgrid(g, g), -1).reshape(-1, 2)
    X = np.concatenate([X, rng.uniform(-2, 2, (8, 2))], axis=0)
    L = stats.multivariate_normal.pdf(X, [0.2, -0.1], np.diag([0.3, 0.5]))
    bq = tpubq.BQ(X, L, dim=2, n_candidate=6, candidate_thresh=0.25,
                  x_mean=np.zeros(2), x_var=np.eye(2), max_obs=32,
                  dtype="float32")
    bq.init(params_tl=(0.5, 0.9, 0.9), params_l=(0.2, 0.5, 0.5))
    gg = np.stack(
        np.meshgrid(np.linspace(-2.5, 2.5, 23), np.linspace(-2.5, 2.5, 17)), -1
    ).reshape(-1, 2).astype(np.float32)
    ref = np.asarray(acquire.expected_squared_mean(bq.state, bq.options, gg))
    fused = np.asarray(
        acquire.expected_squared_mean_fused(bq.state, bq.options, gg)
    )
    np.testing.assert_allclose(fused, ref, rtol=3e-4, atol=1e-9)
    # degenerate (duplicate) points short-circuit to Z_mean^2
    dup = np.asarray(bq.x_s[:3], np.float32)
    fd = np.asarray(acquire.expected_squared_mean_fused(bq.state, bq.options, dup))
    np.testing.assert_allclose(fd, bq.Z_mean() ** 2, rtol=1e-4)


def test_cholesky_batch_major_matches_reference():
    """Batch-major (lanes = batch) Cholesky vs numpy, incl. non-multiple
    shapes that exercise sublane and lane padding."""
    from tpubq.ops.pallas_kernels import cholesky_batch_major

    rng = np.random.RandomState(7)
    for B, N in [(5, 6), (9, 26), (3, 33)]:
        A = rng.randn(B, N, N)
        Ks = (A @ np.transpose(A, (0, 2, 1)) + N * np.eye(N)).astype(np.float32)
        L = np.asarray(cholesky_batch_major(jnp.asarray(Ks)))
        ref = np.linalg.cholesky(Ks.astype(np.float64))
        np.testing.assert_allclose(L, ref, rtol=2e-4, atol=5e-5)
        # strictly lower triangular + exact zeros above
        assert np.all(np.triu(L, 1) == 0.0)


def test_cholesky_batch_major_pad_convention_and_nan_isolation():
    """Identity-padded (pad_gram) rows factor to identity; a non-PD matrix
    NaN-poisons only its own batch entry (the jitter ladder's contract)."""
    from tpubq.ops.pallas_kernels import cholesky_batch_major

    rng = np.random.RandomState(3)
    K = np.zeros((4, 9, 9), np.float32)
    for b in range(4):
        A = rng.randn(6, 6)
        K[b, :6, :6] = A @ A.T + 6 * np.eye(6)
        K[b, 6:, 6:] = np.eye(3)
    K[1, :6, :6] = -np.eye(6)  # non-PD lane
    L = np.asarray(cholesky_batch_major(jnp.asarray(K)))
    for b in (0, 2, 3):
        np.testing.assert_allclose(
            L[b], np.linalg.cholesky(K[b].astype(np.float64)), rtol=2e-4, atol=5e-5
        )
        np.testing.assert_allclose(L[b][6:, 6:], np.eye(3), atol=1e-6)
    assert np.any(~np.isfinite(L[1]))


def test_cholesky_batch_major_large_n_fallback():
    """N beyond the VMEM budget routes to jnp.linalg.cholesky (exact)."""
    from tpubq.ops.pallas_kernels import bm_supported, cholesky_batch_major

    assert not bm_supported(140)
    rng = np.random.RandomState(1)
    A = rng.randn(2, 140, 140)
    Ks = (A @ np.transpose(A, (0, 2, 1)) + 140 * np.eye(140)).astype(np.float32)
    L = np.asarray(cholesky_batch_major(jnp.asarray(Ks)))
    np.testing.assert_allclose(
        L, np.linalg.cholesky(np.asarray(Ks, np.float64)), rtol=2e-4, atol=2e-4
    )


def test_posdef_cholesky_vmap_matches_per_matrix():
    """The custom_vmap rule (→ batch-major kernel on TPU, XLA elsewhere)
    must be transparent: vmapped results equal the per-matrix factor."""
    from tpubq.ops import linalg

    rng = np.random.RandomState(11)
    B, N = 16, 20
    A = rng.randn(B, N, N)
    Ks = jnp.asarray(A @ np.transpose(A, (0, 2, 1)) + N * np.eye(N), jnp.float32)
    masks = jnp.ones((B, N), bool)
    Ls, js, oks = jax.jit(
        jax.vmap(lambda K, m: linalg.jitter_cholesky(K, m, 1e-6))
    )(Ks, masks)
    assert bool(jnp.all(oks))
    for b in range(0, B, 5):
        L1, j1, ok1 = linalg.jitter_cholesky(Ks[b], masks[b], 1e-6)
        np.testing.assert_allclose(np.asarray(Ls[b]), np.asarray(L1), rtol=2e-4, atol=5e-5)


def test_cholesky_batch_major_nested_vmap():
    """A second vmap level maps the kernel over an extra grid dimension
    (jax's pallas batching rule) — the path a vmapped fleet-of-marginalize
    composition would take."""
    from tpubq.ops.pallas_kernels import cholesky_batch_major

    rng = np.random.RandomState(0)
    A = rng.randn(3, 5, 12, 12)
    Ks = jnp.asarray(
        A @ np.swapaxes(A, -1, -2) + 12 * np.eye(12), jnp.float32
    )
    L = jax.vmap(cholesky_batch_major)(Ks)
    ref = np.linalg.cholesky(np.asarray(Ks, np.float64))
    np.testing.assert_allclose(np.asarray(L), ref, rtol=2e-4, atol=5e-5)


def test_bm_supported_budget_is_batch_aware():
    from tpubq.ops.pallas_kernels import bm_supported

    assert bm_supported(76, 64)        # single 128-lane tile: 3 buffers
    assert not bm_supported(76, 256)   # multi-step grid double-buffers
    assert not bm_supported(140, 8)
    assert bm_supported(26, 4096)


def test_esm_fleet_f32_matches_vmapped_xla_path():
    """The block-packed fleet scorer (esm_fleet_l/tl + XLA combine) must
    equal the vmapped single-problem ESM on a shared grid (VERDICT r2 #1).
    Covers B not divisible by the packing factor and d=1."""
    import numpy as np
    from scipy import stats

    from tpubq.models import acquire, batched
    from tpubq.utils.options import BQOptions

    opts = BQOptions(n_candidate=12, candidate_thresh=0.2, max_obs=16,
                     dtype="float32")
    assert batched.fleet_scorer_supported(opts)
    B = 6  # not a multiple of P_l=4 or P_t=8 — exercises problem padding
    rng = np.random.RandomState(3)
    xs = np.stack([np.linspace(-2.2, 2.2, 10) + 0.05 * rng.standard_normal(10)
                   for _ in range(B)])
    mus = rng.uniform(-0.5, 0.5, B)
    ls = np.stack([stats.norm.pdf(xs[i], mus[i], 0.5) for i in range(B)])
    # per-problem hypers to exercise the per-row packing
    theta_l = np.stack([[0.3 + 0.02 * b, 0.4 + 0.03 * b] for b in range(B)])
    theta_tl = np.stack([[0.7 + 0.01 * b, 0.8 - 0.02 * b] for b in range(B)])
    states = batched.init_batch(xs, ls, opts, params_tl=theta_tl,
                                params_l=theta_l)
    grid = np.linspace(-4, 4, 300, dtype=np.float32)[:, None]

    ref = np.asarray(jax.vmap(acquire.expected_squared_mean, (0, None, None))(
        states, opts, jnp.asarray(grid)
    ))
    out = np.asarray(batched.expected_squared_mean_fleet(
        states, opts, jnp.asarray(grid), interpret=True, tile=256
    ))
    assert out.shape == ref.shape == (B, 300)
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-12)
    # The fleet scorer's adaptive degenerate guard short-circuits points
    # whose Schur complement is below its bf16x3 dot's roundoff (condition-
    # aware bound) — a slightly wider band than the vmap f32 path's eps·κ
    # guard, so near-degenerate points differ by the (small) esm−Z_mean²
    # gap there; everywhere else the paths agree to the bf16x3 floor.
    assert np.quantile(rel, 0.95) < 2e-4, np.quantile(rel, 0.95)
    assert np.quantile(rel, 0.99) < 2e-3, np.quantile(rel, 0.99)
    assert rel.max() < 1e-2, rel.max()

    # truth anchor: the fleet scorer is as close to the f64 answer as the
    # vmapped f32 path is (no systematic bias from the packing). Pinned to
    # the host CPU device: f64 programs on the tunneled TPU silently
    # produce NaN (f64 correctness belongs on CPU — see conftest notes).
    opts64 = BQOptions(n_candidate=12, candidate_thresh=0.2, max_obs=16,
                       dtype="float64")
    with jax.default_device(jax.devices("cpu")[0]):
        states64 = batched.init_batch(xs, ls, opts64, params_tl=theta_tl,
                                      params_l=theta_l)
        ref64 = np.asarray(jax.vmap(acquire.expected_squared_mean, (0, None, None))(
            states64, opts64, jnp.asarray(grid, jnp.float64)
        ))
    err_fleet = np.abs(out - ref64) / (np.abs(ref64) + 1e-12)
    err_vmap = np.abs(ref - ref64) / (np.abs(ref64) + 1e-12)
    assert err_fleet.max() < max(2.0 * err_vmap.max(), 1e-4), (
        err_fleet.max(), err_vmap.max()
    )


def test_esm_fleet_2d_matches_vmapped_xla_path():
    """Fleet scorer parity in d=2 (exercises the ζ quad form and the
    multi-dim row packing)."""
    import numpy as np
    from scipy import stats

    from tpubq.models import acquire, batched
    from tpubq.utils.options import BQOptions

    opts = BQOptions(n_candidate=8, candidate_thresh=0.25, max_obs=16,
                     dim=2, dtype="float32")
    assert batched.fleet_scorer_supported(opts)
    B = 4
    rng = np.random.RandomState(7)
    xs = rng.uniform(-2, 2, (B, 9, 2))
    ls = np.stack([
        stats.multivariate_normal.pdf(xs[b], 0.1 * b * np.ones(2),
                                      np.eye(2) * 0.5)
        for b in range(B)
    ])
    states = batched.init_batch(xs, ls, opts, params_tl=(0.7, 0.8, 0.9),
                                params_l=(0.3, 0.5, 0.6))
    g1 = np.linspace(-3, 3, 18)
    grid = np.stack(np.meshgrid(g1, g1), axis=-1).reshape(-1, 2)

    ref = np.asarray(jax.vmap(acquire.expected_squared_mean, (0, None, None))(
        states, opts, jnp.asarray(grid, jnp.float32)
    ))
    out = np.asarray(batched.expected_squared_mean_fleet(
        states, opts, jnp.asarray(grid, jnp.float32), interpret=True, tile=128
    ))
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-12)
    assert np.quantile(rel, 0.99) < 5e-4, np.quantile(rel, 0.99)
    # isolated adaptive-guard boundary points sit at the esm−Z_mean² band
    # bias (a few %); see the 1-D test for the contract discussion
    assert rel.max() < 5e-2, rel.max()


@pytest.mark.parametrize("max_obs,n_candidate,B", [
    (48, 14, 5),    # nsc pads to NPB=64 -> P_l=2 per block
    (112, 14, 3),   # nsc pads to NPB=128 -> P_l=1 (degenerate packing)
])
def test_esm_fleet_geometry_boundaries_f32(max_obs, n_candidate, B):
    """Fleet scorer packing correctness at the big-block geometries: P=2
    and the P=1 single-problem-per-block edge (the 1-D/2-D tests cover
    P=4/P=8). The packing math (_pack_rows/_pack_blockdiag, segment
    reductions) is geometry-dependent, so every reachable (NPB, P) needs a
    pin — but these geometries are NOT auto-dispatched
    (fleet_scorer_supported caps at P >= 4): the bf16x3 dot error grows
    with per-problem row count and by NPB=64 is ~30x the vmapped f32
    path's distance from f64 truth. Tolerances here reflect that measured
    noise model; the explicit-call path stays available and correct."""
    import numpy as np
    from scipy import stats

    from tpubq.models import acquire, batched
    from tpubq.ops.pallas_kernels import fleet_block_geometry
    from tpubq.utils.options import BQOptions

    opts = BQOptions(n_candidate=n_candidate, candidate_thresh=0.12,
                     max_obs=max_obs, dtype="float32")
    assert not batched.fleet_scorer_supported(opts)  # precision boundary
    npb_l, p_l = fleet_block_geometry(opts.max_nsc)
    assert p_l in (1, 2)

    # Wide domain + observation noise keep the dense live set conditioned
    # in f32: a smooth-kernel Gram over 42-106 near-capacity points is
    # otherwise numerically singular at f32 (measured: s=0 on [-2.2, 2.2]
    # makes even the plain vmapped f32 scorer ~27% off the f64 truth, with
    # the packed path tracking it to 4e-4 — equal wrongness is parity of a
    # sort, but a meaningless testbed; notably the packed path's ADAPTIVE
    # guard capped its worst-point error at 3.4e-2 where the vmapped eps·κ
    # guard let a 9.0 blowup through).
    rng = np.random.RandomState(11)
    n_obs = max_obs - 6  # live set near capacity: rows fill the block
    half = 0.09 * n_obs
    xs = np.stack([np.sort(rng.uniform(-half, half, n_obs)) for _ in range(B)])
    mus = rng.uniform(-0.5, 0.5, B)
    ls = np.stack([stats.norm.pdf(xs[b], mus[b], 1.0) + 1e-3 for b in range(B)])
    states = batched.init_batch(xs, ls, opts, params_tl=(0.7, 0.8),
                                params_l=(0.3, 0.4), s_tl=0.01, s_l=0.01,
                                x_means=np.zeros(1), x_vars=4.0 * np.ones(1))
    grid = np.linspace(-half - 1, half + 1, 257, dtype=np.float32)[:, None]

    ref = np.asarray(jax.vmap(acquire.expected_squared_mean, (0, None, None))(
        states, opts, jnp.asarray(grid)
    ))
    out = np.asarray(batched.expected_squared_mean_fleet(
        states, opts, jnp.asarray(grid), interpret=True, tile=128
    ))
    assert out.shape == ref.shape == (B, 257)
    rel = np.abs(out - ref) / (np.abs(ref).max(axis=1, keepdims=True) + 1e-30)
    assert np.quantile(rel, 0.95) < 5e-3, np.quantile(rel, 0.95)
    assert rel.max() < 5e-2, rel.max()
