"""Fleet API: many independent BQ problems in one dispatch.

No reference analogue (the reference is strictly one estimator per Python
object) — this is the TPU-native extension for production/serving: a batch
of ``BQState``s is one pytree with a leading batch axis on every leaf, and
every estimator operation is the ``vmap`` of the single-problem program. On
a mesh, shard the batch axis (``jax.NamedSharding`` on the leaves) and the
same functions scale across chips.

All problems in a batch share one ``BQOptions`` (static shapes); their data,
measures, γ, and hyperparameters vary freely.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpubq.models import acquire, bq as bqm
from tpubq.models.bq import BQState, _fit_gps
from tpubq.utils.options import BQOptions

__all__ = [
    "BQFleet",
    "init_batch",
    "Z_mean_batch",
    "Z_var_batch",
    "expected_squared_mean_batch",
    "expected_squared_mean_fleet",
    "expected_Z_var_batch",
    "fit_batch",
    "sample_hypers_batch",
    "marginalize_batch",
    "fleet_scorer_supported",
    "choose_next_batch",
    "add_observation_batch",
    "run_active_loop_batch",
]


def init_batch(
    xs,
    ls,
    opts: BQOptions,
    params_tl=None,
    params_l=None,
    s_tl=0.0,
    s_l=0.0,
    gamma=1.0,
    x_means=None,
    x_vars=None,
) -> BQState:
    """Build a batched BQState from (B, n) observations.

    ``xs``: (B, n) or (B, n, d); ``ls``: (B, n) positive. Per-problem
    measures via ``x_means`` (B, d) / ``x_vars`` (B, d, d) (defaults:
    standard normal). Hyperparameters may be shared (p,) or per-problem
    (B, p). Returns a BQState whose every leaf has a leading B axis.
    """
    dtype = opts.np_dtype
    xs = np.asarray(xs, dtype)
    if xs.ndim == 2:
        xs = xs[:, :, None]
    ls = np.asarray(ls, dtype)
    B, n, d = xs.shape
    if np.any(ls <= 0) or not np.all(np.isfinite(ls)):
        raise ValueError("l must be finite and positive")
    if n > opts.max_obs:
        raise ValueError(f"{n} observations exceed max_obs={opts.max_obs}")

    from tpubq.models.bq import default_params, validate_theta, validate_theta_values

    if params_tl is None:
        params_tl = default_params(opts)
    if params_l is None:
        params_l = default_params(opts)
    # validate the param width (last axis, whether shared (p,) or per-problem
    # (B, p)) and the values (here, on the concrete host arrays — init_state
    # below runs under vmap and can only shape-check tracers)
    for name, p in (("params_tl", params_tl), ("params_l", params_l)):
        validate_theta(np.zeros(np.asarray(p, dtype).shape[-1]), opts, name)
        validate_theta_values(p, opts, name)

    # measures broadcast like hyperparameters: scalar / (d,) / (d, d) are
    # shared across the fleet; (B, d) / (B, d, d) are per-problem
    if x_means is None:
        x_means = np.zeros((B, d), dtype)
    else:
        x_means = np.asarray(x_means, dtype)
        if x_means.ndim == 0:
            x_means = np.full((B, d), float(x_means), dtype)
        elif x_means.ndim == 1:
            # (d,) = shared mean; (B,) = per-problem scalar means (d == 1).
            # When B == d the shared reading wins (pass (B, 1) to be explicit).
            if x_means.shape[0] == d:
                if B == d and d > 1:
                    import warnings

                    warnings.warn(
                        f"x_means of shape ({d},) with B == d == {d} is read "
                        "as ONE shared d-dimensional mean; pass an explicit "
                        "(B, d) array for per-problem means",
                        stacklevel=2,
                    )
                x_means = np.broadcast_to(x_means, (B, d))
            elif d == 1 and x_means.shape[0] == B:
                x_means = x_means[:, None]
            else:
                raise ValueError(
                    f"x_means of shape {x_means.shape} matches neither (d,)="
                    f"({d},) shared nor (B,)=({B},) per-problem (d=1) form"
                )
    x_means = np.asarray(x_means, dtype).reshape(B, d)
    if x_vars is None:
        x_vars = np.tile(np.eye(d, dtype=dtype)[None], (B, 1, 1))
    else:
        x_vars = np.asarray(x_vars, dtype)
        if x_vars.ndim == 0:
            x_vars = np.eye(d, dtype=dtype) * x_vars
        elif x_vars.ndim == 1:
            # (d,) = shared diagonal; (B,) = per-problem variances (d == 1)
            if x_vars.shape[0] == d:
                if B == d and d > 1:
                    import warnings

                    warnings.warn(
                        f"x_vars of shape ({d},) with B == d == {d} is read "
                        "as ONE shared diagonal; pass an explicit (B, d, d) "
                        "array for per-problem variances",
                        stacklevel=2,
                    )
                x_vars = np.diag(x_vars.astype(dtype))
            elif d == 1 and x_vars.shape[0] == B:
                x_vars = x_vars[:, None, None]
            else:
                raise ValueError(
                    f"x_vars of shape {x_vars.shape} matches neither (d,)="
                    f"({d},) shared-diagonal nor (B,)=({B},) per-problem "
                    "(d=1) form"
                )
        if x_vars.ndim == 2:
            x_vars = np.broadcast_to(x_vars, (B, d, d))
    x_vars = np.asarray(x_vars, dtype).reshape(B, d, d)
    # init_state runs under vmap below and sees tracers, so the measure/
    # gamma validation happens here on the concrete batch instead.
    bqm.validate_measure(x_vars)
    if not np.isfinite(float(gamma)) or float(gamma) <= 0.0:
        raise ValueError(f"gamma must be finite and > 0, got {gamma}")

    def _per_problem(params):
        p = np.asarray(params, dtype)
        if p.ndim == 1:
            return np.broadcast_to(p, (B, p.shape[0])).copy()
        if p.shape[0] != B:
            raise ValueError(f"per-problem params must be (B, p); got {p.shape}")
        return p

    theta_tl = _per_problem(params_tl)
    theta_l = _per_problem(params_l)

    def one(x, l, ttl, tl_, mu, Sig):
        return bqm.init_state(
            x, l, opts, params_tl=ttl, params_l=tl_, s_tl=s_tl, s_l=s_l,
            gamma=gamma, x_mean=mu, x_var=Sig,
        )

    # init_state is pure given fixed shapes; vmap builds the whole fleet in
    # one compiled program.
    return jax.vmap(
        lambda x, l, a, b, mu, S: one(x, l, a, b, mu, S)
    )(jnp.asarray(xs), jnp.asarray(ls), jnp.asarray(theta_tl),
      jnp.asarray(theta_l), jnp.asarray(x_means), jnp.asarray(x_vars))


@partial(jax.jit, static_argnames=("opts",))
def Z_mean_batch(states: BQState, opts: BQOptions) -> jnp.ndarray:
    return jax.vmap(bqm.Z_mean, (0, None))(states, opts)


@partial(jax.jit, static_argnames=("opts",))
def Z_var_batch(states: BQState, opts: BQOptions) -> jnp.ndarray:
    return jax.vmap(bqm.Z_var, (0, None))(states, opts)


@partial(jax.jit, static_argnames=("opts", "per_problem", "fast"))
def expected_squared_mean_batch(
    states: BQState, opts: BQOptions, grids, per_problem: bool = False,
    fast: bool = False,
) -> jnp.ndarray:
    """(B, G) ESM scores.

    ``per_problem=False`` (default): one shared grid, (G,) or (G, d).
    ``per_problem=True``: a grid per problem, (B, G) or (B, G, d). Explicit
    rather than shape-inferred — a shared (G, d) grid with G == B would
    otherwise be silently misread as per-problem rows.

    Dispatch (VERDICT r2 #1, measured v5e): the shared-grid float32 TPU
    case routes through the block-packed fleet scorer
    (``expected_squared_mean_fleet``) — the plain vmap of the
    single-problem scorer materializes (B, nsc, G) intermediates in HBM
    and caps B=64 at ~1.8× the single-problem aggregate rate (522 µs per
    B=64 × 1e4 sweep); the packed path keeps the per-candidate pipeline in
    VMEM with full-tile MXU contractions. Everything else takes the vmap.
    """
    from tpubq.ops import pallas_kernels as pk

    grids = jnp.asarray(grids)
    if not per_problem and fleet_scorer_supported(opts) and pk.on_tpu():
        return expected_squared_mean_fleet(states, opts, grids, fast=fast)
    return jax.vmap(acquire.expected_squared_mean, (0, None, 0 if per_problem else None))(
        states, opts, grids
    )


#: Adaptive-guard noise multipliers (empirically validated on the v5e —
#: see PARITY.md fleet-scorer record): λ × Σ|K⁻¹||k| bounds the packed
#: dot's roundoff on the Schur complement.
_LAM_X3 = 4.0 * 2.0**-12
_LAM_FAST = 4.0 * 2.0**-8


def fleet_scorer_supported(opts: BQOptions) -> bool:
    """Whether the block-packed fleet ESM kernel is the AUTO-dispatched
    scorer for this config: float32 (the TPU serving dtype), gaussian
    kernel, d ≤ 3, and max_nsc ≤ 32 (P ≥ 4 problems per 128-row block).

    The row cap is a measured precision boundary, not a packing limit
    (``expected_squared_mean_fleet`` itself accepts any geometry up to 128
    rows/problem): the bf16x3 dot's error scales with Σ|K⁻¹||k| — i.e.
    with per-problem row count × Gram conditioning — and by NPB = 64 the
    packed scores sit ~30× further from the f64 truth than the vmapped
    f32 path (q95 1.1e-3 vs 3.8e-5, measured; tests/test_pallas.py
    geometry-boundary tests pin it). Packing also pays off less there: at
    P ≤ 2 the per-block contraction is mostly one problem anyway, which
    is the regime XLA already handles well."""
    from tpubq.ops.pallas_kernels import fleet_block_geometry

    geo = fleet_block_geometry(opts.max_nsc)
    return (
        opts.dtype == "float32"
        and opts.kernel == "gaussian"
        and opts.dim <= 3
        and geo is not None
        and geo[1] >= 4
        and fleet_block_geometry(opts.max_obs) is not None
    )


def _pack_rows(arr, B_pad, NB, P, NPB):
    """(B, n, ...) → (NB, P·NPB, ...): pad rows n→NPB and problems B→B_pad,
    then fold P problems per block (problem b = nb·P + p occupies rows
    p·NPB..(p+1)·NPB of block nb)."""
    B, n = arr.shape[:2]
    pad = [(0, B_pad - B), (0, NPB - n)] + [(0, 0)] * (arr.ndim - 2)
    a = jnp.pad(arr, pad)
    return a.reshape((NB, P * NPB) + arr.shape[2:])


def _pack_blockdiag(Ks, B_pad, NB, P, NPB):
    """(B, n, n) → (NB, P·NPB, P·NPB) block-diagonal packing (zero pads —
    the masked k rows of pads contribute nothing to the packed matmul).

    Built as a broadcast-multiply against an eye(P) mask, NOT an
    advanced-index scatter: XLA lowers scatters on TPU to serialized
    updates, and this runs inside every scoring sweep.
    """
    B, n = Ks.shape[:2]
    Kp = jnp.pad(Ks, [(0, B_pad - B), (0, NPB - n), (0, NPB - n)])
    K5 = Kp.reshape(NB, P, NPB, NPB)
    eyeP = jnp.eye(P, dtype=Ks.dtype)  # (P, P)
    out = K5[:, :, :, None, :] * eyeP[None, :, None, :, None]
    return out.reshape(NB, P * NPB, P * NPB)


def _inv_det_small(M):
    """Closed-form batched inverse + determinant of (..., d, d), d ≤ 3.

    jnp.linalg.inv/det lower to per-matrix LU custom calls on TPU — ~ms for
    a B=64 batch of tiny matrices (the same serialized-custom-call failure
    mode as batched Cholesky, VERDICT r2 #1) — so the fleet scorer's
    per-sweep precompute uses the cofactor forms instead.
    """
    d = M.shape[-1]
    if d == 1:
        det = M[..., 0, 0]
        return (1.0 / det)[..., None, None], det
    if d == 2:
        a, b = M[..., 0, 0], M[..., 0, 1]
        c, e = M[..., 1, 0], M[..., 1, 1]
        det = a * e - b * c
        adj = jnp.stack(
            [jnp.stack([e, -b], -1), jnp.stack([-c, a], -1)], -2
        )
        return adj / det[..., None, None], det
    if d == 3:
        a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
        e, f, g = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
        h, i, j = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
        A = f * j - g * i
        Bc = -(e * j - g * h)
        C = e * i - f * h
        det = a * A + b * Bc + c * C
        adj = jnp.stack(
            [
                jnp.stack([A, -(b * j - c * i), b * g - c * f], -1),
                jnp.stack([Bc, a * j - c * h, -(a * g - c * e)], -1),
                jnp.stack([C, -(a * i - b * h), a * f - b * e], -1),
            ],
            -2,
        )
        return adj / det[..., None, None], det
    raise ValueError(f"d={d} > 3 unsupported")


@partial(jax.jit, static_argnames=("opts", "interpret", "tile", "fast"))
def expected_squared_mean_fleet(
    states: BQState, opts: BQOptions, grid, interpret=None, tile: int = 2048,
    fast: bool = False, lam: float = None,
) -> jnp.ndarray:
    """(B, G) ESM over a SHARED grid via the block-packed Pallas scorer.

    Semantics identical to the vmapped ``acquire.expected_squared_mean``
    (parity-tested, tests/test_pallas.py); requires
    ``fleet_scorer_supported(opts)``. See
    tpubq.ops.pallas_kernels.esm_fleet_l for the packing design.
    """
    import math

    from tpubq.models.acquire import as_points
    from tpubq.ops import integrals as igr
    from tpubq.ops import pallas_kernels as pk

    # Weaker than fleet_scorer_supported on purpose: the explicit-call path
    # accepts ANY packable geometry (up to 128 rows/problem); the P >= 4 cap
    # in fleet_scorer_supported is an accuracy-based AUTO-dispatch policy,
    # not a kernel limit (see its docstring for the measured noise model).
    from tpubq.ops.pallas_kernels import fleet_block_geometry as _geo

    if not (
        opts.dtype == "float32" and opts.kernel == "gaussian"
        and opts.dim <= 3 and _geo(opts.max_nsc) is not None
        and _geo(opts.max_obs) is not None
    ):
        raise ValueError(
            "packed fleet scorer needs f32 gaussian d<=3 with <=128 rows/problem; "
            f"got dtype={opts.dtype!r}, kernel={opts.kernel!r}, dim={opts.dim}, "
            f"max_nsc={opts.max_nsc}, max_obs={opts.max_obs}"
        )
    dtype = states.x_s.dtype
    d = opts.dim
    B = states.ns.shape[0]
    x_a = as_points(jnp.asarray(grid, dtype), d)  # (G, d)
    G = x_a.shape[0]

    NPB_l, P_l = pk.fleet_block_geometry(opts.max_nsc)
    NPB_t, P_t = pk.fleet_block_geometry(opts.max_obs)
    NB_l = -(-B // P_l)
    NB_t = -(-B // P_t)
    Bp_l, Bp_t = NB_l * P_l, NB_t * P_t

    gp_l, gp_tl = states.gp_l, states.gp_log_l
    # NOTE: the x_sc/sc_mask PROPERTIES concatenate on axis 0 (they are
    # written for the single-problem view that vmap presents); on the raw
    # batched pytree the obs ∪ candidate concat is along axis 1.
    x_sc = jnp.concatenate([states.x_s, states.x_c], axis=1)  # (B, NSC, d)
    m_sc = jnp.concatenate(
        [states.obs_mask, states.c_mask], axis=1
    ).astype(dtype)  # (B, NSC)

    # -- per-problem scalars (B,): the per-sweep precompute. Everything is
    # closed-form elementwise math — no jnp.linalg (batched tiny LU/Cholesky
    # custom calls serialize on TPU and cost more than both kernels, measured
    # ~590 µs of a 680 µs sweep before this rewrite) and no scatters. -------
    h_l, w_l = gp_l.theta[:, 0], gp_l.theta[:, 1:]
    h_tl, w_tl = gp_tl.theta[:, 0], gp_tl.theta[:, 1:]
    eye_d = jnp.eye(d, dtype=dtype)
    Am = eye_d[None] * (w_l * w_l)[:, :, None] + states.x_var  # (B, d, d)
    Ainv, detA = _inv_det_small(Am)
    zc = h_l * h_l * jnp.prod(w_l, axis=1) / jnp.sqrt(detA)
    AinvH = 0.5 * Ainv  # (B, d, d)

    # z_i = ∫ k_l(x', x_i) p dx' = zc · exp(-(x_i-μ)ᵀ (½A⁻¹) (x_i-μ))
    # (the same quad form the kernel evaluates as ζ on the grid)
    diff = x_sc - states.x_mean[:, None, :]  # (B, NSC, d)
    q = jnp.zeros(diff.shape[:2], dtype)
    for i in range(d):  # d ≤ 3 static — unrolled elementwise
        for j in range(d):
            q = q + AinvH[:, i, j][:, None] * diff[..., i] * diff[..., j]
    z = zc[:, None] * jnp.exp(-q) * m_sc
    # batched matvec as mul+reduce (a (B, n, n) batched dot_general would
    # also serialize per problem at these sizes)
    uz = jnp.sum(gp_l.Kinv * z[:, None, :], axis=2)
    zTa = jnp.sum(z * gp_l.alpha, axis=1)
    kappa = h_l * h_l + gp_l.s * gp_l.s + gp_l.jitter

    # packed per-problem params (NB, P, 16): see _esm_fleet_l_kernel_factory.
    # Assembled by concat (scatter-free); column layout [κ, zᵀα, zc, μ(3),
    # ½A⁻¹(9), 1 spare].
    mu_cols = jnp.pad(states.x_mean, [(0, 0), (0, 3 - d)])
    ainv_cols = jnp.pad(AinvH.reshape(B, d * d), [(0, 0), (0, 9 - d * d)])
    pl_params = jnp.concatenate(
        [kappa[:, None], zTa[:, None], zc[:, None], mu_cols, ainv_cols,
         jnp.zeros((B, 1), dtype)],
        axis=1,
    )
    pad_rows = jnp.concatenate(
        [jnp.ones((Bp_l - B, 1), dtype), jnp.zeros((Bp_l - B, 15), dtype)],
        axis=1,
    )  # pad problems: κ=1, no div-0
    pl_params = jnp.concatenate([pl_params, pad_rows], axis=0)
    pl_params = pl_params.reshape(NB_l, P_l, 16)

    # Degenerate-Schur guard: the kernel guards gam = κ − s1 against its OWN
    # roundoff via an adaptive per-point bound λ·Σ|K⁻¹||k| (a condition-
    # number-aware noise estimate — with ill-conditioned Grams the dot's
    # error amplifies with Σ|K⁻¹|, and a fixed eps·κ threshold let points
    # with gam below the noise floor divide by noise: observed 3e9×
    # blowups). λ = a safety factor × the unit roundoff of the dot mode:
    # bf16x3 resolves products to ~2^-16, single-pass bf16 (fast) to ~2^-8.
    if lam is None:
        lam = _LAM_FAST if fast else _LAM_X3
    scal = jnp.asarray(
        [[opts.candidate_thresh, float(np.finfo(np.float32).eps), lam, 0.0]],
        dtype,
    )
    grid_T = x_a.T  # (d, G)

    A, Bc, dg = pk.esm_fleet_l(
        scal,
        pl_params,
        grid_T,
        _pack_rows(x_sc, Bp_l, NB_l, P_l, NPB_l),
        _pack_rows(
            jnp.broadcast_to((0.5 / (w_l * w_l))[:, None, :], x_sc.shape),
            Bp_l, NB_l, P_l, NPB_l,
        ),
        _pack_rows(
            jnp.broadcast_to((h_l * h_l)[:, None, None], m_sc.shape + (1,)),
            Bp_l, NB_l, P_l, NPB_l,
        ),
        _pack_rows(m_sc[:, :, None], Bp_l, NB_l, P_l, NPB_l),
        _pack_blockdiag(gp_l.Kinv, Bp_l, NB_l, P_l, NPB_l),
        _pack_rows(uz[:, :, None], Bp_l, NB_l, P_l, NPB_l),
        _pack_rows(gp_l.alpha[:, :, None], Bp_l, NB_l, P_l, NPB_l),
        interpret=interpret,
        tile=tile,
        fast=fast,
    )

    m_s = states.obs_mask.astype(dtype)  # (B, NO)
    pt_params = jnp.concatenate(
        [
            jnp.pad((h_tl * h_tl)[:, None], [(0, 0), (0, 7)]),
            jnp.zeros((Bp_t - B, 8), dtype),
        ],
        axis=0,
    ).reshape(NB_t, P_t, 8)
    m_a, c_a = pk.esm_fleet_tl(
        pt_params,
        grid_T,
        _pack_rows(states.x_s, Bp_t, NB_t, P_t, NPB_t),
        _pack_rows(
            jnp.broadcast_to((0.5 / (w_tl * w_tl))[:, None, :], states.x_s.shape),
            Bp_t, NB_t, P_t, NPB_t,
        ),
        _pack_rows(
            jnp.broadcast_to((h_tl * h_tl)[:, None, None], m_s.shape + (1,)),
            Bp_t, NB_t, P_t, NPB_t,
        ),
        _pack_rows(m_s[:, :, None], Bp_t, NB_t, P_t, NPB_t),
        _pack_blockdiag(gp_tl.Kinv, Bp_t, NB_t, P_t, NPB_t),
        _pack_rows(gp_tl.alpha[:, :, None], Bp_t, NB_t, P_t, NPB_t),
        interpret=interpret,
        tile=tile,
        fast=fast,
    )

    # -- fused XLA combine: lognormal moments + degenerate select ------------
    A, Bc, dg = A[:B, :G], Bc[:B, :G], dg[:B, :G]
    m_a, c_a = m_a[:B, :G], c_a[:B, :G]
    gamma = states.gamma[:, None]
    cap = jnp.asarray(0.5 * math.log(np.finfo(np.float32).max), dtype)
    e1 = jnp.exp(jnp.minimum(m_a + 0.5 * c_a, cap))
    e2 = jnp.exp(jnp.minimum(2.0 * m_a + 2.0 * c_a, cap))
    E1 = gamma * (e1 - 1.0)
    E2 = gamma * gamma * (e2 - 2.0 * e1 + 1.0)
    esm = A * A + 2.0 * A * Bc * E1 + Bc * Bc * E2
    return jnp.where(dg > 0, (zTa * zTa)[:, None], esm)


@partial(jax.jit, static_argnames=("opts", "per_problem", "fast"))
def expected_Z_var_batch(
    states: BQState, opts: BQOptions, grids, per_problem: bool = False,
    fast: bool = False,
) -> jnp.ndarray:
    """(B, G) expected posterior variance after sampling each grid point:
    Z_mean² + Z_var − ESM per problem (acquire.expected_Z_var, batched;
    the ESM term routes through the fleet auto-dispatcher)."""
    zm = Z_mean_batch(states, opts)
    zv = Z_var_batch(states, opts)
    esm = expected_squared_mean_batch(states, opts, grids, per_problem,
                                      fast=fast)
    return (zm * zm + zv)[:, None] - esm


@partial(jax.jit, static_argnames=("opts", "ntry", "fit_noise"))
def fit_batch(states: BQState, opts: BQOptions, key, ntry: int = 10,
              free_mask=None, fit_noise: bool = False) -> BQState:
    """Per-problem multi-restart MLL fit of both GPs (the fleet spelling of
    ``BQ.fit_hypers``): each problem fits θ_tl on its observations,
    re-anchors its candidates, then fits θ_l — all B × ntry restarts in
    one compiled program (vmap over problems of the vmapped-restart
    L-BFGS). ``free_mask``: optional (p,) bool shared across the fleet
    (reference ``fit_hypers(params)`` subsets). ``fit_noise``: also fit
    each GP's observation noise s jointly with θ (``params`` naming 's',
    reference GP params vector (theta..., s))."""
    from tpubq.models import fit as fitm

    B = states.ns.shape[0]
    keys = jax.random.split(key, B)

    def one(st, k):
        k1, k2, k3, k4 = jax.random.split(k, 4)
        if fit_noise:
            th_tl, s_tl, _ = fitm.fit_params_with_noise(
                opts.kernel, st.gp_log_l.theta, st.gp_log_l.s, st.x_s,
                st.tl_s, st.obs_mask, k2, n_restart=ntry, free_mask=free_mask,
            )
            st = bqm.set_params(st, opts, theta_tl=th_tl, s_tl=s_tl)
            l_sc = jnp.where(st.sc_mask, st.l_sc, 0.0)
            th_l, s_l, _ = fitm.fit_params_with_noise(
                opts.kernel, st.gp_l.theta, st.gp_l.s, st.x_sc, l_sc,
                st.sc_mask, k4, n_restart=ntry, free_mask=free_mask,
            )
            return bqm.set_params(st, opts, theta_l=th_l, s_l=s_l)
        inits_tl = fitm.random_restarts(
            k1, st.gp_log_l.theta, st.x_s, st.tl_s, st.obs_mask, ntry,
            kernel=opts.kernel,
        )
        th_tl, _ = fitm.fit_params(
            opts.kernel, st.gp_log_l.theta, st.gp_log_l.s, st.x_s, st.tl_s,
            st.obs_mask, k2, inits_tl, free_mask=free_mask,
        )
        st = bqm.set_params(st, opts, theta_tl=th_tl)
        l_sc = jnp.where(st.sc_mask, st.l_sc, 0.0)
        inits_l = fitm.random_restarts(
            k3, st.gp_l.theta, st.x_sc, l_sc, st.sc_mask, ntry,
            kernel=opts.kernel,
        )
        th_l, _ = fitm.fit_params(
            opts.kernel, st.gp_l.theta, st.gp_l.s, st.x_sc, l_sc,
            st.sc_mask, k4, inits_l, free_mask=free_mask,
        )
        return bqm.set_params(st, opts, theta_l=th_l)

    return jax.vmap(one)(states, keys)


@partial(jax.jit, static_argnames=("opts", "n", "nburn", "params", "n_chains"))
def sample_hypers_batch(states: BQState, opts: BQOptions, key, n: int,
                        nburn: int = 10, params=None, n_chains: int = 1,
                        prior_std: float = None) -> jnp.ndarray:
    """(B, n, p) per-problem hyper-posterior draws — vmapped
    ``marginalize.sample_hypers`` with an independent key per problem."""
    from tpubq.models import marginalize as margm

    if prior_std is None:
        prior_std = margm._PRIOR_STD
    B = states.ns.shape[0]
    keys = jax.random.split(key, B)
    return jax.vmap(
        lambda st, k: margm.sample_hypers(
            st, opts, k, n, nburn=nburn, params=params, n_chains=n_chains,
            prior_std=prior_std,
        )
    )(states, keys)


@partial(jax.jit, static_argnames=("opts", "funs"))
def marginalize_batch(states: BQState, opts: BQOptions, hyper_samples,
                      funs=None):
    """Per-problem hyper-marginalized estimates: ``hyper_samples`` is
    (B, n, p) (e.g. from ``sample_hypers_batch``); returns a tuple of
    (B, n) arrays — vmapped ``marginalize.marginalize``."""
    from tpubq.models import marginalize as margm

    if funs is None:
        funs = (bqm.Z_mean, bqm.Z_var)
    return jax.vmap(
        lambda st, th: margm.marginalize(st, opts, th, funs)
    )(states, hyper_samples)


def _batch_size(states: BQState) -> int:
    return states.ns.shape[0]


@partial(jax.jit, static_argnames=("opts", "fast"))
def choose_next_batch(states: BQState, opts: BQOptions, grid, fast: bool = False):
    """Per-problem argmax of ESM over a shared grid → ((B, d), (B, G)).

    ``fast=True`` scores with the single-pass-bf16 fleet kernel (~1.4× the
    default packed scorer, ~3e-3 q99 score noise — argmax-stable in
    practice; see expected_squared_mean_fleet)."""
    from tpubq.models.acquire import as_points

    scores = expected_squared_mean_batch(states, opts, grid, fast=fast)
    # as_points, not a raw [:, None]: for dim > 1 a 1-D grid array is ONE
    # d-dimensional point, which a raw reshape would scramble into d bogus
    # 1-D points and return a wrong-shaped x_next.
    grid2 = as_points(jnp.asarray(grid, states.x_s.dtype), opts.dim)
    # Per-problem duplicate-avoiding tie-break (see demote_near_observed:
    # a converged problem's plateau otherwise re-picks the same point every
    # step of run_active_loop_batch until its Gram degenerates).
    sel = jax.vmap(
        lambda sc, xs, m: acquire.demote_near_observed(
            sc, grid2, xs, m, opts.candidate_thresh
        )
    )(scores, states.x_s, states.obs_mask)
    return grid2[jnp.argmax(sel, axis=1)], scores


@partial(jax.jit, static_argnames=("opts",))
def choose_next_marg_batch(states: BQState, opts: BQOptions, grid,
                           thetas) -> jnp.ndarray:
    """Per-problem hyper-marginalized selection → (B, d).

    ``thetas``: (B, n, p) per-problem hyper draws (sample_hypers_batch);
    each problem's grid ESM is averaged over ITS OWN n samples before the
    duplicate-avoiding argmax — one compiled program for the whole fleet
    (``BQ.choose_next(x, n)``, fleet-wide)."""
    from tpubq.models.acquire import choose_next as _cn

    grid = jnp.asarray(grid, states.x_s.dtype)
    x_next, _ = jax.vmap(lambda st, th: _cn(st, opts, grid, th))(states, thetas)
    return x_next


@partial(jax.jit, static_argnames=("opts",))
def add_observation_batch(states: BQState, opts: BQOptions, x_new, l_new) -> BQState:
    """Append one observation per problem and refit the whole fleet."""
    return jax.vmap(acquire.add_observation, (0, None, 0, 0))(
        states, opts, jnp.asarray(x_new), jnp.asarray(l_new)
    )


@partial(jax.jit, static_argnames=("opts", "loglik_fn", "n_steps",
                                  "record_moments"))
def run_active_loop_batch(states: BQState, opts: BQOptions, loglik_fn, grid,
                          n_steps: int, hyper_samples=None,
                          record_moments: bool = True):
    """Fleet-wide active sampling: every problem picks and absorbs its own
    next point each step (one compiled scan for the whole fleet).
    ``loglik_fn(x: (d,)) -> ()`` is vmapped across the fleet's choices.
    ``hyper_samples``: optional (B, n, p) per-problem draws (e.g. from
    ``sample_hypers_batch``) — each step's acquisition is then
    marginalized per problem (the single-problem
    ``run_active_loop(hyper_samples=...)`` spelling, vmapped).
    ``record_moments=False`` skips the per-step (Z_mean, Z_var) trajectory
    (returns ``(final_state, None)``; the final state is identical) — for
    serving runs that only consume the end state, this drops the per-step
    V[Z] quadrature from the compiled loop entirely.
    """

    def step(sts, _):
        if hyper_samples is None:
            x_next, _ = choose_next_batch(sts, opts, grid)
        else:
            x_next, _ = jax.vmap(
                lambda st, th: acquire.choose_next(st, opts, grid, th)
            )(sts, hyper_samples)
        l_next = jax.vmap(loglik_fn)(x_next)
        sts = add_observation_batch(sts, opts, x_next, l_next)
        if not record_moments:
            return sts, None
        return sts, (Z_mean_batch(sts, opts), Z_var_batch(sts, opts))

    return jax.lax.scan(step, states, None, length=n_steps)


class BQFleet:
    """User-facing fleet: B independent BQ problems advanced in one dispatch.

    The stateful convenience shell over this module's functional API (as
    ``tpubq.BQ`` is over the single-problem core) — the production serving
    shape the reference cannot express. All problems share one ``BQOptions``
    (static shapes); data, measures, and hyperparameters vary per problem.

    Example:
        fleet = BQFleet(xs, ls, n_candidate=12, candidate_thresh=0.2)
        zm, zv = fleet.Z_mean(), fleet.Z_var()        # (B,), (B,)
        x_next = fleet.choose_next(grid)              # (B, d)
        fleet.add_observation(x_next, l_next)         # one dispatch
        fleet.save("fleet.npz"); fleet2 = BQFleet.load("fleet.npz")
    """

    def __init__(self, xs, ls, params_tl=None, params_l=None, **options):
        from tpubq.utils.options import parse_bq_kwargs

        xs = np.asarray(xs)
        opts, x_means, x_vars, gamma, s_tl, s_l, seed = parse_bq_kwargs(
            options, xs.shape[2] if xs.ndim == 3 else 1, xs.shape[1]
        )
        self.options = opts
        self._seed = seed
        self._rng = np.random.RandomState(seed)
        self._states = init_batch(
            xs, ls, self.options, params_tl=params_tl, params_l=params_l,
            s_tl=s_tl, s_l=s_l, gamma=gamma, x_means=x_means, x_vars=x_vars,
        )

    # -- construction from existing states ----------------------------------
    @classmethod
    def from_states(cls, states: BQState, opts: BQOptions,
                    seed: int = 0) -> "BQFleet":
        if states.ns.ndim != 1:
            raise ValueError(
                "BQFleet needs a BATCHED state (every leaf with a leading "
                "problem axis); this looks like a single-problem state — use "
                "tpubq.BQ / tpubq.models functions for those, or stack "
                "states with jax.tree.map"
            )
        obj = object.__new__(cls)
        obj.options = opts
        obj._states = states
        obj._seed = seed
        obj._rng = np.random.RandomState(seed)
        return obj

    def _key(self, seed):
        if seed is None:
            seed = self._rng.randint(0, 2**31 - 1)
        return jax.random.PRNGKey(seed)

    @property
    def states(self) -> BQState:
        return self._states

    def __len__(self) -> int:
        return _batch_size(self._states)

    @property
    def ns(self) -> np.ndarray:
        return np.asarray(self._states.ns)

    def problem(self, i: int):
        """Extract problem ``i`` as a standalone single-problem state view
        (pair it with ``self.options`` for any tpubq.models function)."""
        return jax.tree.map(lambda a: a[i], self._states)

    # -- estimation -----------------------------------------------------------
    def Z_mean(self) -> np.ndarray:
        return np.asarray(Z_mean_batch(self._states, self.options))

    def Z_var(self) -> np.ndarray:
        return np.asarray(Z_var_batch(self._states, self.options))

    def expected_squared_mean(self, grid, per_problem: bool = False,
                              fast: bool = False) -> np.ndarray:
        return np.asarray(
            expected_squared_mean_batch(self._states, self.options, grid,
                                        per_problem, fast=fast)
        )

    def expected_Z_var(self, grid, per_problem: bool = False,
                       fast: bool = False) -> np.ndarray:
        return np.asarray(
            expected_Z_var_batch(self._states, self.options, grid,
                                 per_problem, fast=fast)
        )

    # -- hyperparameters -------------------------------------------------------
    def fit(self, params=None, ntry: int = 10, seed=None) -> "BQFleet":
        """Per-problem multi-restart MLL fit of both GPs (the fleet
        spelling of ``BQ.fit_hypers``; ``params`` names subset the free
        hypers exactly as there, including 's' for the observation
        noise)."""
        from tpubq.models import fit as fitm

        fit_noise, free_mask = fitm.resolve_param_names(
            self.options, int(self._states.gp_log_l.theta.shape[1]), params
        )
        self._states = fit_batch(self._states, self.options,
                                 self._key(seed), ntry=ntry,
                                 free_mask=free_mask, fit_noise=fit_noise)
        return self

    fit_hypers = fit

    def sample_hypers(self, params=None, n: int = 100, nburn: int = 10,
                      seed=None, n_chains: int = 1,
                      prior_std: float = None) -> np.ndarray:
        """(B, n, p) per-problem hyper-posterior draws
        (``BQ.sample_hypers`` per fleet member, one compiled program)."""
        if params is not None and not isinstance(params, tuple):
            params = (params,) if isinstance(params, str) else tuple(params)
        return np.asarray(sample_hypers_batch(
            self._states, self.options, self._key(seed), n, nburn=nburn,
            params=params, n_chains=n_chains, prior_std=prior_std,
        ))

    def marginalize(self, funs=None, n: int = 100, params=None, seed=None,
                    prior_std: float = None):
        """Per-problem hyper-marginalized estimates: tuple of (B, n)
        arrays (``BQ.marginalize`` per fleet member)."""
        if params is not None and not isinstance(params, tuple):
            params = (params,) if isinstance(params, str) else tuple(params)
        thetas = sample_hypers_batch(
            self._states, self.options, self._key(seed), n, params=params,
            prior_std=prior_std,
        )
        named = {"Z_mean": bqm.Z_mean, "Z_var": bqm.Z_var}
        if funs is None:
            funs = (bqm.Z_mean, bqm.Z_var)
        funs = tuple(named.get(f, f) if isinstance(f, str) else f for f in funs)
        outs = marginalize_batch(self._states, self.options, thetas, funs)
        return tuple(np.asarray(o) for o in outs)

    # -- active sampling -------------------------------------------------------
    def choose_next(self, grid, n: int = 0, seed=None,
                    fast: bool = False) -> np.ndarray:
        """Per-problem best next location; ``n > 0`` marginalizes each
        problem's ESM over ``n`` of its own hyper samples
        (``BQ.choose_next(x, n)``, fleet-wide)."""
        if n > 0:
            thetas = sample_hypers_batch(
                self._states, self.options, self._key(seed), n
            )
            return np.asarray(choose_next_marg_batch(
                self._states, self.options, grid, thetas
            ))
        x_next, _ = choose_next_batch(self._states, self.options, grid, fast=fast)
        return np.asarray(x_next)

    def add_observation(self, x_next, l_next) -> "BQFleet":
        l_next = np.asarray(l_next)
        if np.any(~np.isfinite(l_next)) or np.any(l_next <= 0):
            raise ValueError("l must be finite and positive")
        if np.any(self.ns >= self.options.max_obs):
            raise ValueError(
                f"a fleet member is at capacity (max_obs={self.options.max_obs}); "
                "rebuild the fleet with a larger max_obs"
            )
        # duplicate-location rejection, per problem (reference parity with
        # BQ.add_observation — duplicates make the Gram singular-up-to-jitter)
        x_arr = np.asarray(x_next, self.options.np_dtype).reshape(
            (len(self), self.options.dim)
        )
        # duplicate check computed ON DEVICE — only a scalar comes back
        # (pulling the whole (B, max_obs, d) fleet state to host per call
        # would serialize a full-state transfer into the serving hot path)
        dist = jnp.max(
            jnp.abs(self._states.x_s - jnp.asarray(x_arr)[:, None, :]), axis=-1
        )
        min_dist = jnp.min(
            jnp.where(self._states.obs_mask, dist, jnp.inf), axis=1
        )
        if bool(jnp.any(min_dist < 1e-10)):
            raise ValueError("duplicate observation location in the fleet")
        self._states = add_observation_batch(
            self._states, self.options, x_arr, l_next
        )
        return self

    def run_active_loop(self, loglik_fn, grid, n_steps: int, n: int = 0,
                        seed=None, record_moments: bool = True):
        """Advance every problem ``n_steps`` (one compiled scan); returns the
        per-step (Z_mean, Z_var) histories, each (n_steps, B), or
        ``(None, None)`` with ``record_moments=False`` (the per-step V[Z]
        quadrature drops out of the loop; final state identical). ``n > 0``
        marginalizes each step's acquisition over ``n`` per-problem hyper
        samples (``BQ.choose_next(x, n)`` inside the loop, fleet-wide)."""
        if np.any(self.ns + n_steps > self.options.max_obs):
            raise ValueError(
                f"{n_steps} steps would exceed max_obs="
                f"{self.options.max_obs} for a fleet member (ns="
                f"{self.ns.tolist()}); rebuild the fleet with a larger max_obs"
            )
        hyper_samples = None
        if n > 0:
            hyper_samples = sample_hypers_batch(
                self._states, self.options, self._key(seed), n
            )
        self._states, moments = run_active_loop_batch(
            self._states, self.options, loglik_fn, grid, n_steps,
            hyper_samples=hyper_samples, record_moments=record_moments,
        )
        if not record_moments:
            return None, None
        zms, zvs = moments
        return np.asarray(zms), np.asarray(zvs)

    # -- persistence ------------------------------------------------------------
    def health(self):
        """Per-problem diagnostics: utils.health.check_state vmapped over
        the fleet — every leaf of the returned dict gains a leading (B,)
        axis. Serving-side observability in one dispatch."""
        import jax

        from tpubq.utils import health as _health

        return jax.vmap(
            lambda st: _health.check_state(st, self.options)
        )(self._states)

    def save(self, path, force: bool = False):
        from tpubq.utils.io import save_state

        save_state(path, self._states, self.options, force=force,
                   extras={"seed": self._seed})

    @classmethod
    def load(cls, path, refit: bool = False) -> "BQFleet":
        from tpubq.utils.io import load_extras, load_state

        states, opts = load_state(path, refit=refit)
        # restore the instance-RNG seed so reloaded ensemble members keep
        # drawing INDEPENDENT hyper-sample streams (pre-seed checkpoints
        # fall back to 0, the old behavior)
        seed = int(load_extras(path).get("seed", 0))
        return cls.from_states(states, opts, seed=seed)

    def __repr__(self):
        return f"BQFleet(B={len(self)}, ns={self.ns.tolist()}, options={self.options})"
