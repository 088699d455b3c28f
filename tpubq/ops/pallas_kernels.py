"""Pallas TPU kernels for the hot numeric paths.

Reference parity: these replace the reference's native (Cython) layer —
kernel evaluation loops in the ``gp`` package's extensions and the
factorization-heavy inner loops behind ``bq_c.pyx`` — with on-chip TPU
kernels (BASELINE.json north star: "Pallas kernels for Gaussian-kernel Gram
construction, blocked Cholesky factor/solve, and fused marginal-log-
likelihood + gradient"):

  * ``gaussian_gram``: tiled Gram construction, one VMEM-resident
    (TM × TN) tile per program; the big (n_data × n_grid) cross-Grams of
    candidate scoring stream through without materializing intermediates.
  * ``cholesky_batched``: the batched factorization behind hyperparameter
    marginalization. One program per matrix; a fully vectorized column
    Cholesky (rank-1 updates as full-tile VPU/MXU ops) runs in VMEM.
  * ``mll_grad_batched``: the fused fit objective. Per hyper-setting
    (one program each): build the Gram from x, factor it, invert via
    forward substitution, and emit the masked log marginal likelihood AND
    its analytic (h, w)-gradient via the trace identity
    dMLL/dθ = -1/2 tr[(K⁻¹ - ααᵀ) ∂K/∂θ] — one kernel launch replaces the
    XLA chol→solve→logdet→autodiff pipeline per L-BFGS evaluation.

All kernels run in interpret mode off-TPU (CPU tests exercise the same
code); wrappers pad shapes to tile boundaries with identity rows (the
pad_gram convention of tpubq.ops.linalg).

Dispatch status (measured on the v5e, rounds 2–3 —
benchmarks/pallas_vs_xla.py, benchmarks/large_n.py, PARITY.md): the
PRODUCTION Pallas paths are ``mll_grad_batched`` (via fit_params_fused),
``cholesky_batch_major`` (via linalg.posdef_cholesky's custom_vmap rule on
every vmapped f32 factorization: fleet and marginalize paths), and
``esm_fleet_l``/``esm_fleet_tl`` (the block-packed fleet scorer — the
shared-grid f32 gaussian route of batched.expected_squared_mean_batch).
The rest LOSES to XLA at the sizes this workload reaches: the Gram because
XLA fuses it into consumers and never materializes it; per-matrix
Cholesky/tri-solve because XLA's TPU custom calls beat the vectorized
column algorithm at EVERY VMEM-feasible size (round-3 sweep, f32
scan-differenced: XLA 10.5/31.8/108/220 µs vs blocked Pallas
43/118/261/573 µs at N=128/256/512/1024 — there is no large-N crossover
inside the kernel's N ≲ 1024 VMEM range, so "payoff at large N" is
RETIRED, not pending); and even ``esm_fused``, once K⁻¹ is cached in
GPState and applied as MXU matmuls, measures ~0.7× the pure-XLA scoring
path. The lesson that survived three rounds of measuring: XLA's fusion is
the speed of light for single small problems, but it has two structural
blind spots a handwritten kernel can exploit — BATCHED factorizations
serialize one custom call per matrix (putting the batch in the VPU lane
dimension wins 9–45×, see ``cholesky_batch_major``), and batched small
matmuls over per-problem operands run as a loop over B (packing problems
into one block-diagonal MXU contraction wins ~2–4× aggregate, see
``esm_fleet_l``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "gaussian_gram",
    "cholesky_batched",
    "cholesky_batch_major",
    "bm_supported",
    "cholesky_blocked",
    "tri_solve_blocked",
    "mll_grad_batched",
    "esm_fused",
    "esm_fleet_l",
    "esm_fleet_tl",
    "fleet_block_geometry",
    "on_tpu",
]

_LOG2PI = math.log(2.0 * math.pi)


def on_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _interpret(flag):
    return (not on_tpu()) if flag is None else flag


class _x64_off:
    """Trace pallas_call with x64 disabled: the package enables global x64
    (parity paths), but Mosaic requires i32 grid/index arithmetic, and these
    kernels are explicitly f32. Used as `with _x64_off(): ...` at trace time.
    """

    def __enter__(self):
        self._cm = jax.enable_x64(False)
        return self._cm.__enter__()

    def __exit__(self, *a):
        return self._cm.__exit__(*a)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _out_struct(shape, dtype, *refs):
    """ShapeDtypeStruct for a pallas_call output, with its varying-mesh-axes
    set (vma) inherited from the inputs. Inside ``shard_map(check_vma=True)``
    every output aval must declare which mesh axes it varies over; a plain
    ShapeDtypeStruct carries ``vma=None`` and is rejected at trace time
    (observed on the 1-device TPU mesh: posdef_cholesky's batch-major
    dispatch inside the sharded refit). These kernels are shard-local —
    each device computes its block independently — so the output varies
    over exactly the axes any input varies over (the union). Outside
    shard_map ``jax.typeof(x).vma`` is empty and this reduces to the plain
    struct."""
    vma = frozenset()
    for r in refs:
        vma = vma | (getattr(jax.typeof(r), "vma", None) or frozenset())
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


# ---------------------------------------------------------------------------
# Gram construction
# ---------------------------------------------------------------------------


def _gram_kernel(h2_ref, a_ref, b_ref, o_ref):
    a = a_ref[:]  # (TM, d) pre-scaled by 1/w
    b = b_ref[:]  # (TN, d)
    d = a.shape[1]
    r2 = jnp.zeros((a.shape[0], b.shape[0]), dtype=a.dtype)
    for k in range(d):  # d is tiny and static — unrolled VPU passes
        diff = a[:, k][:, None] - b[:, k][None, :]
        r2 = r2 + diff * diff
    o_ref[:] = h2_ref[0, 0] * jnp.exp(-0.5 * r2)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def gaussian_gram(theta, x1, x2, interpret=None, tile=128):
    """Gaussian Gram k(x1, x2) as a tiled Pallas kernel → (n1, n2).

    Same contract as tpubq.ops.kernels.gaussian_K (reference:
    gp/kernels/gaussian.py), computed tile-by-tile in VMEM.
    """
    dtype = x1.dtype
    h = theta[0]
    w = theta[1:]
    n1, d = x1.shape
    n2 = x2.shape[0]
    m1, m2 = _round_up(n1, tile), _round_up(n2, tile)
    a = jnp.zeros((m1, d), dtype).at[:n1].set(x1 / w)
    b = jnp.zeros((m2, d), dtype).at[:n2].set(x2 / w)
    h2 = jnp.reshape(h * h, (1, 1)).astype(dtype)

    with _x64_off():
        out = pl.pallas_call(
            _gram_kernel,
            out_shape=jax.ShapeDtypeStruct((m1, m2), dtype),
            grid=(m1 // tile, m2 // tile),
            in_specs=[
                pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((tile, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, d), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile, tile), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            interpret=_interpret(interpret),
        )(h2, a, b)
    return out[:n1, :n2]


# ---------------------------------------------------------------------------
# Batched Cholesky (column algorithm, full-tile vector ops)
# ---------------------------------------------------------------------------


def _chol_body(A, N, dtype):
    """Vectorized column Cholesky of one (N, N) tile; returns lower L."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    rowv = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0)
    colr = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    tiny = jnp.asarray(np.finfo(np.dtype(dtype)).tiny, dtype)

    def body(j, L):
        # L[j, :j] as a (1, N) row
        lrow = jnp.sum(jnp.where(rows == j, L, 0.0), axis=0, keepdims=True)
        lrow = jnp.where(colr < j, lrow, 0.0)
        # v = L @ L[j,:j]^T — the accumulated inner products for column j
        v = jnp.dot(L, lrow.T, preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST)  # (N, 1)
        acol = jnp.sum(jnp.where(cols == j, A, 0.0), axis=1, keepdims=True)
        c = acol - v
        cjj = jnp.sum(jnp.where(rowv == j, c, 0.0))
        piv = jnp.sqrt(jnp.maximum(cjj, tiny))
        lcol = jnp.where(rowv == j, piv, jnp.where(rowv > j, c / piv, 0.0))
        return L + lcol * (colr == j).astype(dtype)

    return jax.lax.fori_loop(0, N, body, jnp.zeros((N, N), dtype))


def _chol_kernel(a_ref, l_ref):
    A = a_ref[0]
    l_ref[0] = _chol_body(A, A.shape[0], A.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_batched(Ks, interpret=None):
    """Lower Cholesky factors of a batch of SPD matrices → (B, N, N).

    One grid program per matrix: the batched-factorization engine for
    hyperparameter marginalization (reference: the per-sample LAPACK
    refactorization loop in bq.py::BQ.marginalize, here one kernel launch
    for the whole sample batch).
    """
    B, N, _ = Ks.shape
    Np = _round_up(N, 8)
    if Np != N:
        eye = jnp.eye(Np, dtype=Ks.dtype)
        Kp = jnp.tile(eye[None], (B, 1, 1))
        Kp = Kp.at[:, :N, :N].set(Ks)
    else:
        Kp = Ks
    with _x64_off():
        out = pl.pallas_call(
            _chol_kernel,
            out_shape=jax.ShapeDtypeStruct((B, Np, Np), Ks.dtype),
            grid=(B,),
            in_specs=[pl.BlockSpec((1, Np, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, Np, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            interpret=_interpret(interpret),
        )(Kp)
    return out[:, :N, :N]


# ---------------------------------------------------------------------------
# Fused MLL + gradient (batched over hyper settings)
# ---------------------------------------------------------------------------


def _tri_inv_body(L, N, dtype):
    """Y = L^{-1} by forward substitution, one row per step (full-tile ops)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    colr = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)

    def body(j, Y):
        lrow = jnp.sum(jnp.where(rows == j, L, 0.0), axis=0, keepdims=True)  # (1,N)
        ljj = jnp.sum(jnp.where(colr == j, lrow, 0.0))
        lrow_lt = jnp.where(colr < j, lrow, 0.0)
        contrib = jnp.dot(lrow_lt, Y, preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST)  # (1, N)
        e_row = (colr == j).astype(dtype)
        yrow = (e_row - contrib) / ljj
        return Y + jnp.where(rows == j, jnp.broadcast_to(yrow, (N, N)), 0.0)

    return jax.lax.fori_loop(0, N, body, jnp.zeros((N, N), dtype))


def _mll_kernel(s2_ref, jit_ref, t_ref, x_ref, y_ref, m_ref, mll_ref, g_ref):
    dtype = x_ref.dtype
    x = x_ref[:]  # (N, 1)
    y = y_ref[:]  # (N, 1)
    m = m_ref[:]  # (N, 1) float mask
    N = x.shape[0]
    b = pl.program_id(0)
    h = t_ref[b, 0]
    w = t_ref[b, 1]
    s2 = s2_ref[0, 0]
    jitter = jit_ref[0, 0]

    mm = m * m.T  # (N, N) pairwise live mask
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (N, N), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (N, N), 1)
    ).astype(dtype)
    diff = (x - x.T) / w
    r2 = diff * diff
    K0 = (h * h) * jnp.exp(-0.5 * r2) * mm  # kernel part (live block only)
    K = K0 + eye * (1.0 - m) + eye * (s2 + jitter * h * h) * m

    L = _chol_body(K, N, dtype)
    Y = _tri_inv_body(L, N, dtype)
    Kinv = jnp.dot(Y.T, Y, preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST)
    alpha = jnp.dot(Kinv, y, preferred_element_type=dtype, precision=jax.lax.Precision.HIGHEST)  # (N, 1)
    quad = jnp.sum(y * alpha)
    diagL = jnp.sum(L * eye, axis=1, keepdims=True)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.where(m > 0, diagL, 1.0)))
    n_live = jnp.sum(m)
    mll = -0.5 * (quad + logdet + n_live * _LOG2PI)
    mll_ref[b, 0] = mll

    # analytic gradient: dMLL/dθ = -1/2 tr[(K^{-1} - α αᵀ) ∂K/∂θ]
    G = Kinv - alpha * alpha.T
    dKdh = (2.0 / h) * K0 + eye * (2.0 * jitter * h) * m
    dKdw = K0 * r2 / w
    g_ref[b, 0] = -0.5 * jnp.sum(G * dKdh)
    g_ref[b, 1] = -0.5 * jnp.sum(G * dKdw)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mll_grad_batched(thetas, s, x, y, mask, jitter=1e-10, interpret=None):
    """Masked log-MLL and its (h, w) gradient for a batch of hyper settings.

    thetas: (B, 2) positive (h, w); x: (n, 1); y: (n,); mask: (n,) bool.
    Returns (mll: (B,), grad: (B, 2)). Fuses Gram construction, Cholesky,
    inverse, log-det and the trace-identity gradient into one kernel program
    per batch element (replaces gp/gp.py::GP.log_lh + dloglh_dtheta per
    restart). Note: ``jitter`` is relative to h² (the live diagonal), matching
    cholesky_fixed's mean-diagonal scaling for gaussian kernels.
    """
    dtype = x.dtype
    B = thetas.shape[0]
    n = x.shape[0]
    Np = _round_up(n, 8)
    xp = jnp.zeros((Np, 1), dtype).at[:n, 0].set(x[:, 0])
    yp = jnp.zeros((Np, 1), dtype).at[:n, 0].set(jnp.where(mask, y, 0.0))
    mp = jnp.zeros((Np, 1), dtype).at[:n, 0].set(mask.astype(dtype))
    s2 = jnp.full((1, 1), s * s, dtype)
    jit_arr = jnp.full((1, 1), jitter, dtype)

    with _x64_off():
        mll, grad = pl.pallas_call(
            _mll_kernel,
            out_shape=(
                jax.ShapeDtypeStruct((B, 1), dtype),
                jax.ShapeDtypeStruct((B, 2), dtype),
            ),
            grid=(B,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((Np, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Np, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((Np, 1), lambda b: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            interpret=_interpret(interpret),
        )(s2, jit_arr, thetas.reshape(B, 2), xp, yp, mp)
    return mll[:, 0], grad


# ---------------------------------------------------------------------------
# Fused expected-squared-mean scorer (the headline hot path)
# ---------------------------------------------------------------------------


# Packed-scalar layout for the fused ESM kernel (SMEM row of 32).
# [0] h_l², [1] κ, [2] ζ scale, [3] γ, [4] thresh, [5] zᵀα, [6] h_tl²,
# [7] exp cap, [8:8+d] 0.5/w_l² per dim, [8+d:8+2d] 0.5/w_tl² per dim,
# [8+2d:8+3d] μ, [8+3d:8+3d+d²] 0.5·(W_l+Σ)⁻¹ row-major (ζ quad form).
_ESM_P = {"h_l2": 0, "kappa": 1, "zc": 2, "gamma": 3, "thresh": 4,
          "zTa": 5, "h_tl2": 6, "cap": 7, "base": 8}


def _esm_kernel_factory(d):
    """Fused ESM scorer for ``d``-dimensional inputs (d static, loops
    unrolled). Grid tile: (d, T) query points; everything per-candidate runs
    in VMEM; HBM traffic is the grid in, the scores out."""

    def kernel(p_ref, xa_ref, xsc_ref, msc_ref, Kinv_ref, uz_ref, al_ref,
               xs_ref, ms_ref, Kinvtl_ref, altl_ref, o_ref):
        dtype = xsc_ref.dtype
        P = jax.lax.Precision.HIGHEST
        b = _ESM_P["base"]
        h_l2 = p_ref[0, _ESM_P["h_l2"]]
        kappa = p_ref[0, _ESM_P["kappa"]]
        zc = p_ref[0, _ESM_P["zc"]]
        gamma = p_ref[0, _ESM_P["gamma"]]
        thresh = p_ref[0, _ESM_P["thresh"]]
        zTa = p_ref[0, _ESM_P["zTa"]]
        h_tl2 = p_ref[0, _ESM_P["h_tl2"]]
        cap = p_ref[0, _ESM_P["cap"]]

        xa = xa_ref[:]                     # (d, T)
        xsc = xsc_ref[:]                   # (NP, d)
        msc = msc_ref[:]                   # (NP, 1)
        T = xa.shape[1]

        # linear-GP cross-kernel + sup-norm distances, per-dim unrolled
        r2_l = jnp.zeros((xsc.shape[0], T), dtype)
        dmax = jnp.zeros((xsc.shape[0], T), dtype)
        for j in range(d):
            dj = xsc[:, j][:, None] - xa[j, :][None, :]   # (NP, T)
            r2_l = r2_l + (dj * dj) * p_ref[0, b + j]
            dmax = jnp.maximum(dmax, jnp.abs(dj))
        k = h_l2 * jnp.exp(-r2_l) * msc
        V = jnp.dot(Kinv_ref[:], k, preferred_element_type=dtype, precision=P)
        gam = kappa - jnp.sum(k * V, axis=0, keepdims=True)          # (1, T)
        zv = jnp.dot(uz_ref[:].T, k, preferred_element_type=dtype, precision=P)
        ka = jnp.dot(al_ref[:].T, k, preferred_element_type=dtype, precision=P)

        # ζ(x_a) = zc · exp(-½ (x_a-μ)ᵀ (W_l+Σ)⁻¹ (x_a-μ)) — quad form unrolled
        q = jnp.zeros((1, T), dtype)
        for i in range(d):
            dai = (xa[i, :] - p_ref[0, b + 2 * d + i])[None, :]
            for j in range(d):
                daj = (xa[j, :] - p_ref[0, b + 2 * d + j])[None, :]
                q = q + p_ref[0, b + 3 * d + i * d + j] * dai * daj
        zeta = zc * jnp.exp(-q)

        # degenerate guard: sup-norm proximity to a live point, or non-PD Schur
        near = jnp.max(
            jnp.where(msc > 0, (dmax < thresh).astype(dtype), 0.0),
            axis=0, keepdims=True,
        )
        eps = jnp.asarray(np.finfo(np.float32).eps, dtype)
        degen = jnp.logical_or(near > 0, gam <= eps * kappa)
        B = (zeta - zv) / jnp.where(degen, 1.0, gam)
        A = zTa - B * ka

        # log-GP posterior moments at x_a
        xs = xs_ref[:]                     # (NP2, d)
        ms = ms_ref[:]
        r2_tl = jnp.zeros((xs.shape[0], T), dtype)
        for j in range(d):
            dj = xs[:, j][:, None] - xa[j, :][None, :]
            r2_tl = r2_tl + (dj * dj) * p_ref[0, b + d + j]
        ktl = h_tl2 * jnp.exp(-r2_tl) * ms
        V2 = jnp.dot(Kinvtl_ref[:], ktl, preferred_element_type=dtype, precision=P)
        c = jnp.maximum(h_tl2 - jnp.sum(ktl * V2, axis=0, keepdims=True), 0.0)
        m = jnp.dot(altl_ref[:].T, ktl, preferred_element_type=dtype, precision=P)
        e1 = jnp.exp(jnp.minimum(m + 0.5 * c, cap))
        e2 = jnp.exp(jnp.minimum(2.0 * m + 2.0 * c, cap))
        E1 = gamma * (e1 - 1.0)
        E2 = gamma * gamma * (e2 - 2.0 * e1 + 1.0)
        esm = A * A + 2.0 * A * B * E1 + B * B * E2
        o_ref[:] = jnp.where(degen, zTa * zTa, esm)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def esm_fused(params, grid, xsc, msc, Kinv, uz, alpha, xs, ms, Kinv_tl,
              alpha_tl, interpret=None, tile=512):
    """Fused ESM scores over a grid of d-dimensional points → (n_grid,).

    ``params``: packed scalars per the _ESM_P layout (d inferred from
    ``xsc.shape[1]``, d ≤ 3). Array shapes: grid (d, G), xsc (NP, d),
    msc/uz/alpha (NP, 1), xs (NP2, d), ms/alpha_tl (NP2, 1), Kinv (NP, NP),
    Kinv_tl (NP2, NP2); NP/NP2 multiples of 8.
    """
    dtype = grid.dtype
    d = xsc.shape[1]
    G = grid.shape[1]
    Gp = _round_up(G, tile)
    g = jnp.tile(grid[:, -1:], (1, Gp)).at[:, :G].set(grid)
    p = jnp.zeros((1, 32), dtype).at[0, : params.shape[0]].set(params)

    with _x64_off():
        out = pl.pallas_call(
            _esm_kernel_factory(d),
            out_shape=_out_struct((1, Gp), dtype, g, xsc, Kinv, alpha),
            grid=(Gp // tile,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((d, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ]
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
            out_specs=pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            interpret=_interpret(interpret),
        )(p, g, xsc, msc, Kinv, uz, alpha, xs, ms, Kinv_tl, alpha_tl)
    return out[0, :G]


# ---------------------------------------------------------------------------
# Blocked Cholesky factor / solve (large single matrices)
# ---------------------------------------------------------------------------


def _chol_blocked_kernel_factory(N, B, dtype):
    """Right-looking blocked Cholesky: per 128-panel, factor the diagonal
    block (vectorized column algorithm), form the panel via a triangular
    inverse + MXU matmul, and rank-B-update the trailing submatrix on the
    MXU. The block loop is static (unrolled); all slices are static.
    """
    nb = N // B
    P = jax.lax.Precision.HIGHEST

    def kernel(a_ref, l_ref, work):
        work[:] = a_ref[:]
        for kb in range(nb):
            k0 = kb * B
            Akk = work[k0 : k0 + B, k0 : k0 + B]
            Lkk = _chol_body(Akk, B, dtype)
            Ykk = _tri_inv_body(Lkk, B, dtype)  # Lkk^{-1}
            l_ref[k0 : k0 + B, k0 : k0 + B] = Lkk
            rem = N - (k0 + B)
            if rem > 0:
                Aik = work[k0 + B :, k0 : k0 + B]  # (rem, B)
                Lik = jnp.dot(Aik, Ykk.T, preferred_element_type=dtype, precision=P)
                l_ref[k0 + B :, k0 : k0 + B] = Lik
                trail = work[k0 + B :, k0 + B :]
                work[k0 + B :, k0 + B :] = trail - jnp.dot(
                    Lik, Lik.T, preferred_element_type=dtype, precision=P
                )
            # zero the upper-triangle blocks of this block-column's row
            if k0 > 0:
                l_ref[0:k0, k0 : k0 + B] = jnp.zeros((k0, B), dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def cholesky_blocked(A, interpret=None, block=128):
    """Lower Cholesky of one (N, N) SPD matrix via a blocked Pallas kernel.

    The BASELINE-pinned "blocked Cholesky factor" kernel: panel
    factorizations are vectorized column algorithms, panel solves and
    trailing (Schur) updates are MXU matmuls. N is padded to a multiple of
    ``block`` with identity (harmless for SPD inputs).
    """
    N = A.shape[0]
    dtype = A.dtype
    Np = _round_up(N, block)
    if Np != N:
        Ap = jnp.eye(Np, dtype=dtype)
        Ap = Ap.at[:N, :N].set(A)
    else:
        Ap = A
    kern = _chol_blocked_kernel_factory(Np, block, dtype)
    with _x64_off():
        L = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Np, Np), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((Np, Np), dtype)],
            interpret=_interpret(interpret),
        )(Ap)
    return L[:N, :N]


def _tri_solve_blocked_kernel_factory(N, M, B, dtype):
    """Blocked forward substitution: X = L^{-1} R for (N, M) right-hand sides."""
    nb = N // B
    P = jax.lax.Precision.HIGHEST

    def kernel(l_ref, r_ref, x_ref):
        for kb in range(nb):
            k0 = kb * B
            Lkk = l_ref[k0 : k0 + B, k0 : k0 + B]
            Ykk = _tri_inv_body(Lkk, B, dtype)
            acc = r_ref[k0 : k0 + B, :]
            if k0 > 0:
                Lrow = l_ref[k0 : k0 + B, 0:k0]  # (B, k0)
                Xprev = x_ref[0:k0, :]
                acc = acc - jnp.dot(Lrow, Xprev, preferred_element_type=dtype, precision=P)
            x_ref[k0 : k0 + B, :] = jnp.dot(
                Ykk, acc, preferred_element_type=dtype, precision=P
            )

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "block"))
def tri_solve_blocked(L, R, interpret=None, block=128):
    """X = L^{-1} R via the blocked Pallas forward-substitution kernel.

    The BASELINE-pinned "blocked solve": diagonal-block inverses are applied
    with MXU matmuls; off-diagonal contributions are block matmuls against
    already-solved rows. R: (N, M); N padded to a block multiple, M to 128.
    """
    N, M = R.shape
    dtype = L.dtype
    Np = _round_up(N, block)
    Mp = _round_up(M, 128)
    Lp = jnp.eye(Np, dtype=dtype).at[:N, :N].set(L)
    Rp = jnp.zeros((Np, Mp), dtype).at[:N, :M].set(R)
    kern = _tri_solve_blocked_kernel_factory(Np, Mp, block, dtype)
    with _x64_off():
        X = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((Np, Mp), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=_interpret(interpret),
        )(Lp, Rp)
    return X[:N, :M]


# ---------------------------------------------------------------------------
# Batch-major Cholesky — batched factorization with the batch in the lanes
# ---------------------------------------------------------------------------


def _chol_bm_kernel(a_ref, o_ref, work_ref):
    """Batch-major column Cholesky: block (N, N, T), batch in the LANES.

    XLA's batched Cholesky runs one custom call per matrix (serialized over
    the batch); here the batch occupies the 128-wide lane dimension, so each
    VPU lane factors a DIFFERENT problem and every update is a full-width
    vector op. Layout is column-leading: axis 0 indexes the COLUMN (the
    untiled dimension, where Mosaic supports dynamic ref slicing), axis 1
    the row (sublanes), axis 2 the batch (lanes). The column recursion is
    the textbook right-looking form; ``l`` is zeroed at rows ≤ j, making the
    rank-1 trailing update a single unmasked fused multiply-subtract
    (finalized columns and the pivot column see exact zeros). Mosaic cannot
    dynamically index VALUES, so the pivot A[j,j] comes out of the loaded
    column by a masked reduction, and per-column reads/writes go through the
    refs (leading-axis ``pl.ds``).
    """
    work_ref[...] = a_ref[...]
    n = a_ref.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)  # (N, 1)

    def body(j, _):
        colj = work_ref[pl.ds(j, 1)][0]  # (N, T): column j, rows in sublanes
        dj = jnp.sum(jnp.where(rows == j, colj, 0.0), axis=0)  # pivot (T,)
        d = jnp.sqrt(dj)
        col = colj / d[None, :]
        l = jnp.where(rows > j, col, 0.0)  # strictly-below-diagonal part
        o_ref[pl.ds(j, 1)] = (l + jnp.where(rows == j, d[None, :], 0.0))[None]
        work_ref[...] = work_ref[...] - l[:, None, :] * l[None, :, :]
        return 0

    jax.lax.fori_loop(0, n, body, 0)


def bm_supported(n: int, batch: int = None) -> bool:
    """Whether cholesky_batch_major covers (batch, n, n) within VMEM.

    The lane tile is fixed at 128 (Mosaic requires 128-divisible lane
    blocks), so the only budget knob is N. With one grid step (batch ≤ 128)
    the kernel holds in + out + scratch = 3 blocks; with a multi-step grid
    Pallas double-buffers the in/out blocks (5 live) — the budget shrinks
    accordingly. ``batch=None`` assumes the conservative multi-step case.
    """
    n_buffers = 3 if (batch is not None and batch <= 128) else 5
    n_pad = _round_up(max(n, 8), 8)
    return n_buffers * n_pad * n_pad * 4 * 128 <= 12 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def cholesky_batch_major(Ks, interpret=None):
    """Batched Cholesky with the batch in the lane dimension: (B, N, N) → L.

    float32. Padded rows of each matrix must follow the identity-pad
    convention (tpubq.ops.linalg.pad_gram) — they factor to identity. The
    batch is padded to the lane tile with identity matrices; N is padded to
    the sublane granularity (8) with identity diagonal.

    Measured (v5e, scan-differenced): ~0 µs at (100, 26, 26) vs 287 µs for
    XLA's batched Cholesky, 57 µs at (64, 76, 76) vs 540 µs (9.5×) — every
    update is a full-lane VPU op instead of one serialized custom call per
    matrix. Shapes beyond ``bm_supported`` (N ≳ 88 single-tile, ≳ 64 when
    the batch needs multiple 128-lane grid steps) fall back to
    ``jnp.linalg.cholesky``: Mosaic requires 128-divisible lane blocks, so
    the tile cannot shrink to fit VMEM. Non-PD matrices produce NaNs in
    their own lane only (sqrt of a negative pivot), which the jitter
    ladder's finiteness check consumes. A further ``vmap`` over this
    function maps the kernel over an extra grid dimension (jax's pallas
    batching rule) — tested compiled on TPU.
    """
    interpret = _interpret(interpret)
    B, N, N2 = Ks.shape
    if N != N2:
        raise ValueError(f"cholesky_batch_major needs square matrices; got {Ks.shape}")
    if Ks.dtype != jnp.float32:
        raise TypeError("cholesky_batch_major is float32-only")
    if not bm_supported(N, B):
        return jnp.linalg.cholesky(Ks)
    n_pad = _round_up(max(N, 8), 8)
    tile = 128
    b_pad = _round_up(max(B, tile), tile)

    # column-leading layout: A[c, r, b] = K[b, r, c] (symmetric input)
    A = jnp.transpose(Ks, (2, 1, 0))
    A = jnp.pad(A, ((0, n_pad - N), (0, n_pad - N), (0, b_pad - B)))
    # identity-fill the padded diagonal region (cols ≥ N of every lane, and
    # every col of the padded lanes) so no lane hits sqrt(0) spuriously
    idx = jnp.arange(n_pad)
    fill = jnp.logical_or(
        idx[:, None] >= N, jnp.arange(b_pad)[None, :] >= B
    )  # (n_pad, b_pad)
    A = A.at[idx, idx, :].add(jnp.where(fill, 1.0, 0.0))

    with _x64_off():
        out = pl.pallas_call(
            _chol_bm_kernel,
            out_shape=_out_struct((n_pad, n_pad, b_pad), jnp.float32, A),
            grid=(b_pad // tile,),
            in_specs=[
                pl.BlockSpec((n_pad, n_pad, tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)
            ],
            out_specs=pl.BlockSpec((n_pad, n_pad, tile), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n_pad, n_pad, tile), jnp.float32)],
            interpret=interpret,
        )(A)
    # out is column-leading: out[c, r, b] = L[b, r, c]
    return jnp.transpose(out[:N, :N, :B], (2, 1, 0))


# ---------------------------------------------------------------------------
# Fleet ESM: block-packed batched scorer (B problems × G candidates)
# ---------------------------------------------------------------------------
#
# The structural problem (VERDICT r2 #1): vmapping the single-problem ESM
# over a fleet materializes (B, nsc, G) intermediates in HBM — at B=64,
# G=1e4 that is ~285 MB of traffic per sweep (~520 µs measured on the v5e),
# so B=64 problems score at barely above the single-problem aggregate rate.
# The fix is the same trick cholesky_batch_major applied to factorization,
# adapted to the MXU: PACK the batch into the hardware tile. Each problem's
# K⁻¹ is only (nsc, nsc) with nsc ≈ 32 ≪ 128, so a lone problem uses ≤ 1/16
# of a 128×128 MXU pass; packing P = 128 // NPB problems block-diagonally
# into one (128, 128) operand makes every MXU pass full-tile (efficiency
# NPB/128 of peak — the zero off-diagonal blocks are the only waste, and
# that waste is the hardware floor for contractions this short). Everything
# per-candidate stays in VMEM: HBM traffic is the grid in and (B, G)-sized
# score components out.
#
# Two kernels, packed independently (the two GPs have different row counts,
# so each gets its own optimal packing):
#   * esm_fleet_l  — linear-GP side: builds the cross-kernel k, one packed
#     MXU solve application V = blockdiag(K⁻¹) @ k, segment reductions via a
#     selector matmul, the analytic ζ quad form, and emits the per-problem
#     affine coefficients (A, B) plus the degenerate mask.
#   * esm_fleet_tl — log-GP side: same structure for the posterior moments
#     (m_a, c_a) at the grid.
# The lognormal-moment combine is left to XLA (one fused elementwise pass
# over (B, G) arrays — exactly what XLA is best at).
#
# Reference anchor: bq_c.pyx::expected_squared_mean (the per-point scoring
# loop); the math matches acquire._esm_affine_terms exactly (same Schur /
# affine algebra, parity-tested against the vmapped XLA path).


def fleet_block_geometry(n_rows: int):
    """(NPB, P): padded per-problem row count and problems per 128-block.

    NPB is ``n_rows`` rounded up to a power-of-two divisor of 128 (8..128);
    returns None for n_rows > 128 (caller falls back to the vmapped path).
    """
    if n_rows > 128:
        return None
    npb = 8
    while npb < n_rows:
        npb *= 2
    return npb, 128 // npb


def _split_bf16(x):
    """f32 → (hi, lo) bf16 pair with hi + lo ≈ x to ~2^-16 relative.

    The split is done by BIT MASKING, not by a bf16 round-trip: the
    environment compiles with --xla_allow_excess_precision=true, under
    which the compiler elides convert(convert(x, bf16), f32) → x, so the
    naive ``lo = x - f32(bf16(x))`` folds to ZERO and the x3 correction
    silently disappears (measured: the "x3" path carried full single-pass
    2^-8 error). Masking the low mantissa bits produces a value the
    compiler cannot algebraically identify with x; the hi part is exactly
    bf16-representable (truncation), and the f32 subtraction is exact.
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32
    ).astype(x.dtype)
    hi = hi_f32.astype(jnp.bfloat16)  # exact: mantissa already truncated
    lo = (x - hi_f32).astype(jnp.bfloat16)
    return hi, lo


def _dot_bf16(Ah, k, dtype):
    """Single-pass bf16 matmul (the `fast` fleet mode): ~2^-8 (4e-3)
    relative error, 1/3 the MXU passes of the bf16x3 default."""
    return jnp.dot(Ah, k.astype(jnp.bfloat16), preferred_element_type=dtype,
                   precision=jax.lax.Precision.DEFAULT)


def _dot_bf16x3(Ah, Al, k, dtype):
    """3-pass bf16 matmul of a pre-split f32 LHS against an f32 RHS.

    Mosaic supports only DEFAULT (single-pass bf16) and HIGHEST (6-pass
    f32) dot precisions; HIGHEST measured ~2× the whole fleet-kernel budget.
    This is the classic x3 split: hi·hi + hi·lo + lo·hi in f32 accumulation,
    dropping only the lo·lo term → ~2^-16 (1.5e-5) relative error, which the
    fleet parity tests bound end-to-end. The LHS (the packed K⁻¹ blocks) is
    split OUTSIDE the kernel (it is grid-invariant); the RHS k is split
    per tile.
    """
    kh, kl = _split_bf16(k)
    # precision=DEFAULT explicitly: the package pins the global matmul
    # default to "highest", which for bf16 operands asks Mosaic for an
    # fp32 contract it cannot do ("Bad lhs type")
    D = jax.lax.Precision.DEFAULT
    acc = jnp.dot(Ah, kh, preferred_element_type=dtype, precision=D)
    acc = acc + jnp.dot(Ah, kl, preferred_element_type=dtype, precision=D)
    acc = acc + jnp.dot(Al, kh, preferred_element_type=dtype, precision=D)
    return acc


def _esm_fleet_l_kernel_factory(d, NPB, P, fast=False):
    """Linear-GP fleet scorer. Per grid step (nb, t): one problem-block of
    P problems against one tile of T grid points.

    Packed params p_ref (P, 16): [0] κ, [1] zᵀα, [2] ζ scale, [3+j] μ_j,
    [6+i*d+j] ½(W_l+Σ)⁻¹[i,j]. Scalars s_ref (1, 4) SMEM: [0] thresh,
    [1] f32 eps, [2] λ — the matmul-noise multiplier of the adaptive
    degenerate guard (see below).
    """

    def kernel(s_ref, p_ref, xa_ref, xsc_ref, w_ref, h2_ref, m_ref,
               Kh_ref, Kl_ref, Kabs_ref, uz_ref, al_ref, a_ref, b_ref, dg_ref):
        dtype = xsc_ref.dtype
        thresh = s_ref[0, 0]
        eps = s_ref[0, 1]
        lam = s_ref[0, 2]
        prm = p_ref[0]          # (P, 16) packed per-problem scalars
        xa = xa_ref[:]          # (d, T)
        xsc = xsc_ref[0]        # (128, d) packed rows
        w2i = w_ref[0]          # (128, d)
        m = m_ref[0]            # (128, 1)
        T = xa.shape[1]

        r2 = jnp.zeros((xsc.shape[0], T), dtype)
        if d == 1:
            # |dj| < thresh  ⇔  r2 = dj²·(0.5/w²) < thresh²·(0.5/w²):
            # the proximity test reuses r2, no |dj| accumulator needed
            dj = xsc[:, 0][:, None] - xa[0, :][None, :]
            r2 = (dj * dj) * w2i[:, 0][:, None]
            near_rows = r2 < (thresh * thresh) * w2i[:, 0][:, None]
        else:
            dmax = jnp.zeros((xsc.shape[0], T), dtype)
            for j in range(d):  # d ≤ 3, static — unrolled VPU passes
                dj = xsc[:, j][:, None] - xa[j, :][None, :]
                r2 = r2 + (dj * dj) * w2i[:, j][:, None]
                dmax = jnp.maximum(dmax, jnp.abs(dj))
            near_rows = dmax < thresh
        k = h2_ref[0] * jnp.exp(-r2) * m                       # (128, T)
        D = jax.lax.Precision.DEFAULT
        if fast:
            kh = k.astype(jnp.bfloat16)
            V = jnp.dot(Kh_ref[0], kh, preferred_element_type=dtype,
                        precision=D)
        else:
            kh, kl = _split_bf16(k)  # masked split — see _split_bf16
            V = jnp.dot(Kh_ref[0], kh, preferred_element_type=dtype, precision=D)
            V = V + jnp.dot(Kh_ref[0], kl, preferred_element_type=dtype, precision=D)
            V = V + jnp.dot(Kl_ref[0], kh, preferred_element_type=dtype, precision=D)
        # per-point roundoff amplification of the quadratic form: the packed
        # K⁻¹ has large cancelling entries for ill-conditioned Grams, so the
        # reduced-precision dot's error on s1 is ~unit-roundoff × Σ|K⁻¹||k|,
        # NOT × s1. One single-pass dot against |K⁻¹| bounds it exactly.
        E = jnp.dot(Kabs_ref[0], kh, preferred_element_type=dtype,
                    precision=jax.lax.Precision.DEFAULT)

        # segment reductions (per problem within the block) as VPU
        # reshape-sums: a (P, 128) selector MATMUL would cost a full MXU
        # stream each (stream time goes with K x N, independent of M = P),
        # i.e. 4 extra main-matmul-equivalents per instance — measured 3x
        # the whole kernel. The sublane-split reshape is free.
        def seg_sum(x):
            return jnp.sum(x.reshape(P, NPB, T), axis=1)

        s1 = seg_sum(k * V)
        zv = seg_sum(uz_ref[0] * k)
        ka = seg_sum(al_ref[0] * k)
        bound = seg_sum(k * E)  # Σ|k_i| (|K⁻¹||k|)_i — k ≥ 0 for gaussian
        near_ind = jnp.where(
            jnp.logical_and(near_rows, m > 0), 1.0, 0.0
        ).astype(dtype)
        nearP = jnp.max(near_ind.reshape(P, NPB, T), axis=1)

        kappa = prm[:, 0][:, None]                             # (P, 1)
        gam = kappa - s1
        # adaptive guard: a Schur complement smaller than the dot's own
        # roundoff (λ·bound) is unresolvable at this precision — such points
        # are effectively degenerate and short-circuit to (zᵀα)², their
        # limit value, instead of dividing by noise
        degen = jnp.logical_or(
            nearP > 0,
            gam <= jnp.maximum(eps * kappa, lam * bound),
        )

        # ζ(x_a) per problem: zc · exp(-½ (x_a-μ)ᵀ(W_l+Σ)⁻¹(x_a-μ))
        q = jnp.zeros((P, T), dtype)
        for i in range(d):
            dai = xa[i, :][None, :] - prm[:, 3 + i][:, None]    # (P, T)
            for j in range(d):
                daj = xa[j, :][None, :] - prm[:, 3 + j][:, None]
                q = q + prm[:, 6 + i * d + j][:, None] * dai * daj
        zeta = prm[:, 2][:, None] * jnp.exp(-q)

        B = (zeta - zv) / jnp.where(degen, 1.0, gam)
        A = prm[:, 1][:, None] - B * ka
        a_ref[0] = A
        b_ref[0] = B
        dg_ref[0] = degen.astype(dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "fast"))
def esm_fleet_l(scal, params, grid, xsc, w2inv, h2, msc, Kinv4, uz, alpha,
                interpret=None, tile=512, fast=False):
    """Packed linear-GP fleet scorer → (A, B, degen), each (NB*P, Gp).

    Shapes (NB = packed problem blocks, P problems each, NPB rows/problem):
    scal (1, 4) [thresh, eps, λ, 0] (λ = the adaptive degenerate guard's
    matmul-noise multiplier — see the kernel factory); params (NB, P, 16)
    packed per-problem scalars;
    grid (d, G); xsc (NB, 128, d); w2inv/h2/msc/uz/alpha (NB, 128, 1);
    Kinv4 (NB, 128, 128) block-diagonal. Returns tile-padded arrays — caller
    slices [:B, :G].
    """
    dtype = grid.dtype
    NB, _, d = xsc.shape
    P = params.shape[1]
    NPB = 128 // P
    G = grid.shape[1]
    Gp = _round_up(G, tile)
    g = jnp.tile(grid[:, -1:], (1, Gp)).at[:, :G].set(grid)
    Kh, Kl = _split_bf16(Kinv4)
    Kabs = jnp.abs(Kinv4).astype(jnp.bfloat16)

    with _x64_off():
        A, B, dg = pl.pallas_call(
            _esm_fleet_l_kernel_factory(d, NPB, P, fast),
            out_shape=(
                _out_struct((NB, P, Gp), dtype, g, xsc, Kinv4, alpha),
                _out_struct((NB, P, Gp), dtype, g, xsc, Kinv4, alpha),
                _out_struct((NB, P, Gp), dtype, g, xsc, Kinv4, alpha),
            ),
            grid=(NB, Gp // tile),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, P, 16), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, tile), lambda nb, t: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, d), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, d), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, 1), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, 1), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, 128), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, 128), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, 128), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, 1), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, 1), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, P, tile), lambda nb, t: (nb, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, tile), lambda nb, t: (nb, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, tile), lambda nb, t: (nb, 0, t),
                             memory_space=pltpu.VMEM),
            ),
            interpret=_interpret(interpret),
        )(scal, params, g, xsc, w2inv, h2, msc, Kh, Kl, Kabs, uz, alpha)
    return (A.reshape(NB * P, Gp), B.reshape(NB * P, Gp),
            dg.reshape(NB * P, Gp))


def _esm_fleet_tl_kernel_factory(d, NPB, P, fast=False):
    """Log-GP fleet moments: m_a (posterior mean) and c_a (posterior
    variance, clamped at 0) per problem per grid point. Packed params
    p_ref (P, 8): [0] h_tl² (the prior variance at x_a)."""

    def kernel(p_ref, xa_ref, xs_ref, w_ref, h2_ref, m_ref, Kh_ref,
               Kl_ref, al_ref, m_out, c_out):
        dtype = xs_ref.dtype
        prm = p_ref[0]          # (P, 8)
        xa = xa_ref[:]
        xs = xs_ref[0]
        w2i = w_ref[0]
        m = m_ref[0]
        T = xa.shape[1]

        r2 = jnp.zeros((xs.shape[0], T), dtype)
        for j in range(d):
            dj = xs[:, j][:, None] - xa[j, :][None, :]
            r2 = r2 + (dj * dj) * w2i[:, j][:, None]
        ktl = h2_ref[0] * jnp.exp(-r2) * m
        if fast:
            V = _dot_bf16(Kh_ref[0], ktl, dtype)
        else:
            V = _dot_bf16x3(Kh_ref[0], Kl_ref[0], ktl, dtype)


        def seg_sum(x):
            return jnp.sum(x.reshape(P, NPB, T), axis=1)

        quad = seg_sum(ktl * V)
        mean = seg_sum(al_ref[0] * ktl)
        c = jnp.maximum(prm[:, 0][:, None] - quad, 0.0)
        m_out[0] = mean
        c_out[0] = c

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret", "tile", "fast"))
def esm_fleet_tl(params, grid, xs, w2inv, h2, ms, Kinv4, alpha,
                 interpret=None, tile=512, fast=False):
    """Packed log-GP fleet moments → (m_a, c_a), each (NB*P, Gp)."""
    dtype = grid.dtype
    NB, _, d = xs.shape
    P = params.shape[1]
    NPB = 128 // P
    G = grid.shape[1]
    Gp = _round_up(G, tile)
    g = jnp.tile(grid[:, -1:], (1, Gp)).at[:, :G].set(grid)
    Kh, Kl = _split_bf16(Kinv4)

    with _x64_off():
        m_a, c_a = pl.pallas_call(
            _esm_fleet_tl_kernel_factory(d, NPB, P, fast),
            out_shape=(
                _out_struct((NB, P, Gp), dtype, g, xs, Kinv4, alpha),
                _out_struct((NB, P, Gp), dtype, g, xs, Kinv4, alpha),
            ),
            grid=(NB, Gp // tile),
            in_specs=[
                pl.BlockSpec((1, P, 8), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((d, tile), lambda nb, t: (0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, d), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, d), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, 1), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, 1), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, 128), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, 128), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 128, 1), lambda nb, t: (nb, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, P, tile), lambda nb, t: (nb, 0, t),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, P, tile), lambda nb, t: (nb, 0, t),
                             memory_space=pltpu.VMEM),
            ),
            interpret=_interpret(interpret),
        )(params, g, xs, w2inv, h2, ms, Kh, Kl, alpha)
    return m_a.reshape(NB * P, Gp), c_a.reshape(NB * P, Gp)
