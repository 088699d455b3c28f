"""Conditioned, masked linear algebra for GP factorizations.

Reference parity: ``bayesian_quadrature/bq_c.pyx::improve_covariance_conditioning``
and ``remove_jitter`` mutate a Gram matrix's diagonal in place until LAPACK's
Cholesky succeeds. That is the load-bearing numerics-hygiene subsystem of the
reference (candidates near observations make Grams near-singular). The
functional TPU equivalent here is:

  * ``pad_gram`` — embed a Gram over masked (padded) points so the padded
    rows/columns are exact identity; the Cholesky of the padded matrix then
    restricts to the Cholesky of the live submatrix (pads contribute zero to
    log-determinants and solves with zero-padded right-hand sides).
  * ``jitter_cholesky`` — a jitter *ladder*: escalate relative diagonal
    jitter (×100 per rung) inside ``lax.while_loop`` until the factor is
    finite. Used on estimation paths (no gradients needed).
  * ``cholesky_fixed`` — single factorization with a static base jitter, used
    on differentiated paths (``lax.while_loop`` is not reverse-differentiable).

Everything is batch-friendly: ``vmap`` over a leading axis gives the batched
Cholesky pipeline used by hyperparameter marginalization (BASELINE.json
config 5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import scipy as jsp

__all__ = [
    "pad_gram",
    "posdef_cholesky",
    "cholesky_fixed",
    "jitter_cholesky",
    "chol_solve",
    "tri_solve",
    "masked_logdet",
    "remove_jitter",
]

#: Relative jitter ladder (multiples of mean live diagonal). Mirrors the
#: escalation behavior of the reference's improve_covariance_conditioning.
JITTER_LADDER = (0.0, 1e-12, 1e-10, 1e-8, 1e-6, 1e-4, 1e-2)


def pad_gram(K: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Zero out padded rows/cols of a Gram matrix and set their diagonal to 1.

    If ``mask[i]`` is False, row/column i of the result is the i-th identity
    row/column. ``cholesky(pad_gram(K, m))`` equals the identity on padded
    rows/columns and the Cholesky factor of the live submatrix elsewhere
    (the live ordering is preserved, pads never mix in).
    """
    m = mask.astype(K.dtype)
    mm = m[:, None] * m[None, :]
    eye = jnp.eye(K.shape[0], dtype=K.dtype)
    return K * mm + eye * (1.0 - m)


def _diag_scale(K: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of the live diagonal — the reference scales jitter similarly."""
    m = mask.astype(K.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)
    return jnp.sum(jnp.diag(K) * m) / n


def cholesky_fixed(K: jnp.ndarray, mask: jnp.ndarray, jitter: float = 1e-12):
    """Single masked Cholesky with fixed relative jitter (differentiable)."""
    m = mask.astype(K.dtype)
    Kp = pad_gram(K, mask)
    Kp = Kp + jnp.eye(K.shape[0], dtype=K.dtype) * (jitter * _diag_scale(K, mask)) * m
    return jnp.linalg.cholesky(Kp)


#: Float32 ladder rungs (relative to the mean live diagonal). Two rungs
#: suffice in f32, by construction: (a) rungs below ~1e-6 round away when
#: added to an f32 diagonal (eps ≈ 1.2e-7), and (b) the kernel Gram is PSD,
#: so K + 1e-4·scale·I has λ_min ≥ 1e-4·scale — an order of magnitude above
#: the ~N·eps·scale level where f32 Cholesky starts failing (N ≤ ~1000).
#: Only non-finite inputs can fail both rungs, and those must report
#: ok=False, not get more jitter. Fewer rungs matter twice: each rung is a
#: serial ~12 µs on the single-problem critical path, and under vmap each
#: rung is a whole batched Cholesky (the fleet paths).
JITTER_LADDER_F32 = (0.0, 1e-4)


@jax.custom_batching.custom_vmap
def posdef_cholesky(A: jnp.ndarray) -> jnp.ndarray:
    """``jnp.linalg.cholesky`` with a TPU-aware batching rule.

    Unbatched it computes ``jnp.linalg.cholesky``, with one twist: a SMALL
    stacked input (R ≤ 4 leading axis — the f32 jitter-rung stack) is
    unrolled into R separate single-matrix factorizations. XLA's TPU
    stacked Cholesky pays a super-linear batch overhead at these sizes
    (measured v5e, benchmarks/chol_primitives.py: (2,64,64) 17.2 µs vs
    2 × 6.7 µs unrolled; (2,80,80) 25.7 vs 2 × 8.5) — on the single-problem
    active-loop refit that overhead was ~40% of the whole step's
    factorization cost. Larger stacks keep the one-call form (unrolling a
    100-matrix marginalize batch would explode the program).
    Under ``vmap`` (the fleet / marginalize paths), XLA's batched Cholesky
    serializes one custom call per matrix (measured v5e: 285 µs at
    (100,26,26), 540 µs at (64,76,76)); the batching rule dispatches
    instead to the batch-major Pallas kernel
    (``pallas_kernels.cholesky_batch_major``: batch in the VPU lanes — 10 µs
    and 59 µs at those shapes) when it applies: float32, on TPU, and the
    shape fits VMEM (``pallas_kernels.bm_supported``). A vmapped STACKED
    call — (B, R, n, n), from ``jitter_cholesky``'s f32 rung stack under
    fleet/marginalize vmap — flattens (B·R) into one batch-major round
    (the rung-stack experiment, PARITY addendum (k): one (2B) round costs
    1.07× a single-B round vs 1.83× for two sequential B rounds).
    Everything else falls through to XLA; nested vmap maps the kernel over
    an extra grid dimension.

    NOT differentiable-through under vmap (the Pallas kernel has no VJP);
    grad paths use ``cholesky_fixed``, which calls ``jnp.linalg.cholesky``
    directly. NaN behavior matches XLA: a non-PD matrix yields NaNs in its
    own batch entry only.
    """
    if A.ndim == 3 and A.shape[0] <= 4:
        return jnp.stack([jnp.linalg.cholesky(A[i]) for i in range(A.shape[0])])
    return jnp.linalg.cholesky(A)


def _bm_flat(A):
    """Route a flattened (BT, n, n) f32 stack to the batch-major kernel.

    Returns None when the kernel does not apply (caller falls back to XLA).
    When the multi-grid-step VMEM budget fails but a single 128-lane round
    fits, the stack is CHUNKED into ceil(BT/128) sequential rounds — e.g.
    a (B=256, n, n) stack that exceeds the 5-buffer budget runs as two
    3-buffer rounds of 128 in one dispatch chain."""
    from tpubq.ops import pallas_kernels as pk

    BT, n = A.shape[0], A.shape[-1]
    if not (A.dtype == jnp.float32 and BT >= 8 and pk.on_tpu()):
        return None
    if pk.bm_supported(n, BT):
        return pk.cholesky_batch_major(A)
    if pk.bm_supported(n, 128):
        chunks = [A[i : i + 128] for i in range(0, BT, 128)]
        return jnp.concatenate([pk.cholesky_batch_major(c) for c in chunks])
    return None


@posdef_cholesky.def_vmap
def _posdef_cholesky_vmap(axis_size, in_batched, A):
    del axis_size
    (a_batched,) = in_batched
    if not a_batched:
        return jnp.linalg.cholesky(A), False

    if A.ndim >= 4:
        # vmapped rung/pair stack (any nesting depth): fold ALL leading axes
        # into the batch and run batch-major rounds over the flat stack
        lead = A.shape[:-2]
        n = A.shape[-1]
        BT = 1
        for s in lead:
            BT *= s
        L = _bm_flat(A.reshape(BT, n, n))
        if L is not None:
            return L.reshape(A.shape), True
        return jnp.linalg.cholesky(A), True

    # NOTE nested vmap: a second vmap level re-enters this rule with the
    # outer axis hidden in the trace, so the kernel can be picked there too —
    # that is fine: vmap over the pallas_call maps it across an extra grid
    # dimension (verified compiled on TPU, test_pallas.py).
    if A.ndim == 3:
        L = _bm_flat(A)
        if L is not None:
            return L, True
    return jnp.linalg.cholesky(A), True


@jax.custom_batching.custom_vmap
def _jitter_chol_f32(Kp0: jnp.ndarray, eye_live: jnp.ndarray, j0, j1):
    """Two-rung f32 jitter Cholesky core → (L, jitter_used, ok).

    ``Kp0`` is the padded Gram ALREADY at rung 0 (callers skip the rung-0
    jitter add when ``base_jitter`` rounds away in f32 — a static choice);
    ``j0``/``j1`` are the two rungs' ABSOLUTE jitters (j0 reported even
    when its add was skipped, keeping GPState.jitter's contract).

    Unbatched (the single-problem active-loop refit): factor rung 0, then
    ``lax.cond`` into the 1e-4 refactorization ONLY when the rung-0
    diagonal is non-finite. Round 2 measured any per-refit cond at ~90 µs
    of pipeline stall and chose an unconditional 2-rung stack; re-measured
    round 5 (benchmarks/loop_variants2.py, v5e, 40-step loop): the
    cond-rescue step runs 80.2 µs vs the stack's 110.6 with bit-identical
    trajectories — the stall is gone on the current compiler, so the
    common case now pays ONE factorization.

    Under ``vmap`` (fleet / marginalize): ``lax.cond`` would degrade to
    executing BOTH branches per batch (select), as two sequential batched
    rounds — exactly the 1.83× the rung-stack fold beat (PARITY (k)). The
    batching rule therefore keeps the stacked form: one ``posdef_cholesky``
    call on a (B, 2, n, n) stack (folded into a single batch-major Pallas
    round on TPU) and pure data-flow selection.
    """
    L0 = jnp.linalg.cholesky(Kp0)
    # Diagonal-only finiteness: any non-finite L[i,j] (j<i) forces diag i
    # non-finite (its pivot subtracts L[i,j]², and inf²/NaN both poison
    # the sqrt), so the (n,) diagonal detects every failure the full
    # (n, n) reduce did at ~n× less data.
    ok0 = jnp.all(jnp.isfinite(jnp.diagonal(L0)))

    def keep(_):
        return L0, j0, jnp.asarray(True)

    def rescue(_):
        L1 = jnp.linalg.cholesky(Kp0 + eye_live * (j1 - j0))
        return L1, j1, jnp.all(jnp.isfinite(jnp.diagonal(L1)))

    return jax.lax.cond(ok0, keep, rescue, None)


@_jitter_chol_f32.def_vmap
def _jitter_chol_f32_vmap(axis_size, in_batched, Kp0, eye_live, j0, j1):
    kb, eb, j0b, j1b = in_batched
    dtype = Kp0.dtype
    n = Kp0.shape[-1]
    # Broadcast unbatched operands up front so the stack algebra is uniform.
    if not kb:
        Kp0 = jnp.broadcast_to(Kp0, (axis_size,) + Kp0.shape)
    if not eb:
        eye_live = jnp.broadcast_to(eye_live, (axis_size,) + eye_live.shape)
    j0 = jnp.broadcast_to(jnp.asarray(j0, dtype), (axis_size,))
    j1 = jnp.broadcast_to(jnp.asarray(j1, dtype), (axis_size,))
    # Rung STACK, not a rung loop: both jittered copies factor in ONE
    # posdef_cholesky call on a (B, 2, n, n) stack — one batch-major Pallas
    # round over 2B matrices instead of two sequential B-rounds (measured
    # v5e, B=64 n=48: 21.3 µs vs 36.5 µs per refit round, bit-identical
    # selection — benchmarks/rung_stack.py, PARITY addendum (k)).
    K1 = Kp0 + eye_live * (j1 - j0)[:, None, None]
    Ks = jnp.stack([Kp0, K1], axis=1)  # (B, 2, n, n)
    # Fold the (B, 2) leading axes into one flat batch-major round — the
    # same dispatch posdef_cholesky's own vmap rule applies (calling
    # posdef_cholesky here would hit its PRIMAL on an already-batched
    # array: XLA's serialized per-matrix custom calls).
    flat = Ks.reshape(axis_size * 2, n, n)
    Lf = _bm_flat(flat)
    if Lf is None:
        Lf = jnp.linalg.cholesky(flat)
    Ls = Lf.reshape(Ks.shape)
    dg = jnp.diagonal(Ls, axis1=-2, axis2=-1)  # (B, 2, n)
    ok_r = jnp.all(jnp.isfinite(dg), axis=-1)  # (B, 2)
    ok0, ok1 = ok_r[:, 0], ok_r[:, 1]
    pick0 = ok0[:, None, None]
    L = jnp.where(pick0, Ls[:, 0], Ls[:, 1])
    jit_used = jnp.where(ok0, j0, j1)
    ok = jnp.logical_or(ok0, ok1)
    return (L, jit_used, ok), (True, True, True)


def jitter_cholesky(K: jnp.ndarray, mask: jnp.ndarray, base_jitter: float = 0.0):
    """Masked Cholesky with an escalating jitter ladder.

    Returns ``(L, jitter_used, ok)``: the factor at the first finite rung
    (rungs are relative to the mean live diagonal), the jitter applied, and
    whether any rung succeeded. Functional analogue of
    bq_c.pyx::improve_covariance_conditioning. Not reverse-differentiable;
    use ``cholesky_fixed`` under ``jax.grad``.

    Two implementations, dispatched on dtype (TPU latency measurements,
    v5e active-loop refit at N=64, see PARITY.md):

    * float64 — ``lax.while_loop`` over the fine 7-rung ladder (CPU parity
      path; early exit costs nothing on CPU).
    * float32 — the TPU hot path, via ``_jitter_chol_f32``: unbatched it
      factors rung 0 and ``lax.cond``s into the 1e-4 rescue only on
      failure (round-5 re-measurement: 80.2 vs 110.6 µs/step, identical
      values); under vmap (fleet / marginalize) it keeps the round-4
      unconditional (B, 2, n, n) rung stack with data-flow selection,
      because a vmapped cond executes both branches as two sequential
      batched rounds. Two rungs cover f32 exactly — see
      ``JITTER_LADDER_F32``.
    """
    dtype = K.dtype
    scale = _diag_scale(K, mask)
    Kp = pad_gram(K, mask)
    eye_live = jnp.eye(K.shape[0], dtype=dtype) * mask.astype(dtype)

    if dtype == jnp.float32:
        j0 = jnp.asarray(base_jitter, dtype) * scale
        j1 = (jnp.asarray(JITTER_LADDER_F32[1], dtype)
              + jnp.asarray(base_jitter, dtype)) * scale
        # The rung-0 add is skipped when base_jitter rounds away against an
        # f32 diagonal (any base below ~1e-8·diag is a numerical no-op —
        # eps32 ≈ 1.2e-7); base_jitter is a static float, so this is a
        # trace-time choice, and j0 is still REPORTED for the first rung.
        Kp0 = Kp if base_jitter < 1e-8 else Kp + eye_live * j0
        return _jitter_chol_f32(Kp0, eye_live, j0, j1)

    ladder = jnp.asarray(JITTER_LADDER, dtype=dtype) + jnp.asarray(base_jitter, dtype)

    def attempt(i):
        L = jnp.linalg.cholesky(Kp + eye_live * (ladder[i] * scale))
        ok = jnp.all(jnp.isfinite(L))
        return L, ok

    def cond(carry):
        i, _, ok = carry
        return jnp.logical_and(~ok, i < len(JITTER_LADDER) - 1)

    def body(carry):
        i, _, _ = carry
        L, ok = attempt(i + 1)
        return i + 1, L, ok

    L0, ok0 = attempt(0)
    i, L, ok = jax.lax.while_loop(cond, body, (jnp.asarray(0), L0, ok0))
    return L, ladder[i] * scale, ok


def tri_solve(L: jnp.ndarray, b: jnp.ndarray, lower: bool = True) -> jnp.ndarray:
    return jsp.linalg.solve_triangular(L, b, lower=lower)


def chol_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve K x = b given K = L L^T."""
    return jsp.linalg.cho_solve((L, True), b)


def masked_logdet(L: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """log|K_live| from the padded factor (pads have L_ii = 1 → contribute 0)."""
    d = jnp.diag(L)
    return 2.0 * jnp.sum(jnp.log(jnp.where(mask, d, 1.0)))


def remove_jitter(K: jnp.ndarray, jitter, mask: jnp.ndarray) -> jnp.ndarray:
    """Subtract previously applied diagonal jitter from the live block.

    Functional analogue of bq_c.pyx::remove_jitter. In this framework
    conditioning never mutates the stored Gram (``jitter_cholesky`` returns
    the jitter it applied), so this exists for reference-parity workflows
    that reconstruct the unconditioned matrix.
    """
    m = mask.astype(K.dtype)
    return K - jnp.eye(K.shape[0], dtype=K.dtype) * jnp.asarray(jitter, K.dtype) * m


@partial(jax.jit, static_argnames=())
def batched_cholesky(Ks: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """vmapped fixed-jitter Cholesky over a leading batch axis."""
    return jax.vmap(cholesky_fixed)(Ks, masks)
