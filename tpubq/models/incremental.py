"""Incremental (rank-1 / block-Woodbury) observation updates.

Reference parity note: the reference's ``bq.py::BQ.add_observation`` refits
both GPs from scratch — a full Gram rebuild + LAPACK Cholesky (O(N³)) per
added point. On TPU that refit is *latency*-bound, not FLOP-bound: the
multi-right-hand-side triangular solves behind ``K⁻¹`` cost ~40 µs each at
N=128 regardless of FLOPs, and the jitter-ladder ``while_loop`` adds ~13 µs
(measured on v5e, see PARITY.md). This module replaces the refit with exact
incremental algebra whose primitives are outer products and matvecs — ops
the TPU pipeline executes in ~0 µs:

  * ``gp_border_add`` — a new observation slot flips dead → live. The padded
    Gram gains one bordered row/col, so the Cholesky factor gains one row
    (``[vᵀ, √s]`` with v = L⁻¹k) and K⁻¹ updates by a single symmetric
    rank-1 term. The key TPU trick: v = L⁻¹k = Lᵀ(K⁻¹k), a *matvec* with the
    cached inverse — no triangular solve anywhere in the update.
  * ``delete_candidate_slots_kinv`` — candidate slots flip live → dead when
    the new observation lands within ``candidate_thresh`` of them. Deleting
    a slot set J from K⁻¹ is the block-Woodbury identity
    ``K⁻¹ − K⁻¹[:,J] (K⁻¹[J,J])⁻¹ K⁻¹[J,:]`` — one (n_candidate ×
    n_candidate) solve instead of an O(N³) refactorization.
  * ``add_observation_fast`` — the full ``add_observation`` state transition
    (slot write, candidate re-filtering, linearization-anchor refresh, both
    GP updates) built from the two primitives, with a ``lax.cond`` fallback
    to the exact full refit (``bq._fit_gps``) whenever the incremental
    algebra does not apply:

      - the new point extends the observed range (candidate *positions*
        move, invalidating every cached Gram entry),
      - the Schur complement of the bordered row is non-positive
        (duplicate/degenerate location — the reference's conditioning
        territory),
      - the observation capacity is exhausted (slot overwrite),
      - every ``refresh_every``-th step (float32 drift control: the
        incremental algebra is exact in exact arithmetic, but rank-1
        updates accumulate roundoff; a periodic fresh factorization
        bounds it).

    The linear GP's Cholesky factor cannot be maintained by bordering
    (candidate slots interleave after the observation block, and mask
    deletions would need downdates), so the fast path recomputes it with
    one fixed-jitter Cholesky (~6 µs) — K⁻¹ and α still come from the
    Woodbury updates, avoiding the expensive multi-RHS solve.

Exactness: both primitives are algebraically exact (not approximations), so
in float64 a fast-path ``add_observation_fast`` matches the full refit to
roundoff (tested at 1e-9). The fallback keeps the escalating jitter ladder
for the hard cases.

MEASURED VERDICT (rounds 2–3, v5e f32, RTT-amortized closed loops —
benchmarks/large_n.py): the win region is a WINDOW, not "large N".
µs/step refit vs incremental: 64: 136/152 · 96: 94/110 · **128: 193/140
(1.38×)** · **192: 214/199 (1.07×)** · 256: 297/317 · 512: 602/721 ·
1024: 1450/1798. Below the window the step is dispatch-latency-bound and
this path's longer small-op chain + ``lax.cond`` sync cost more than the
FLOPs it saves. Inside the window (the live set just crossing the 128-row
MXU tile) the refit's multi-RHS K⁻¹ solve jumps in cost and the bordered
update dodges it. ABOVE the window the old "large-max_obs payoff" claim is
measured FALSE: the fast path still recomputes the linear GP's Cholesky
every step (bordering cannot track interleaved candidate deletions), so
both paths are O(N³) and XLA's fused refit has the better constant.
``run_active_loop(incremental="auto")`` (the default) applies this table
via ``incremental_auto``; pass True/False to override.

Do NOT use under ``vmap`` (fleet paths): ``lax.cond`` lowers to ``select``
under batching, executing *both* branches — the full refit then runs every
step anyway. ``models/batched.py`` keeps the plain refit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpubq.models import gp as gpm
from tpubq.models.bq import (
    BQState,
    _fit_gps,
    inv_log_transform,
    live_bounds,
    log_transform,
)
from tpubq.ops import linalg
from tpubq.ops.kernels import get_kernel
from tpubq.utils.options import BQOptions

__all__ = [
    "gp_border_add",
    "delete_candidate_slots_kinv",
    "add_observation_fast",
    "incremental_auto",
    "INCREMENTAL_AUTO_WINDOW",
]

#: max_obs window where the incremental path beats the full refit,
#: measured on the v5e (f32 closed loops — module docstring table; wins
#: pinned at 128 and 192, losses at 96 and 256; bounds split the measured
#: points). Re-measure with benchmarks/large_n.py when kernels change.
INCREMENTAL_AUTO_WINDOW = (112, 224)


def incremental_auto(max_obs: int) -> bool:
    """Resolve ``incremental="auto"``: True iff ``max_obs`` is inside the
    measured win window (see INCREMENTAL_AUTO_WINDOW)."""
    lo, hi = INCREMENTAL_AUTO_WINDOW
    return lo <= max_obs < hi



def gp_border_add(
    kfn, kdiagfn, gp: gpm.GPState, i, x_new, y_new,
    update_L: bool, update_alpha: bool = True,
):
    """Flip slot ``i`` of a padded GP from dead to live — exact bordering.

    ``x_new``/``y_new`` are the *updated* full arrays (slot ``i`` already
    written; ``y_new`` zero at dead slots). Returns ``(gp', s_schur, κ)``
    where ``s_schur`` is the bordered Schur complement — the caller must
    treat the update as invalid (and fall back) unless ``s_schur`` is safely
    positive.

    ``update_L=True`` additionally appends the bordered Cholesky row, which
    is only valid when every live slot index is < ``i`` (true for the
    observation GP, whose live set is the prefix 0..ns-1; NOT true for the
    combined obs∪candidate GP, where live candidates sit above ``i``).
    ``update_alpha=False`` returns the STALE ``alpha`` — for callers that
    immediately recompute it against a further-updated K⁻¹ (the linear GP in
    add_observation_fast), where the matvec here would be dead compute.
    """
    dtype = x_new.dtype
    n = x_new.shape[0]
    mask_old = gp.mask  # slot i dead here
    m_old = mask_old.astype(dtype)

    k = kfn(gp.theta, x_new, jax.lax.dynamic_slice_in_dim(x_new, i, 1))[:, 0] * m_old
    kappa = kdiagfn(gp.theta, jax.lax.dynamic_slice_in_dim(x_new, i, 1))[0]
    kappa = kappa + gp.s * gp.s + gp.jitter
    u = gp.Kinv @ k
    s_schur = kappa - jnp.dot(k, u)

    e_i = jax.nn.one_hot(i, n, dtype=dtype)
    safe_s = jnp.maximum(s_schur, jnp.asarray(jnp.finfo(dtype).tiny, dtype))
    w = u - e_i
    Kinv = gp.Kinv - jnp.outer(e_i, e_i) + jnp.outer(w, w) / safe_s

    if update_L:
        # v = L⁻¹k = Lᵀ(K⁻¹k) = Lᵀu — matvec with the cached inverse, no
        # triangular solve. New factor row i is [vᵀ, √s] (pads stay identity).
        v = gp.L.T @ u
        row = v * (1.0 - e_i) + jnp.sqrt(safe_s) * e_i
        L = gp.L * (1.0 - e_i)[:, None] + jnp.outer(e_i, row)
    else:
        L = gp.L  # caller refreshes it (bordering invalid for this layout)

    mask = jnp.logical_or(mask_old, e_i.astype(bool))
    ym = jnp.where(mask, y_new, 0.0)
    alpha = Kinv @ ym if update_alpha else gp.alpha
    ok = jnp.logical_and(gp.ok, jnp.isfinite(s_schur))
    return (
        gpm.GPState(gp.theta, gp.s, x_new, ym, mask, L, alpha, Kinv, gp.jitter, ok),
        s_schur,
        kappa,
    )


def delete_candidate_slots_kinv(Kinv, flip_cand, n_obs: int):
    """Flip a set of candidate slots live → dead in K⁻¹ (block Woodbury).

    ``flip_cand``: (n_candidate,) bool over the candidate block (slots
    ``n_obs:``) — True for currently-live slots being deleted. Non-flipped
    slots pass through untouched (the masked identity-block trick makes the
    (nc × nc) solve select exactly the flipped rows). Exact: rows/cols of
    deleted slots return to identity, the live block becomes the inverse of
    the Gram with those rows removed.
    """
    dtype = Kinv.dtype
    n = Kinv.shape[0]
    f = flip_cand.astype(dtype)
    C = Kinv[:, n_obs:]  # (n, nc)
    Kcc = Kinv[n_obs:, n_obs:]  # (nc, nc)
    nc = C.shape[1]
    M = Kcc * jnp.outer(f, f) + jnp.diag(1.0 - f)
    G = C * f[None, :]
    upd = G @ jnp.linalg.solve(M, G.T)  # (n, n)
    flip_full = jnp.concatenate([jnp.zeros((n_obs,), dtype), f])
    return Kinv - upd + jnp.diag(flip_full)


def _enforce_pad_pattern(Kinv, mask):
    """Clamp K⁻¹ to its padded sparsity pattern: identity at dead slots.

    The Woodbury updates leave exact zeros there only in exact arithmetic;
    clamping kills float32 drift into dead rows (which downstream masked
    matvecs would otherwise pick up)."""
    m = mask.astype(Kinv.dtype)
    eye = jnp.eye(Kinv.shape[0], dtype=Kinv.dtype)
    return Kinv * jnp.outer(m, m) + eye * (1.0 - m)


def add_observation_fast(
    state: BQState,
    opts: BQOptions,
    x_a,
    l_a,
    refresh_every: int = 16,
) -> BQState:
    """``add_observation`` via exact incremental updates, with full-refit
    fallback (see module docstring). Semantically identical to
    ``acquire.add_observation``.

    Measured verdict (v5e, f32, max_obs=64, RTT-amortized 40-step loops):
    152 µs/step vs the full refit's 136 µs/step — the step is dispatch-
    latency-bound, and this path's longer small-op chain plus the
    ``lax.cond`` sync cost more than the O(N³)→O(N²) FLOP saving at
    reference sizes. It therefore stays OPT-IN
    (``run_active_loop(incremental=True)``); the crossover regime is large
    ``max_obs``, where the refit's multi-RHS K⁻¹ solve grows cubically
    while this path stays at matvecs + one factorization.

    ``refresh_every``: force a full (ladder) refit whenever the new live
    count is a multiple of this — bounds float32 roundoff accumulation.
    Exactness in float64 makes any value safe there.
    """
    if refresh_every < 1:
        # static int — a free Python check; 0 would trace a mod-by-zero and
        # silently corrupt the refresh guard (ADVICE r2)
        raise ValueError(f"refresh_every must be >= 1, got {refresh_every}")
    kfn, kdiagfn = get_kernel(opts.kernel)
    dtype = state.x_s.dtype
    d = state.x_s.shape[1]
    x_a = jnp.asarray(x_a, dtype).reshape((d,))
    l_a = jnp.asarray(l_a, dtype).reshape(())

    i = jnp.minimum(state.ns, opts.max_obs - 1)
    has_room = state.ns < opts.max_obs

    # --- candidate positions move iff the live range extends (positions are
    # a pure function of the live bounding box — bq.live_bounds is the
    # single source of truth shared with choose_candidates) ----------------
    lo, hi = live_bounds(state.x_s, state.obs_mask)
    inside = jnp.logical_and(jnp.all(x_a >= lo), jnp.all(x_a <= hi))

    # --- slot write (shared by both branches) ------------------------------
    tl_a = log_transform(l_a, state.gamma)
    st0 = state._replace(
        x_s=state.x_s.at[i].set(x_a),
        l_s=state.l_s.at[i].set(l_a),
        tl_s=state.tl_s.at[i].set(tl_a),
        # obs_mask stays OLD here: the fast path borders against it; the
        # fallback's _fit_gps only needs the final mask, set below.
        ns=jnp.minimum(state.ns + 1, opts.max_obs),
    )
    new_obs_mask = state.obs_mask.at[i].set(True)

    # --- fast path: log-GP bordering ---------------------------------------
    gp_tl, s_tl, kap_tl = gp_border_add(
        kfn, kdiagfn, state.gp_log_l._replace(x=st0.x_s, mask=state.obs_mask),
        i, st0.x_s, st0.tl_s, update_L=True,
    )

    # --- candidates: same positions, mask can only shrink ------------------
    dist = jnp.max(jnp.abs(state.x_c - x_a[None, :]), axis=-1)
    near = dist < opts.candidate_thresh
    flip = jnp.logical_and(state.c_mask, near)
    c_mask = jnp.logical_and(state.c_mask, jnp.logical_not(near))
    l_c = jnp.where(c_mask, inv_log_transform(gpm.gp_mean(kfn, gp_tl, state.x_c), state.gamma), 0.0)

    # --- linear GP: Woodbury-delete flips, border-add the obs slot ---------
    x_sc = jnp.concatenate([st0.x_s, state.x_c], axis=0)
    l_sc = jnp.concatenate([jnp.where(new_obs_mask, st0.l_s, 0.0), l_c], axis=0)
    mask_mid = jnp.concatenate([state.obs_mask, c_mask], axis=0)
    Kinv_mid = delete_candidate_slots_kinv(state.gp_l.Kinv, flip, opts.max_obs)
    gp_l_mid = state.gp_l._replace(x=x_sc, mask=mask_mid, Kinv=Kinv_mid)
    gp_l, s_l, kap_l = gp_border_add(
        kfn, kdiagfn, gp_l_mid, i, x_sc, l_sc, update_L=False, update_alpha=False
    )
    sc_mask = gp_l.mask
    Kinv_l = _enforce_pad_pattern(gp_l.Kinv, sc_mask)
    # Fresh factor (bordering can't track interleaved deletions); Gram must
    # match the one the Woodbury updates inverted: kernel + (s² + jitter)
    # on the live diagonal, identity at pads.
    eye = jnp.eye(x_sc.shape[0], dtype=dtype)
    m_sc = sc_mask.astype(dtype)
    K_l = kfn(gp_l.theta, x_sc, x_sc) + eye * (gp_l.s * gp_l.s) * m_sc
    L_l = jnp.linalg.cholesky(linalg.pad_gram(K_l, sc_mask) + eye * gp_l.jitter * m_sc)
    alpha_l = jnp.where(sc_mask, Kinv_l @ jnp.where(sc_mask, l_sc, 0.0), 0.0)
    gp_l = gp_l._replace(L=L_l, Kinv=Kinv_l, alpha=alpha_l)

    # Schur guard: √eps·κ caps the bordered system's effective condition
    # number at ~1/√eps (1e8 in f64, 3e3 in f32) — below that the rank-1
    # inverse update amplifies roundoff; near-duplicates (Schur → jitter)
    # must take the full-refit ladder instead. Active-loop points sit at
    # least candidate_thresh apart (the ESM degenerate mask), whose Schur is
    # O(κ), so the guard never fires on the hot path.
    guard = jnp.sqrt(jnp.asarray(jnp.finfo(dtype).eps, dtype))
    fast_ok = jnp.all(
        jnp.stack(
            [
                has_room,
                inside,
                s_tl > guard * kap_tl,
                s_l > guard * kap_l,
                jnp.all(jnp.isfinite(jnp.diagonal(L_l))),
                jnp.all(jnp.isfinite(gp_tl.L[i])),
                st0.ns % refresh_every != 0,
                state.gp_log_l.ok,
                state.gp_l.ok,
            ]
        )
    )

    fast_state = st0._replace(
        obs_mask=new_obs_mask,
        l_c=l_c,
        c_mask=c_mask,
        gp_log_l=gp_tl,
        gp_l=gp_l,
    )

    def _full(_):
        return _fit_gps(st0._replace(obs_mask=new_obs_mask), opts, ladder=True)

    return jax.lax.cond(fast_ok, lambda _: fast_state, _full, None)
