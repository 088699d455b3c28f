"""Adaptive-guard cost experiment: can the Schur-noise guard's per-point
reduce be folded into the K⁻¹ GEMM?

Context (PARITY.md addendum (h)): the f32 ESM hot path floors γ_s at the
matmul-free majorant λ·ρ·κ·‖k‖₁. The ‖k‖₁ colsum is one extra pass over
the (nsc × na) k_a panel — k_a feeds the K⁻¹ matmul, and matmul operands
cannot host fused consumers, so XLA materializes a second read. Measured
cost: ~8–10% of the headline (9.6 → ~7.9e8 points/s).

Hypothesis: every built-in kernel (gaussian / matern / rq / periodic) is
POSITIVE-valued and the padded slots are exact zeros, so ‖k‖₁ = Σk = 1ᵀk —
appending a ones-row to K⁻¹ turns the colsum into one extra GEMM output
row ((max_obs+1) rows pad to the next sublane multiple; +1 row on a
padded-64 Gram costs ~1 extra sublane tile vs a whole extra k_a pass).

Variants timed (same scan-differencing as bench.py's headline):
  prod   — production _esm_affine_terms (separate |k| colsum reduce)
  fused  — ones-row-augmented GEMM, colsum as the GEMM's last output row
  nosum  — Σk without abs, still a separate reduce (isolates the abs cost)
  none   — eps·κ floor only (the pre-guard ceiling; NOT safe, ceiling only)

Outcome: the `nosum` form (Σk without abs — exact because every registered
kernel is positive-valued and padded slots are exact zeros) landed in
production `_esm_affine_terms`; `prod` below still times the ORIGINAL
abs-colsum strategy for the record. CPU measurement: nosum at 99.5% of the
no-guard ceiling, bitwise-identical scores.

Usage: python benchmarks/guard_fusion.py [--grid 10000] [--max-obs 16]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def _enable_compile_cache():
    from tpubq.utils.profiling import enable_compile_cache

    enable_compile_cache()


def _affine_terms_variant(state, opts, x_a, mode):
    """_esm_affine_terms with a switchable guard strategy (f32/Kinv path
    only — the experiment targets the TPU hot path)."""
    import jax.numpy as jnp

    from tpubq.models.acquire import _LAM_F32
    from tpubq.models.bq import int_K_measure
    from tpubq.ops.kernels import get_kernel

    kfn, kdiagfn = get_kernel(opts.kernel)
    dtype = state.x_s.dtype
    assert dtype == jnp.float32, "experiment targets the f32 Kinv path"
    m_sc = state.sc_mask
    gp_l = state.gp_l
    alpha = gp_l.alpha

    z = int_K_measure(state, opts, gp_l.theta, state.x_sc) * m_sc.astype(dtype)
    zeta = int_K_measure(state, opts, gp_l.theta, x_a)
    zTalpha = jnp.dot(z, alpha)

    k_a = kfn(gp_l.theta, state.x_sc, x_a) * m_sc.astype(dtype)[:, None]
    kappa = kdiagfn(gp_l.theta, x_a) + gp_l.s * gp_l.s + gp_l.jitter

    if mode == "fused":
        ones_row = jnp.ones((1, gp_l.Kinv.shape[1]), dtype)
        vk = jnp.concatenate([gp_l.Kinv, ones_row], axis=0) @ k_a
        v, k1 = vk[:-1], vk[-1]
    else:
        v = gp_l.Kinv @ k_a
        k1 = None
    gam_s = kappa - jnp.sum(k_a * v, axis=0)

    dist = jnp.max(jnp.abs(x_a[:, None, :] - state.x_sc[None, :, :]), axis=-1)
    too_close = jnp.any(jnp.logical_and(dist < opts.candidate_thresh, m_sc[None, :]), axis=1)
    eps = jnp.asarray(jnp.finfo(dtype).eps, dtype)
    gam_floor = eps * kappa
    if mode != "none":
        rho = jnp.max(jnp.sum(jnp.abs(gp_l.Kinv), axis=1))
        if mode == "prod":
            k1 = jnp.sum(jnp.abs(k_a), axis=0)
        elif mode == "nosum":
            k1 = jnp.sum(k_a, axis=0)
        gam_floor = jnp.maximum(gam_floor, (_LAM_F32 * rho) * kappa * k1)
    degenerate = jnp.logical_or(too_close, gam_s <= gam_floor)
    safe_gam = jnp.where(degenerate, 1.0, gam_s)

    B = (zeta - z @ v) / safe_gam
    A = zTalpha - B * (k_a.T @ alpha)

    import tpubq.models.gp as gpm

    gp_tl = state.gp_log_l
    m_a = gpm.gp_mean(kfn, gp_tl, x_a)
    k_tl = kfn(gp_tl.theta, x_a, gp_tl.x) * gp_tl.mask.astype(dtype)[None, :]
    c_a = kdiagfn(gp_tl.theta, x_a) - jnp.sum((k_tl @ gp_tl.Kinv) * k_tl, axis=1)
    c_a = jnp.maximum(c_a, 0.0)
    return A, B, degenerate, zTalpha, m_a, c_a


def esm_variant(state, opts, x_a, mode):
    import jax.numpy as jnp

    from tpubq.models.acquire import _lognormal_moments, as_points

    x_a = as_points(jnp.asarray(x_a, state.x_s.dtype), opts.dim)
    A, B, degenerate, zTalpha, m_a, c_a = _affine_terms_variant(state, opts, x_a, mode)
    E1, E2 = _lognormal_moments(m_a, c_a, state.gamma)
    esm = A * A + 2.0 * A * B * E1 + B * B * E2
    return jnp.where(degenerate, zTalpha * zTalpha, esm)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--grid", type=int, default=10_000)
    p.add_argument("--max-obs", type=int, default=16)
    p.add_argument("--reps", type=int, default=7)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="cpu skips the axon tunnel (which can hang init "
                        "when wedged); default uses the ambient platform")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    _enable_compile_cache()
    import jax.numpy as jnp
    from scipy import stats

    import tpubq  # noqa: F401
    from tpubq.models import acquire, bq as bqm
    from tpubq.utils.options import BQOptions

    platform = jax.devices()[0].platform
    print(f"platform={platform} grid={args.grid} max_obs={args.max_obs}")

    opts = BQOptions(
        n_candidate=12, candidate_thresh=0.2, max_obs=args.max_obs, dtype="float32"
    )
    x = np.linspace(-2.2, 2.2, 10)
    l = stats.norm.pdf(x, 0.2, 0.5)
    state = bqm.init_state(
        x, l, opts, params_tl=(0.7, 0.8), params_l=(0.3, 0.4),
        x_mean=[0.0], x_var=[[1.0]],
    )
    grid = jnp.asarray(np.linspace(-4, 4, args.grid), opts.np_dtype)[:, None]

    # parity: every guarded variant must match production exactly-ish
    ref = np.asarray(acquire.expected_squared_mean(state, opts, grid))
    for mode in ("prod", "fused", "nosum"):
        got = np.asarray(esm_variant(state, opts, grid, mode))
        rel = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1e-30))
        print(f"parity {mode:6s}: max rel {rel:.2e}")
        assert rel < 1e-5, (mode, rel)

    def run(mode, n, reps):
        def body(eps, _):
            gp_l = state.gp_l._replace(
                L=state.gp_l.L * (1.0 + eps),
                alpha=state.gp_l.alpha * (1.0 + eps),
                Kinv=state.gp_l.Kinv * (1.0 + eps),
            )
            gp_tl = state.gp_log_l._replace(
                alpha=state.gp_log_l.alpha * (1.0 + eps),
                Kinv=state.gp_log_l.Kinv * (1.0 + eps),
            )
            st = state._replace(gp_l=gp_l, gp_log_l=gp_tl)
            sc = esm_variant(st, opts, grid + eps, mode)
            return eps + 1e-30 * jnp.mean(sc), jnp.sum(sc)

        f = jax.jit(lambda e: jax.lax.scan(body, e, None, length=n))
        eps0 = jnp.asarray(0.0, opts.np_dtype)
        jax.block_until_ready(f(eps0))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(eps0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    n_short, n_long = 16, 2064
    base = None
    for mode in ("none", "prod", "nosum", "fused"):
        t_s, t_l = run(mode, n_short, args.reps), run(mode, n_long, args.reps)
        dt = (t_l - t_s) / (n_long - n_short)
        if dt <= 0:
            dt = t_l / n_long
        pts = args.grid / dt
        if base is None:
            base = pts
        print(f"{mode:6s}: {pts:.3e} points/s  ({pts / base * 100:5.1f}% of no-guard ceiling)")


if __name__ == "__main__":
    main()
