"""Micro-breakdown of the single-problem refit (_fit_gps): which of the
~80 us/step (benchmarks/single_loop_breakdown.py: `observe` = 79.5 us of a
100 us step) goes to each factorization / solve?

Times each piece in a perturbed-carry scan (same anti-hoist methodology as
single_loop_breakdown.py): gp_tl fit (n=max_obs), gp_l fit (n=max_nsc),
their jitter-ladder Cholesky stacks and [y | I] chol_solves separately,
and the candidate re-selection. Sums need not match _fit_gps exactly (CSE).

Usage: python benchmarks/refit_breakdown.py [--max-obs 64]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-obs", type=int, default=64)
    ap.add_argument("--n-steps", type=int, default=40)
    ap.add_argument("--k-short", type=int, default=4)
    ap.add_argument("--k-long", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tpubq  # noqa: F401
    from tpubq.models import bq as bqm
    from tpubq.models import gp as gpm
    from tpubq.models.bq import _fit_gps, choose_candidates
    from tpubq.ops import linalg
    from tpubq.ops.kernels import get_kernel
    from tpubq.utils.options import BQOptions

    platform = jax.devices()[0].platform
    dtype = "float32" if platform != "cpu" else "float64"
    opts = BQOptions(n_candidate=12, candidate_thresh=0.2,
                     max_obs=args.max_obs, dtype=dtype,
                     use_pallas=(platform == "tpu"))
    rng = np.random.default_rng(0)
    x0 = np.sort(rng.uniform(-3, 3, size=(10, 1)), axis=0)
    l0 = np.exp(-0.5 * (x0[:, 0] - 0.2) ** 2 / 0.25) / np.sqrt(2 * np.pi * 0.25)
    state = bqm.init_state(x0, l0, opts, params_tl=(0.7, 0.8),
                           params_l=(0.3, 0.4), x_mean=[0.0], x_var=[[1.0]])
    kfn, _ = get_kernel(opts.kernel)

    inexact = jnp.issubdtype

    def perturb(st, eps):
        return jax.tree.map(
            lambda a: a * (1.0 + eps) if inexact(a.dtype, jnp.floating) else a,
            st)

    def probe_sum(y):
        leaves = [jnp.sum(a) for a in jax.tree.leaves(y)
                  if inexact(a.dtype, jnp.floating)]
        return sum(leaves) if leaves else jnp.asarray(0.0, opts.np_dtype)

    def comp_fit_gps(st):
        return _fit_gps(st, opts, ladder=True)

    def comp_fit_tl(st):
        tl_s = jnp.where(st.obs_mask, bqm.log_transform(st.l_s, st.gamma), 0.0)
        return gpm.gp_fit(kfn, st.gp_log_l.theta, st.gp_log_l.s, st.x_s,
                          tl_s, st.obs_mask, base_jitter=opts.base_jitter,
                          ladder=True)

    def comp_fit_l(st):
        # gp_l fit with values taken straight from the carried state (the
        # real one re-derives l_c through gp_tl; here isolate the fit cost)
        return gpm.gp_fit(kfn, st.gp_l.theta, st.gp_l.s, st.x_sc,
                          st.l_sc, st.sc_mask, base_jitter=opts.base_jitter,
                          ladder=True)

    def _gram(st, which):
        if which == "tl":
            K = kfn(st.gp_log_l.theta, st.x_s, st.x_s)
            m = st.obs_mask
            s = st.gp_log_l.s
        else:
            K = kfn(st.gp_l.theta, st.x_sc, st.x_sc)
            m = st.sc_mask
            s = st.gp_l.s
        eye = jnp.eye(K.shape[0], dtype=K.dtype)
        return K + eye * (s * s) * m.astype(K.dtype), m

    def comp_chol_tl(st):
        K, m = _gram(st, "tl")
        return linalg.jitter_cholesky(K, m, opts.base_jitter)

    def comp_chol_l(st):
        K, m = _gram(st, "l")
        return linalg.jitter_cholesky(K, m, opts.base_jitter)

    def comp_solve_tl(st):
        L = st.gp_log_l.L
        ym = st.gp_log_l.y
        eye = jnp.eye(L.shape[0], dtype=L.dtype)
        return linalg.chol_solve(L, jnp.concatenate([ym[:, None], eye], 1))

    def comp_solve_l(st):
        L = st.gp_l.L
        ym = st.gp_l.y
        eye = jnp.eye(L.shape[0], dtype=L.dtype)
        return linalg.chol_solve(L, jnp.concatenate([ym[:, None], eye], 1))

    def comp_cands(st):
        x_c, c_mask = choose_candidates(st.x_s, st.obs_mask, opts)
        m = gpm.gp_mean(kfn, st.gp_log_l, x_c)
        return x_c, c_mask.astype(st.x_s.dtype), m

    def time_component(fn):
        def step(eps, _):
            st = perturb(state, eps)
            y = fn(st)
            return eps + 1e-25 * probe_sum(y), None

        def loop_once(eps, _):
            e, _ = jax.lax.scan(step, eps, None, length=args.n_steps)
            return e, None

        def run(K):
            f = jax.jit(lambda e: jax.lax.scan(loop_once, e, None, length=K))
            e0 = jnp.asarray(1e-9, opts.np_dtype)
            jax.block_until_ready(f(e0))
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jax.block_until_ready(f(e0))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_s, t_l = run(args.k_short), run(args.k_long)
        return (t_l - t_s) / ((args.k_long - args.k_short) * args.n_steps)

    print(f"platform={platform} max_obs={args.max_obs} "
          f"max_nsc={opts.max_nsc}")
    for name, fn in (("fit_gps", comp_fit_gps), ("fit_tl", comp_fit_tl),
                     ("fit_l", comp_fit_l), ("chol_tl", comp_chol_tl),
                     ("chol_l", comp_chol_l), ("solve_tl", comp_solve_tl),
                     ("solve_l", comp_solve_l), ("cands", comp_cands)):
        dt = time_component(fn)
        print(f"{name:9s}: {dt*1e6:9.1f} us")


if __name__ == "__main__":
    main()
