"""A/B the active-loop step against its two candidate cost cuts (round 5).

The TPU breakdown (benchmarks/single_loop_breakdown.py, v5e f32, grid=1e4,
max_obs=64) reads: step 100.5 us = refit 84.4 + ESM/choose 35.4 + Z_var 13.0
+ Z_mean 1.3 (sum > step: CSE). The refit sub-breakdown
(benchmarks/refit_breakdown.py): Choleskys+gram+rung-selection 58.8 us,
multi-RHS solves only 10.2 us, candidates 0.7 us. So the levers are:

A. the f32 rung STACK (2 factorizations + selection per GP) vs ONE
   fixed-jitter factorization (`ladder=False` refit): saves one (64) + one
   (76) factorization + ~5 us of selection dataflow per GP. Values are
   IDENTICAL whenever rung 0 succeeds (the fixed path's 1e-12 base jitter
   rounds away in f32); what changes is the failure mode — no automatic
   1e-4 escalation, gp.ok=False + NaN poisoning instead.
B. the V[Z] quadrature bilinear form: full (m,n)-RHS triangular solve +
   (m,m) covariance vs the algebraically identical vector form
   a^T(Koo a) - ||L^{-1}(Kox^T a)||^2 (ONE-RHS solve).

Usage: python benchmarks/loop_variants.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    import tpubq  # noqa: F401
    from tpubq.models import acquire, bq as bqm, gp as gpm
    from tpubq.models.bq import Z_mean, Z_var, _fit_gps, _gh_nodes
    from tpubq.ops import linalg
    from tpubq.ops.kernels import get_kernel
    from tpubq.utils.options import BQOptions

    platform = jax.devices()[0].platform
    dtype = "float32" if platform != "cpu" else "float64"
    opts = BQOptions(n_candidate=12, candidate_thresh=0.2, max_obs=64,
                     dtype=dtype, use_pallas=(platform == "tpu"))
    rng = np.random.default_rng(0)
    x0 = np.sort(rng.uniform(-3, 3, size=(10, 1)), axis=0)
    l0 = np.exp(-0.5 * (x0[:, 0] - 0.2) ** 2 / 0.25) / np.sqrt(2 * np.pi * 0.25)
    state = bqm.init_state(x0, l0, opts, params_tl=(0.7, 0.8),
                           params_l=(0.3, 0.4), x_mean=[0.0], x_var=[[1.0]])
    grid = jnp.asarray(np.linspace(-4, 4, 10000), opts.np_dtype)[:, None]
    kfn, _ = get_kernel(opts.kernel)

    mu, sig2 = 0.2, 0.25

    def loglik(x):
        return jnp.exp(-0.5 * (x[0] - mu) ** 2 / sig2) / jnp.sqrt(
            2 * jnp.pi * sig2)

    def add_obs(st, x_a, l_a, ladder):
        i = jnp.minimum(st.ns, opts.max_obs - 1)
        st = st._replace(
            x_s=st.x_s.at[i].set(x_a),
            l_s=st.l_s.at[i].set(l_a),
            obs_mask=st.obs_mask.at[i].set(True),
            ns=jnp.minimum(st.ns + 1, opts.max_obs),
        )
        return _fit_gps(st, opts, ladder=ladder)

    def z_var_vec(st):
        nodes, w = _gh_nodes(st, opts)
        m_l = gpm.gp_mean(kfn, st.gp_l, nodes) + st.gamma
        a = w * m_l
        gp_tl = st.gp_log_l
        Kox = kfn(gp_tl.theta, nodes, gp_tl.x) * gp_tl.mask.astype(a.dtype)[None, :]
        u = linalg.tri_solve(gp_tl.L, Kox.T @ a)
        koa = kfn(gp_tl.theta, nodes, nodes) @ a
        return jnp.maximum(a @ koa - u @ u, 0.0)

    def make_step(ladder, zvar):
        def step(st, _):
            x_next, _s = acquire.choose_next(st, opts, grid)
            st = add_obs(st, x_next, loglik(x_next), ladder)
            zv = zvar(st)
            return st, (x_next, Z_mean(st, opts), zv)
        return step

    variants = {
        "V0 ladder+full": make_step(True, lambda st: Z_var(st, opts)),
        "V1 fixed+full": make_step(False, lambda st: Z_var(st, opts)),
        "V2 ladder+vec": make_step(True, z_var_vec),
        "V3 fixed+vec": make_step(False, z_var_vec),
    }

    n_steps, k_s, k_l, reps = 40, 4, 20, 3

    def time_variant(step):
        def loop_once(eps, _):
            st0 = state._replace(l_s=state.l_s * (1.0 + eps))
            _st, (_xs, zm, _zv) = jax.lax.scan(step, st0, None, length=n_steps)
            return eps + 1e-25 * zm[-1], None

        def run(K):
            f = jax.jit(lambda e: jax.lax.scan(loop_once, e, None, length=K))
            e0 = jnp.asarray(1e-7, state.x_s.dtype)
            jax.block_until_ready(f(e0))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(f(e0))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_s, t_l = run(k_s), run(k_l)
        return (t_l - t_s) / ((k_l - k_s) * n_steps)

    print(f"platform={platform} grid=10000 max_obs=64")
    # value-parity check first (one 40-step loop per variant)
    outs = {}
    for name, step in variants.items():
        st, (xs, zm, zv) = jax.jit(
            lambda s: jax.lax.scan(step, s, None, length=n_steps))(state)
        outs[name] = (np.asarray(xs), np.asarray(zm), np.asarray(zv))
    x0_, zm0, zv0 = outs["V0 ladder+full"]
    for name, (xs, zm, zv) in outs.items():
        dx = float(np.max(np.abs(xs - x0_)))
        dzm = float(np.max(np.abs(zm - zm0) / np.maximum(np.abs(zm0), 1e-30)))
        dzv = float(np.max(np.abs(zv - zv0) / np.maximum(np.abs(zv0), 1e-30)))
        print(f"{name:16s} parity: dx={dx:.1e} dZm={dzm:.1e} dZv={dzv:.1e}")
    for name, step in variants.items():
        dt = time_variant(step)
        print(f"{name:16s}: {dt*1e6:7.1f} us/step ({1.0/dt:8.0f} steps/s)")


if __name__ == "__main__":
    main()
