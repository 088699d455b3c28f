"""Calibrate the single-factorization f32 refit jitter (round 5, loop lever).

benchmarks/loop_variants.py measured: ONE fixed-jitter factorization per GP
instead of the 2-rung f32 stack cuts the active-loop step 100.5 → 70.5 us
(1.43x) — but at effective jitter 0 (base 1e-12 rounds away in f32) the
40-step loop NaNs: crowded late-loop Grams (points at the spacing-rule
floor) are non-PD at f32 precision, so the ladder's 1e-4 escape rung IS
load-bearing. This sweep finds the smallest ALWAYS-ON jitter that (a)
survives the full loop and (b) deviates from the laddered values by less
than the f32 path's own documented accuracy (~1e-3): for each
j ∈ {1e-6 … 1e-4}·scale, run the 40-step production loop with a single
fixed-jitter factorization and report max |ΔZ_mean|/|Z|, |ΔZ_var|/|V|, and
selection divergence vs the 2-rung ladder reference.

Usage: python benchmarks/jitter_sweep.py
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
    from tpubq.models.bq import Z_mean, Z_var, choose_candidates, log_transform, inv_log_transform
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

    def fit_gps_fixed(st, j):
        """_fit_gps with a single fixed-jitter factorization per GP."""
        tl_s = jnp.where(st.obs_mask, log_transform(st.l_s, st.gamma), 0.0)
        gp_tl = gpm.gp_fit(kfn, st.gp_log_l.theta, st.gp_log_l.s, st.x_s,
                           tl_s, st.obs_mask, base_jitter=j, ladder=False)
        x_c, c_mask = choose_candidates(st.x_s, st.obs_mask, opts)
        m_tl_c = gpm.gp_mean(kfn, gp_tl, x_c)
        l_c = jnp.where(c_mask, inv_log_transform(m_tl_c, st.gamma), 0.0)
        x_sc = jnp.concatenate([st.x_s, x_c], axis=0)
        l_sc = jnp.concatenate(
            [jnp.where(st.obs_mask, st.l_s, 0.0), l_c], axis=0)
        sc_mask = jnp.concatenate([st.obs_mask, c_mask], axis=0)
        gp_l = gpm.gp_fit(kfn, st.gp_l.theta, st.gp_l.s, x_sc, l_sc, sc_mask,
                          base_jitter=j, ladder=False)
        return st._replace(tl_s=tl_s, x_c=x_c, l_c=l_c, c_mask=c_mask,
                           gp_log_l=gp_tl, gp_l=gp_l)

    def make_step(j):
        def step(st, _):
            x_next, _s = acquire.choose_next(st, opts, grid)
            i = jnp.minimum(st.ns, opts.max_obs - 1)
            st = st._replace(
                x_s=st.x_s.at[i].set(x_next),
                l_s=st.l_s.at[i].set(loglik(x_next)),
                obs_mask=st.obs_mask.at[i].set(True),
                ns=jnp.minimum(st.ns + 1, opts.max_obs),
            )
            if j is None:
                st = bqm._fit_gps(st, opts, ladder=True)
            else:
                st = fit_gps_fixed(st, j)
            return st, (x_next[0], Z_mean(st, opts), Z_var(st, opts))
        return step

    n_steps = 40

    def run_loop(step):
        return jax.jit(lambda s: jax.lax.scan(step, s, None, length=n_steps))(
            state)

    _st, (xr, zmr, zvr) = run_loop(make_step(None))
    xr, zmr, zvr = map(np.asarray, (xr, zmr, zvr))

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
            for _ in range(3):
                t0 = time.perf_counter()
                jax.block_until_ready(f(e0))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (run(20) - run(4)) / (16 * n_steps)

    print(f"platform={platform} ladder-ref Z_mean[-1]={zmr[-1]:.6e} "
          f"Z_var[-1]={zvr[-1]:.3e}")
    for j in (1e-6, 3e-6, 1e-5, 3e-5, 1e-4):
        step = make_step(j)
        _st, (xs, zm, zv) = run_loop(step)
        xs, zm, zv = map(np.asarray, (xs, zm, zv))
        ok = np.all(np.isfinite(zm)) and np.all(np.isfinite(zv))
        dx = float(np.max(np.abs(xs - xr)))
        dzm = float(np.max(np.abs(zm - zmr) / np.maximum(np.abs(zmr), 1e-30)))
        dzv = float(np.max(np.abs(zv - zvr) / np.maximum(np.abs(zvr), 1e-30)))
        dt = time_variant(step) if ok else float("nan")
        print(f"j={j:7.0e}: finite={ok} dx={dx:8.1e} dZm={dzm:8.1e} "
              f"dZv={dzv:8.1e}  {dt*1e6:6.1f} us/step")


if __name__ == "__main__":
    main()
