"""Round-5 follow-up to loop_variants.py: the fixed-jitter path (V1, 69.6
us/step vs the 2-rung ladder's 102.4) was measured to be a REAL accuracy
regression (benchmarks/jitter_drift.py + the fixed-state isolation: a
crowded observation pair drifts Z_mean 2.7% under unconditional 1e-4 where
rung-0 holds 7.7e-6), so the ladder SEMANTICS stay. This measures whether
the ladder's ~33 us/step price can be cut without changing its values:

V0  current 2-rung stack (baseline; values = ladder semantics)
V5  lax.cond-guarded rescue: factor rung 0, branch to the 1e-4
    refactorization only when its diagonal is non-finite. Identical values;
    re-measures the round-2 "any cond costs ~90 us of pipeline stall"
    finding on today's program shape.
V6  lean 2-rung: both factors still computed, but no (R, n, n) stack /
    unstack, no rung-0 jitter add (base_jitter rounds away in f32), single
    fused where for the selection.

Usage: python benchmarks/loop_variants2.py
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
    from tpubq.models import acquire, bq as bqm
    from tpubq.models.bq import Z_mean, Z_var, _fit_gps
    from tpubq.ops import linalg
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
    mu, sig2 = 0.2, 0.25

    def loglik(x):
        return jnp.exp(-0.5 * (x[0] - mu) ** 2 / sig2) / jnp.sqrt(
            2 * jnp.pi * sig2)

    orig_jc = linalg.jitter_cholesky

    def jc_cond(K, mask, base_jitter=0.0):
        if K.dtype != jnp.float32:
            return orig_jc(K, mask, base_jitter)
        scale = linalg._diag_scale(K, mask)
        Kp = linalg.pad_gram(K, mask)
        eye_live = jnp.eye(K.shape[0], dtype=K.dtype) * mask.astype(K.dtype)
        L0 = jnp.linalg.cholesky(Kp)
        ok0 = jnp.all(jnp.isfinite(jnp.diagonal(L0)))
        j1 = jnp.asarray(1e-4, K.dtype) * scale

        def rescue(_):
            L1 = jnp.linalg.cholesky(Kp + eye_live * j1)
            return L1, j1, jnp.all(jnp.isfinite(jnp.diagonal(L1)))

        def keep(_):
            return L0, jnp.asarray(0.0, K.dtype), jnp.asarray(True)

        return jax.lax.cond(ok0, keep, rescue, None)

    def jc_lean(K, mask, base_jitter=0.0):
        if K.dtype != jnp.float32:
            return orig_jc(K, mask, base_jitter)
        scale = linalg._diag_scale(K, mask)
        Kp = linalg.pad_gram(K, mask)
        eye_live = jnp.eye(K.shape[0], dtype=K.dtype) * mask.astype(K.dtype)
        j1 = jnp.asarray(1e-4, K.dtype) * scale
        L0 = jnp.linalg.cholesky(Kp)
        L1 = jnp.linalg.cholesky(Kp + eye_live * j1)
        ok0 = jnp.all(jnp.isfinite(jnp.diagonal(L0)))
        ok1 = jnp.all(jnp.isfinite(jnp.diagonal(L1)))
        L = jnp.where(ok0, L0, L1)
        j = jnp.where(ok0, jnp.asarray(0.0, K.dtype), j1)
        return L, j, jnp.logical_or(ok0, ok1)

    def make_step():
        def step(st, _):
            x_next, _s = acquire.choose_next(st, opts, grid)
            i = jnp.minimum(st.ns, opts.max_obs - 1)
            st = st._replace(
                x_s=st.x_s.at[i].set(x_next),
                l_s=st.l_s.at[i].set(loglik(x_next)),
                obs_mask=st.obs_mask.at[i].set(True),
                ns=jnp.minimum(st.ns + 1, opts.max_obs),
            )
            st = _fit_gps(st, opts, ladder=True)
            return st, (x_next, Z_mean(st, opts), Z_var(st, opts))
        return step

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

    print(f"platform={platform} grid=10000 max_obs=64", flush=True)
    variants = (("V0 2-rung stack", orig_jc), ("V5 cond-rescue", jc_cond),
                ("V6 lean 2-rung", jc_lean))
    outs = {}
    for name, jc in variants:
        linalg.jitter_cholesky = jc
        try:
            step = make_step()
            _st, (xs, zm, zv) = jax.jit(
                lambda s: jax.lax.scan(step, s, None, length=n_steps))(state)
            outs[name] = (np.asarray(xs), np.asarray(zm), np.asarray(zv))
            dt = time_variant(step)
        finally:
            linalg.jitter_cholesky = orig_jc
        xs0, zm0, zv0 = outs["V0 2-rung stack"]
        xs1, zm1, _ = outs[name]
        dx = float(np.max(np.abs(xs1 - xs0)))
        dzm = float(np.max(np.abs(zm1 - zm0) / np.maximum(np.abs(zm0), 1e-30)))
        print(f"{name:16s}: {dt*1e6:7.1f} us/step ({1.0/dt:8.0f} steps/s) "
              f"parity dx={dx:.1e} dZm={dzm:.1e}", flush=True)


if __name__ == "__main__":
    main()
