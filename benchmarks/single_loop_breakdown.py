"""Single-problem active-loop step breakdown: where do the ~87 us/step go?

The bench.py metric `active_loop_10000grid_tpu` (96x in BENCH_r04, the one
line under the >100x north star) times `acquire.run_active_loop` on a
max_obs=64 state over a 1e4-point grid. Each step does three things:
score the grid (ESM + demote + argmax), absorb the observation (refit:
jitter-ladder Cholesky on both GPs), and record the per-step Z moments
(Z_mean + Z_var quadrature).

Methodology note (round 5): a first version of this harness ablated the
production step (fixed x_next, record_moments=False, ...) and produced
mutually inconsistent attributions — e.g. "moments" read 70 us from one
pair of variants and ~0 from another — because the variants compile to
different programs with different CSE/hoisting opportunities (a step that
never refits carries loop-INVARIANT positions, so XLA hoists every
position-dependent term of the scorer out of the scan). This version
times each component in ISOLATION on a state whose every float leaf is
perturbed by the data-dependent carry, so nothing position-dependent can
hoist, and reports the components alongside the true production step.
Component sums need not match the full step exactly (the full step CSEs
shared subexpressions, e.g. the z-vectors used by both ESM and V[Z]) —
the gap IS the measured CSE.

Usage: python benchmarks/single_loop_breakdown.py [--grid 10000]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=10000)
    ap.add_argument("--max-obs", type=int, default=64)
    ap.add_argument("--n-steps", type=int, default=40)
    ap.add_argument("--k-short", type=int, default=4)
    ap.add_argument("--k-long", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tpubq  # noqa: F401
    from tpubq.models import acquire, bq as bqm
    from tpubq.models.bq import Z_mean, Z_var
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
    grid = jnp.asarray(np.linspace(-4, 4, args.grid), opts.np_dtype)[:, None]

    mu, sig2 = 0.2, 0.25

    def loglik(x):
        return jnp.exp(-0.5 * (x[0] - mu) ** 2 / sig2) / jnp.sqrt(
            2 * jnp.pi * sig2)

    inexact = jnp.issubdtype

    def perturb(st, eps):
        # multiply EVERY float leaf by (1 + eps): positions, alphas, factors,
        # Kinv — nothing the component reads is loop-invariant afterwards
        return jax.tree.map(
            lambda a: a * (1.0 + eps) if inexact(a.dtype, jnp.floating) else a,
            st)

    def probe_sum(y):
        # consume EVERY float leaf: a partial probe lets XLA dead-code-
        # eliminate the unconsumed work (a first version summed one leaf and
        # read the whole refit at 1.3 us — the Cholesky had been DCE'd)
        leaves = [jnp.sum(a) for a in jax.tree.leaves(y)
                  if inexact(a.dtype, jnp.floating)]
        return sum(leaves) if leaves else jnp.asarray(0.0, opts.np_dtype)

    # --- isolated components: scan over (eps) carry, perturbed state ---
    def comp_esm(st):
        return acquire.expected_squared_mean(st, opts, grid)

    def comp_choose(st):
        return acquire.choose_next(st, opts, grid)[0]

    def comp_obs(st):
        x_next = grid[0] * (1.0 + st.l_s[0] * 1e-9)  # data-dependent point
        return acquire.add_observation(st, opts, x_next, loglik(x_next))

    def comp_zm(st):
        return Z_mean(st, opts)

    def comp_zv(st):
        return Z_var(st, opts)

    def comp_full(st):
        x_next, _ = acquire.choose_next(st, opts, grid)
        st2 = acquire.add_observation(st, opts, x_next, loglik(x_next))
        return (Z_mean(st2, opts), Z_var(st2, opts))

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

    # the production loop itself, bench.py-identical (state evolves)
    def time_production():
        def loop_once(eps, _):
            st0 = state._replace(l_s=state.l_s * (1.0 + eps))
            _st, (_xs, zm, _zv) = acquire.run_active_loop(
                st0, opts, loglik, grid, args.n_steps)
            return eps + 1e-25 * zm[-1], None

        def run(K):
            f = jax.jit(lambda e: jax.lax.scan(loop_once, e, None, length=K))
            e0 = jnp.asarray(1e-7, opts.np_dtype)
            jax.block_until_ready(f(e0))
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jax.block_until_ready(f(e0))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_s, t_l = run(args.k_short), run(args.k_long)
        return (t_l - t_s) / ((args.k_long - args.k_short) * args.n_steps)

    print(f"platform={platform} grid={args.grid} max_obs={args.max_obs}")
    rows = {}
    for name, fn in (("esm", comp_esm), ("choose", comp_choose),
                     ("observe", comp_obs), ("Z_mean", comp_zm),
                     ("Z_var", comp_zv), ("step(iso)", comp_full)):
        dt = time_component(fn)
        rows[name] = dt
        print(f"{name:10s}: {dt*1e6:9.1f} us/step  ({1.0/dt:10.0f} /s)")
    dt = time_production()
    rows["step(prod)"] = dt
    print(f"{'step(prod)':10s}: {dt*1e6:9.1f} us/step  ({1.0/dt:10.0f} /s)")
    seq = rows["choose"] + rows["observe"] + rows["Z_mean"] + rows["Z_var"]
    print(f"-> demote+argmax (choose-esm): {(rows['choose']-rows['esm'])*1e6:8.1f} us")
    print(f"-> component sum {seq*1e6:8.1f} us vs full step "
          f"{rows['step(prod)']*1e6:8.1f} us (gap = CSE across components)")


if __name__ == "__main__":
    main()
