"""Fleet active-loop step breakdown: where do the ~24 µs/problem-step go?

The B=64 fleet loop (bench.py metric #5, run_active_loop_batch) does three
things per step: score the (B × G) grid (packed Pallas fleet ESM), absorb
one observation per problem (batch refit — rung-stack batch-major
Cholesky), and record the per-step Z moments (Z_mean + f32 GH Z_var per
problem). This experiment times ablated scan variants, all n_steps-
differenced like bench.py (fixed costs cancel):

  full    — the production step (score + observe/refit + moments)
  nomom   — record_moments=False          → moments  = full − nomom
  refit+m — fixed data-dependent x_next   → scoring  = nomom − refit
  refit   — same, record_moments=False      (refit+m also cross-checks
                                             moments = refit+m − refit)

The fixed-x_next variants derive the point from the carried state (not a
trace constant) so XLA cannot hoist the refit out of the scan.

Usage: python benchmarks/loop_breakdown.py [--B 64] [--grid 10000]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=64)
    ap.add_argument("--grid", type=int, default=10000)
    ap.add_argument("--n-short", type=int, default=8)
    ap.add_argument("--n-long", type=int, default=24)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import tpubq  # noqa: F401
    from tpubq.models import acquire, batched
    from tpubq.models.batched import (
        Z_mean_batch,
        Z_var_batch,
        add_observation_batch,
        choose_next_batch,
    )
    from tpubq.utils.options import BQOptions

    from benchmarks.fleet_esm import build_fleet

    platform = jax.devices()[0].platform
    dtype = "float32" if platform != "cpu" else "float64"
    opts = BQOptions(n_candidate=12, candidate_thresh=0.2, max_obs=48,
                     dtype=dtype, use_pallas=(platform == "tpu"))
    states = build_fleet(args.B, opts, n_obs=8)
    grid = jnp.asarray(np.linspace(-4, 4, args.grid), opts.np_dtype)[:, None]

    def loglik(xa):
        return jnp.exp(-0.5 * (xa[0] - 0.2) ** 2 / 0.25) / jnp.sqrt(
            2 * jnp.pi * 0.25)

    def step_full(sts, _):
        x_next, _ = choose_next_batch(sts, opts, grid)
        sts = add_observation_batch(sts, opts, x_next,
                                    jax.vmap(loglik)(x_next))
        return sts, (Z_mean_batch(sts, opts), Z_var_batch(sts, opts))

    def step_nomom(sts, _):
        x_next, _ = choose_next_batch(sts, opts, grid)
        sts = add_observation_batch(sts, opts, x_next,
                                    jax.vmap(loglik)(x_next))
        return sts, sts.ns

    def _fixed_next(sts):
        # data-dependent but score-free choice: a per-problem grid index
        # derived from the carried ns (so the refit cannot be hoisted)
        idx = (sts.ns * 97 + jnp.arange(sts.ns.shape[0]) * 31) % grid.shape[0]
        return grid[idx]

    def step_refit_m(sts, _):
        x_next = _fixed_next(sts)
        sts = add_observation_batch(sts, opts, x_next,
                                    jax.vmap(loglik)(x_next))
        return sts, (Z_mean_batch(sts, opts), Z_var_batch(sts, opts))

    def step_refit(sts, _):
        x_next = _fixed_next(sts)
        sts = add_observation_batch(sts, opts, x_next,
                                    jax.vmap(loglik)(x_next))
        return sts, sts.ns

    def time_variant(step_fn):
        def run(n):
            f = jax.jit(lambda s: jax.lax.scan(step_fn, s, None, length=n))
            jax.block_until_ready(f(states))
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                jax.block_until_ready(f(states))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_s, t_l = run(args.n_short), run(args.n_long)
        return (t_l - t_s) / (args.n_long - args.n_short)

    print(f"platform={platform} B={args.B} grid={args.grid}")
    rows = {}
    for name, fn in (("full", step_full), ("nomom", step_nomom),
                     ("refit+m", step_refit_m), ("refit", step_refit)):
        dt = time_variant(fn)
        rows[name] = dt
        print(f"{name:8s}: {dt*1e6:9.1f} us/fleet-step  "
              f"({dt*1e6/args.B:6.2f} us/problem-step, "
              f"{args.B/dt:9.0f} agg steps/s)")
    print(f"-> moments : {(rows['full']-rows['nomom'])*1e6:9.1f} us "
          f"(cross-check {(rows['refit+m']-rows['refit'])*1e6:9.1f} us)")
    print(f"-> scoring : {(rows['nomom']-rows['refit'])*1e6:9.1f} us")
    print(f"-> refit   : {rows['refit']*1e6:9.1f} us")


if __name__ == "__main__":
    main()
