"""Fleet ESM scaling measurement: aggregate points/s vs batch size B.

The question (VERDICT r2 #1): does scoring B problems in one dispatch
multiply aggregate throughput, or does the vmapped scorer serialize /
HBM-bind so B=64 runs at the single-problem rate?

Methodology: same scan-length differencing as bench.py's headline — the
sweep precompute is data-dependent on the carry so XLA cannot hoist it;
thousands of iterations inside one program dwarf tunnel RTT noise.

Usage: python benchmarks/fleet_esm.py [--impl vmap|fleet|both] [--bs 1,8,64]
"""

import argparse
import sys
import time

import numpy as np


def _enable_compile_cache():
    from tpubq.utils.profiling import enable_compile_cache

    enable_compile_cache()


N_GRID = 10_000
N_OBS = 10


def build_fleet(B, opts, n_obs=N_OBS):
    """The ONE fleet-geometry builder shared by this sweep and bench.py's
    fleet metrics — a methodology change here changes both identically."""
    from tpubq.models import batched

    rng = np.random.RandomState(0)
    xs = np.stack([np.linspace(-2.2, 2.2, n_obs) + 0.03 * rng.standard_normal(n_obs)
                   for _ in range(B)])
    mus = rng.uniform(-0.5, 0.5, B)
    ls = np.exp(-0.5 * (xs - mus[:, None]) ** 2 / 0.25) / np.sqrt(2 * np.pi * 0.25)
    return batched.init_batch(
        xs, ls, opts, params_tl=(0.7, 0.8), params_l=(0.3, 0.4),
    )


def measure(B, score_fn, n_short=8, n_long=None, reps=5):
    """Aggregate points/s for scoring the (B, G) block once per iteration."""
    import jax
    import jax.numpy as jnp

    from tpubq.utils.options import BQOptions

    platform = jax.devices()[0].platform
    dtype = "float32" if platform != "cpu" else "float64"
    opts = BQOptions(n_candidate=12, candidate_thresh=0.2, max_obs=16,
                     dtype=dtype, use_pallas=(platform == "tpu"))
    states = build_fleet(B, opts)
    grid = jnp.asarray(np.linspace(-4, 4, N_GRID), opts.np_dtype)[:, None]
    if n_long is None:
        # keep total work roughly constant across B so each run is ~0.5-2 s
        n_long = max(int(2064 // max(B // 8, 1)), 32)

    def body(eps, _):
        gl = states.gp_l._replace(
            L=states.gp_l.L * (1.0 + eps),
            alpha=states.gp_l.alpha * (1.0 + eps),
            Kinv=states.gp_l.Kinv * (1.0 + eps),
        )
        gt = states.gp_log_l._replace(
            alpha=states.gp_log_l.alpha * (1.0 + eps),
            Kinv=states.gp_log_l.Kinv * (1.0 + eps),
        )
        sts = states._replace(gp_l=gl, gp_log_l=gt)
        sc = score_fn(sts, opts, grid + eps)
        return eps + 1e-30 * jnp.mean(sc), jnp.sum(sc)

    def run(n, r):
        f = jax.jit(lambda e: jax.lax.scan(body, e, None, length=n))
        e0 = jnp.asarray(0.0, opts.np_dtype)
        out = f(e0)
        jax.block_until_ready(out)
        assert bool(np.all(np.isfinite(np.asarray(out[1])))), "non-finite ESM"
        ts = []
        for _ in range(r):
            t0 = time.perf_counter()
            jax.block_until_ready(f(e0))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_s, t_l = run(n_short, reps), run(n_long, reps)
    dt = (t_l - t_s) / (n_long - n_short)
    if dt <= 0:
        dt = t_l / n_long
    return B * N_GRID / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="vmap")
    ap.add_argument("--bs", default="1,8,64")
    args = ap.parse_args()

    _enable_compile_cache()
    import jax

    import tpubq  # noqa: F401
    from tpubq.models import batched

    import functools

    import jax as _jax

    from tpubq.models import acquire

    def _vmap_impl(states, opts, grid):
        return _jax.vmap(acquire.expected_squared_mean, (0, None, None))(
            states, opts, grid
        )

    impls = {}
    if args.impl in ("vmap", "both"):
        impls["vmap"] = _vmap_impl
    if args.impl in ("fleet", "both"):
        impls["fleet"] = batched.expected_squared_mean_fleet
    if args.impl == "auto":
        impls["auto"] = batched.expected_squared_mean_batch

    platform = jax.devices()[0].platform
    for name, fn in impls.items():
        for B in [int(b) for b in args.bs.split(",")]:
            rate, dt = measure(B, fn)
            print(f"{platform} impl={name} B={B:4d}: {rate:.3e} pts/s aggregate "
                  f"({dt*1e6:9.1f} us/sweep)")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
