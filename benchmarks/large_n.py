"""Large-max_obs regime measurement (VERDICT r2 #4).

Two claims in the codebase point at large ``max_obs`` as their payoff
regime without a measurement past N=128:

  1. ``models/incremental.py`` — exact bordering/Woodbury updates vs the
     full per-step refit in the active loop;
  2. ``ops/pallas_kernels.cholesky_blocked`` — the blocked factorization
     vs XLA's single-matrix Cholesky custom call.

This benchmark measures both crossovers on the real chip (f32) and prints
one line per configuration. The measured table lives in PARITY.md; the
``incremental="auto"`` dispatch in ``acquire.run_active_loop`` is wired to
the crossover found here.

Usage: python benchmarks/large_n.py [--what loop|chol|both]
"""

import argparse
import sys
import time

import numpy as np


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/tpubq_xla_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def _scan_diff(run, n_short, n_long, reps=5):
    t_s = min(run(n_short) for _ in range(reps))
    t_l = min(run(n_long) for _ in range(reps))
    dt = (t_l - t_s) / (n_long - n_short)
    return dt if dt > 0 else t_l / n_long


def bench_active_loop(max_obs_list=(128, 256, 512, 1024), n_steps=8):
    """Per-step cost of the closed active loop, refit vs incremental, with
    the live set near capacity (the regime the incremental path targets)."""
    import jax
    import jax.numpy as jnp

    import tpubq  # noqa: F401
    from tpubq.models import acquire, bq as bqm
    from tpubq.utils.options import BQOptions

    platform = jax.devices()[0].platform
    dtype = "float32" if platform != "cpu" else "float64"
    results = {}
    for max_obs in max_obs_list:
        ns0 = max_obs - n_steps - 4  # start near capacity: large-N regime
        opts = BQOptions(n_candidate=12, candidate_thresh=1e-3,
                         max_obs=max_obs, dtype=dtype,
                         use_pallas=(platform == "tpu"))
        rng = np.random.RandomState(0)
        x = np.sort(rng.uniform(-2.2, 2.2, ns0))
        l = np.exp(-0.5 * (x - 0.2) ** 2 / 0.25) / np.sqrt(2 * np.pi * 0.25) + 1e-3
        state = bqm.init_state(x, l, opts, params_tl=(0.7, 0.8),
                               params_l=(0.3, 0.4))
        grid = jnp.asarray(np.linspace(-4, 4, 512), opts.np_dtype)[:, None]
        mu, sig2 = 0.2, 0.25

        def loglik(xp):
            return (jnp.exp(-0.5 * (xp[0] - mu) ** 2 / sig2)
                    / jnp.sqrt(2 * jnp.pi * sig2) + 1e-3)

        for mode, inc in (("refit", False), ("incremental", True)):
            def loop_once(eps, _):
                st0 = state._replace(l_s=state.l_s * (1.0 + eps))
                _st, (_xs, zm, _zv) = acquire.run_active_loop(
                    st0, opts, loglik, grid, n_steps, incremental=inc,
                    refresh_every=64,
                )
                return eps + 1e-25 * zm[-1], zm[-1]

            def run(K):
                f = jax.jit(lambda e: jax.lax.scan(loop_once, e, None, length=K))
                e0 = jnp.asarray(1e-7, opts.np_dtype)
                jax.block_until_ready(f(e0))
                t0 = time.perf_counter()
                jax.block_until_ready(f(e0))
                return time.perf_counter() - t0

            step = _scan_diff(run, 2, 10) / n_steps
            results[(max_obs, mode)] = step
            print(f"{platform} active_loop max_obs={max_obs:5d} {mode:12s}: "
                  f"{step*1e6:9.1f} us/step ({1.0/step:9.1f} steps/s)")
            sys.stdout.flush()
    for max_obs in max_obs_list:
        r = results[(max_obs, "refit")] / results[(max_obs, "incremental")]
        print(f"  -> max_obs={max_obs:5d}: refit/incremental = {r:.2f}x "
              f"({'incremental wins' if r > 1 else 'refit wins'})")
    return results


def bench_cholesky(ns=(128, 256, 512, 1024)):
    """Single-matrix f32 Cholesky: XLA custom call vs the blocked Pallas
    kernel, scan-differenced on device."""
    import jax
    import jax.numpy as jnp

    import tpubq  # noqa: F401
    from tpubq.ops import pallas_kernels as pk

    platform = jax.devices()[0].platform
    if platform != "tpu":
        print("cholesky crossover needs the TPU; skipping")
        return {}
    results = {}
    for n in ns:
        rng = np.random.RandomState(0)
        A_ = rng.standard_normal((n, n))
        A = jnp.asarray(A_ @ A_.T / n + 3.0 * np.eye(n), jnp.float32)

        impls = {
            "xla": lambda M: jnp.linalg.cholesky(M),
            "pallas_blocked": lambda M: pk.cholesky_blocked(M, interpret=False),
        }
        for name, fn in impls.items():
            def body(c, _):
                L = fn(A + c * jnp.eye(n, dtype=jnp.float32))
                return c + 1e-30 * L[0, 0], L[0, 0]

            def run(K):
                f = jax.jit(lambda c: jax.lax.scan(body, c, None, length=K))
                c0 = jnp.asarray(1e-6, jnp.float32)
                jax.block_until_ready(f(c0))
                t0 = time.perf_counter()
                jax.block_until_ready(f(c0))
                return time.perf_counter() - t0

            dt = _scan_diff(run, 8, 136)
            results[(n, name)] = dt
            print(f"tpu cholesky n={n:5d} {name:14s}: {dt*1e6:9.1f} us/factor")
            sys.stdout.flush()
    for n in ns:
        r = results[(n, "xla")] / results[(n, "pallas_blocked")]
        print(f"  -> n={n:5d}: xla/pallas = {r:.2f}x "
              f"({'pallas wins' if r > 1 else 'xla wins'})")
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="both", choices=("loop", "chol", "both"))
    args = ap.parse_args()
    _enable_compile_cache()
    if args.what in ("chol", "both"):
        bench_cholesky()
    if args.what in ("loop", "both"):
        bench_active_loop()


if __name__ == "__main__":
    main()
