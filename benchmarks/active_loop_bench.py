"""On-device active-sampling loop throughput (steps/s).

The reference's outer loop (choose → evaluate → add → refit) is host-driven
Python; here the whole loop is one compiled ``lax.scan``
(tpubq.models.acquire.run_active_loop), so a step costs device time only.
Prints one JSON line. Uses perturbed initial states per repeat (the remote
runtime dedupes identical dispatches).
"""
# NOTE (round 2): numbers produced by this script's per-dispatch timing are
# superseded — every tunneled dispatch pays a ~40-60 us enqueue floor and
# identical dispatches can be deduped, so sub-ms programs must be timed by
# scan-length differencing inside one jit. bench.py --all implements the
# corrected methodology for all three headline metrics; see PARITY.md.


import json
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
    from tpubq.utils.options import BQOptions

    platform = jax.devices()[0].platform
    dtype = "float32" if platform != "cpu" else "float64"
    opts = BQOptions(n_candidate=10, candidate_thresh=0.2, max_obs=64, dtype=dtype)
    x = np.linspace(-2.2, 2.2, 8)
    l = np.exp(-0.5 * (x - 0.2) ** 2 / 0.25) / np.sqrt(2 * np.pi * 0.25)

    def loglik(xa):
        return jnp.exp(-0.5 * (xa[0] - 0.2) ** 2 / 0.25) / jnp.sqrt(2 * jnp.pi * 0.25)

    grid = jnp.asarray(np.linspace(-4, 4, 1024), opts.np_dtype)[:, None]
    n_steps = 16

    def build(eps):
        return bqm.init_state(
            x + eps, l, opts, params_tl=(0.7, 0.8), params_l=(0.3, 0.4),
            x_mean=[0.0], x_var=[[1.0]],
        )

    st = build(0.0)
    out = acquire.run_active_loop(st, opts, loglik, grid, n_steps)  # compile
    jax.block_until_ready(out)
    times = []
    for i in range(5):
        sti = build(1e-5 * (i + 1))
        jax.block_until_ready(sti)
        t0 = time.perf_counter()
        out = acquire.run_active_loop(sti, opts, loglik, grid, n_steps)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / n_steps)
    dt = sorted(times)[len(times) // 2]
    print(json.dumps({
        "metric": f"active_loop_steps_{platform}",
        "value": round(1.0 / dt, 1),
        "unit": "steps/s",
        "grid": 1024,
    }))


if __name__ == "__main__":
    main()
