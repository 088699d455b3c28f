"""Config-5 benchmark: E[Z]/V[Z] marginalized over 100 sampled length-scales.

Compares the batched-Cholesky pipeline (one vmapped dispatch) against a
reference-style sequential loop (per-sample refactorize + estimate, as
bq.py::BQ.marginalize does), on the default device. Prints one JSON line
per variant. Not the driver headline (that is bench.py); kept for the
perf record.
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
    from tpubq.models import bq as bqm, marginalize as margm
    from tpubq.utils.options import BQOptions

    platform = jax.devices()[0].platform
    dtype = "float32" if platform != "cpu" else "float64"
    opts = BQOptions(n_candidate=12, candidate_thresh=0.2, max_obs=16, dtype=dtype)
    x = np.linspace(-2.2, 2.2, 10)
    l = np.exp(-0.5 * (x - 0.2) ** 2 / 0.25) / np.sqrt(2 * np.pi * 0.25)
    state = bqm.init_state(
        x, l, opts, params_tl=(0.7, 0.8), params_l=(0.3, 0.4), x_mean=[0.0], x_var=[[1.0]]
    )
    key = jax.random.PRNGKey(0)
    thetas = margm.sample_hypers(state, opts, key, 100, nburn=10)
    jax.block_until_ready(thetas)

    # NB: repeated identical dispatches can be deduped by the remote tunnel,
    # so each timed call gets perturbed inputs, and we block per call.
    variants = [thetas * (1.0 + 1e-4 * i) for i in range(6)]
    out = margm.marginalize(state, opts, variants[-1])  # compile
    jax.block_until_ready(out)
    times = []
    for v in variants[:5]:
        t0 = time.perf_counter()
        out = margm.marginalize(state, opts, v)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    batched = sorted(times)[len(times) // 2]

    # sequential loop (one set_params + estimates per sample, host-driven,
    # pipelined: enqueue all, block once — generous to the loop)
    one = jax.jit(
        lambda st, th: (
            lambda s: (bqm.Z_mean(s, opts), bqm.Z_var(s, opts))
        )(bqm.set_params(st, opts, theta_tl=th)),
        static_argnums=(),
    )
    th_host = np.asarray(thetas)
    r = one(state, jnp.asarray(th_host[0] * 1.001))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    rs = [one(state, jnp.asarray(th)) for th in th_host]
    jax.block_until_ready(rs)
    seq = time.perf_counter() - t0

    print(json.dumps({
        "metric": f"marginalize_100_samples_{platform}",
        "value": round(100.0 / batched, 1),
        "unit": "samples/s",
        "vs_sequential_loop": round(seq / batched, 1),
    }))


if __name__ == "__main__":
    main()
