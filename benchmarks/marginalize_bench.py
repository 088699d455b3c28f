"""Config-5 benchmark: E[Z]/V[Z] marginalized over 100 sampled length-scales.

Compares the batched-Cholesky pipeline (one vmapped dispatch) against a
reference-style sequential loop (per-sample refactorize + estimate, as
bq.py::BQ.marginalize does), on the default device. Prints one JSON line
per variant. Not the driver headline (that is bench.py); kept for the
perf record.
"""

import json
import time

import numpy as np


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

    out = margm.marginalize(state, opts, thetas)  # compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(10):
        out = margm.marginalize(state, opts, thetas)
    jax.block_until_ready(out)
    batched = (time.perf_counter() - t0) / 10

    # sequential loop (one set_params + estimates per sample, host-driven)
    one = jax.jit(
        lambda st, th: (
            lambda s: (bqm.Z_mean(s, opts), bqm.Z_var(s, opts))
        )(bqm.set_params(st, opts, theta_tl=th)),
        static_argnums=(),
    )
    r = one(state, thetas[0])
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for th in thetas:
        r = one(state, th)
    jax.block_until_ready(r)
    seq = time.perf_counter() - t0

    print(json.dumps({
        "metric": f"marginalize_100_samples_{platform}",
        "value": round(100.0 / batched, 1),
        "unit": "samples/s",
        "vs_sequential_loop": round(seq / batched, 1),
    }))


if __name__ == "__main__":
    main()
