"""ESM throughput sweep: grid size × dataset size × path (XLA vs fused Pallas).

Documents how candidate scoring scales on the device. One JSON line per
configuration. Distinct input buffers per dispatch (dedup-proof), block per
timed call.

RELIABILITY WARNING for the remote-tunnel (axon) TPU: sub-millisecond
measurements through the tunnel are not trustworthy — observed throughputs
at 1e6-point grids exceed the chip's FLOP ceiling, implying runtime-level
caching/overlap that block_until_ready does not expose. Treat the 1e4-grid
rows (and bench.py's headline) as the reliable figures; re-run this sweep on
a locally attached TPU for true scaling curves.
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

    for n_obs, max_obs in ((10, 16), (58, 64)):
        opts = BQOptions(n_candidate=12, candidate_thresh=0.05, max_obs=max_obs, dtype=dtype)
        x = np.linspace(-2.2, 2.2, n_obs)
        l = np.exp(-0.5 * (x - 0.2) ** 2 / 0.25) / np.sqrt(2 * np.pi * 0.25)
        state = jax.device_put(
            bqm.init_state(x, l, opts, params_tl=(0.7, 0.8), params_l=(0.3, 0.4),
                           x_mean=[0.0], x_var=[[1.0]])
        )
        paths = {"xla": jax.jit(acquire.expected_squared_mean, static_argnums=1)}
        if platform == "tpu" and dtype == "float32":
            paths["pallas"] = jax.jit(acquire.expected_squared_mean_fused, static_argnums=1)
        for G in (10_000, 100_000, 1_000_000):
            base = np.linspace(-4, 4, G)
            grids = [
                jax.device_put(jnp.asarray(base + 1e-7 * i, opts.np_dtype)[:, None])
                for i in range(4)
            ]
            warm = jax.device_put(jnp.asarray(base + 5e-7, opts.np_dtype)[:, None])
            for name, fn in paths.items():
                out = fn(state, opts, warm)
                out.block_until_ready()
                times = []
                for g in grids:
                    t0 = time.perf_counter()
                    out = fn(state, opts, g)
                    out.block_until_ready()
                    times.append(time.perf_counter() - t0)
                dt = sorted(times)[len(times) // 2]
                print(json.dumps({
                    "metric": f"esm_{name}_{platform}",
                    "n_obs": n_obs,
                    "grid": G,
                    "value": round(G / dt, 1),
                    "unit": "points/s",
                }))


if __name__ == "__main__":
    main()
