"""f32 periodic V[Z]: can the rank-per-harmonic closed form replace the GH
floors? (VERDICT r4 next #6)

The exact Jacobi–Anger family (ops/integrals.py::int_*_periodic) serves f64
V[Z]; the f32 route stays the GH bilinear form with the
n_gh ≥ 32·(σ/(p·min(1,w)))² floor — 8,192 nodes already at (w=0.25, p=0.5σ),
which makes small-period f32 V[Z] effectively unusable. The open question
(PARITY (m)) was whether the harmonic assembly survives f32: V[Z] is a
near-total cancellation (raw ~1e-6 of gross), the complex64 harmonic tables
carry O(eps32·h⁴) rounding each, and T's double series sums (2N+1)²
O(h⁴)-magnitude terms.

Measures, per (w, p) across observation counts: f64 exact (truth), f32
exact assembly (state + tables in f32/complex64), f32 GH at the floor
(whatever n_gh the floor demands, capped at 8192), and f32 GH at the
default 128. Reports relative error vs truth and the raw/gross cancellation
depth so the eps32·gross floor is visible.

Usage: python benchmarks/periodic_f32_zvar.py   (forces CPU: accuracy only)
"""

import dataclasses
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import tpubq  # noqa: F401
    from tpubq.models import bq as bqm
    from tpubq.models.bq import (Z_var_exact_terms, _z_var_quad_terms,
                                 periodic_gh_floor)
    from tpubq.utils.options import BQOptions

    rng = np.random.default_rng(3)

    def build(dtype, w, p, n):
        opts = BQOptions(n_candidate=8, candidate_thresh=0.1, max_obs=n + 8,
                         dtype=dtype, kernel="periodic")
        x0 = np.sort(rng.uniform(-2.5, 2.5, size=(n, 1)), axis=0)
        l0 = 0.05 + np.exp(-0.5 * (x0[:, 0]) ** 2 / 0.3) / np.sqrt(0.6 * np.pi)
        st = bqm.init_state(x0, l0, opts, params_tl=(0.8, w, p),
                            params_l=(0.4, w, p), x_mean=[0.0], x_var=[[1.0]])
        return st, opts

    print(f"{'w':>5} {'p':>5} {'n':>3} | {'truth V':>10} {'raw/gross':>9} | "
          f"{'f32 exact':>9} {'f32 GH@floor':>12} {'f32 GH@128':>10}")
    for w in (0.6, 0.3):
        for p in (1.0, 0.5, 0.25):
            for n in (8, 14):
                rng_state = rng.bit_generator.state
                st64, o64 = build("float64", w, p, n)
                rng.bit_generator.state = rng_state
                st32, o32 = build("float32", w, p, n)
                raw, gross = Z_var_exact_terms(st64, o64)
                truth = max(float(raw), 0.0)
                depth = float(raw) / max(float(gross), 1e-300)
                raw32, _ = Z_var_exact_terms(st32, o32)
                v32 = max(float(raw32), 0.0)
                floor = int(min(periodic_gh_floor((0.8, w, p), [[1.0]]), 8192))
                errs = []
                for ngh in (floor, 128):
                    og = dataclasses.replace(o32, n_gh=ngh)
                    nodes, wt = bqm._gh_nodes(st32, og)
                    rq, _ = _z_var_quad_terms(st32, og, nodes, wt)
                    errs.append(max(float(rq), 0.0))
                scale = max(truth, 1e-300)
                print(f"{w:5.2f} {p:5.2f} {n:3d} | {truth:10.3e} {depth:9.1e} | "
                      f"{abs(v32-truth)/scale:9.2e} "
                      f"{abs(errs[0]-truth)/scale:12.2e} "
                      f"{abs(errs[1]-truth)/scale:10.2e}")


if __name__ == "__main__":
    main()
