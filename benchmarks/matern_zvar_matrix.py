"""f32/f64 Matérn V[Z] error matrix over kernel widths (VERDICT r4 next #3).

Questions this answers with numbers (truth = f64 exact closed form via the
Gamma-mixture cross-kernel family, ~1e-12):

1. Where does the production GH bilinear (512-node 1-D / 48-per-axis 2-D
   floor) actually degrade as the tl kernel narrows? (The docs' ~5e-4 was
   measured at one state; the error is width-dependent.)
2. Is the EXACT closed-form assembly f32-viable exactly where GH struggles?
   (Narrow widths decorrelate the Gram → smaller K⁻¹ amplification → the
   cancellation that made f32 closed forms unusable may be mild there.)
3. What adaptive node floor n(w/σ) keeps GH ≤ 1e-4 in f32?

Also records the round-5 mixture-pair-measure experiment's negative result:
absorbing the kernel cusp into the pair measure still leaves m̃'s own
length-scale to resolve, so its node count is ≥ the plain GH floor
(measured: rel 2.3e-2 at 20/axis-per-component × 64 components vs 2.8e-7
for plain 512-node GH on the same state) — rejected, see PARITY.

Usage: JAX_PLATFORMS=cpu python benchmarks/matern_zvar_matrix.py
"""

import dataclasses
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def build_state(kernel, d, dtype, w_tl, w_l=None, n_obs=10):
    from tpubq.models import bq as bqm
    from tpubq.utils.options import BQOptions

    w_l = w_l if w_l is not None else w_tl / 2
    opts = BQOptions(n_candidate=12, candidate_thresh=min(0.2, w_tl / 2),
                     max_obs=max(32, n_obs + 8), dtype=dtype, kernel=kernel,
                     dim=d, use_pallas=False)
    rng = np.random.default_rng(0)
    x0 = np.sort(rng.uniform(-2.5, 2.5, size=(n_obs, d)), axis=0)
    l0 = np.exp(-0.5 * np.sum((x0 - 0.2) ** 2, -1) / 0.25)
    state = bqm.init_state(
        x0, l0, opts, params_tl=(0.7,) + (w_tl,) * d,
        params_l=(0.3,) + (w_l,) * d,
        x_mean=[0.0] * d, x_var=(np.eye(d) * 1.0).tolist())
    return state, opts


def main():
    import jax.numpy as jnp

    import tpubq  # noqa: F401
    from tpubq.models import bq as bqm

    kernel = "matern52"
    for d, n_obs in ((1, 10), (1, 40), (2, 10), (2, 40)):
        print(f"==== {kernel} d={d} n_obs={n_obs} ====")
        for w in (0.8, 0.4, 0.2, 0.1):
            st64, op64 = build_state(kernel, d, "float64", w, n_obs=n_obs)
            ref = float(bqm.Z_var_exact(st64, op64))
            st32, op32 = build_state(kernel, d, "float32", w, n_obs=n_obs)
            ex32 = float(bqm.Z_var_exact(st32, op32))
            row = [f"w={w:4.2f} ref={ref:10.4e}",
                   f"exact-f32 rel={abs(ex32 - ref) / ref:8.2e}"]
            if d == 1:
                ns = (512, 1024, 2048)
            else:
                ns = (48 * 48, 96 * 96, 128 * 128)  # per-axis via n_gh^(1/d)
            for n in ns:
                g64 = float(bqm.Z_var_gh(st64, dataclasses.replace(op64, n_gh=n)))
                g32 = float(bqm.Z_var_gh(st32, dataclasses.replace(op32, n_gh=n)))
                na = n if d == 1 else int(np.ceil(n ** 0.5))
                row.append(f"GH{na}: f64 {abs(g64 - ref) / ref:8.2e}"
                           f" f32 {abs(g32 - ref) / ref:8.2e}")
            print("  " + "  ".join(row))


if __name__ == "__main__":
    main()
