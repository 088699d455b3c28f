"""End-to-end active-sampling walkthrough (the reference's README workflow).

Estimates Z = ∫ ℓ(x) N(x | 0, 1) dx for a Gaussian ℓ with a known closed-form
answer, actively choosing where to evaluate ℓ next. Produces diagnostics in
/tmp/tpubq_example/ when matplotlib is available.

Run: python examples/active_sampling.py [--steps 5] [--dtype float64]
"""

import argparse
import pathlib

import numpy as np
from scipy import stats

import tpubq

MU_L, SIG_L = 0.2, 0.5


def f_l(x):
    return stats.norm.pdf(x, MU_L, SIG_L)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument(
        "--dtype", default=None, choices=["float64", "float32"],
        help="default: float32 on TPU (the device hot dtype; some TPU "
        "toolchains cannot compile f64), float64 elsewhere",
    )
    ap.add_argument("--n-hyper", type=int, default=10)
    ap.add_argument(
        "--kernel", default="gaussian",
        choices=["gaussian", "matern52", "matern32", "periodic"],
        help="GP kernel family. All four run on closed-form measure "
        "integrals in f64: gaussian directly, the 1-D Matérns via the "
        "erfcx form, periodic via the Jacobi–Anger harmonic series "
        "(tpubq.ops.integrals; the reference never integrated its "
        "periodic kernel at all)",
    )
    args = ap.parse_args()
    if args.dtype is None:
        import jax

        args.dtype = "float32" if jax.devices()[0].platform == "tpu" else "float64"

    z_true = stats.norm.pdf(MU_L, 0.0, np.sqrt(1.0 + SIG_L**2))
    x = np.linspace(-2.2, 2.2, 6)
    bq = tpubq.BQ(
        x, f_l(x), n_candidate=10, candidate_thresh=0.2, x_mean=0.0, x_var=1.0,
        dtype=args.dtype, kernel=args.kernel,
    )
    # periodic carries a third hyper (the period; fixed here, the fit moves
    # h and w — the reference freezes unlisted hypers the same way)
    extra = (3.0,) if args.kernel == "periodic" else ()
    bq.init(params_tl=(0.7, 0.8) + extra, params_l=(0.3, 0.4) + extra)
    bq.fit(params=("h", "w"), seed=0)
    print(f"true Z = {z_true:.6f}")
    print(f"start : E[Z]={bq.Z_mean():.6f}  V[Z]={bq.Z_var():.3e}  ns={bq.ns}")

    fit_params = ("h", "w") if args.kernel == "periodic" else None
    grid = np.linspace(-4.0, 4.0, 2001)
    for step in range(args.steps):
        x_next = bq.choose_next(grid, n=args.n_hyper, seed=step)
        bq.add_observation(x_next, float(f_l(x_next)))
        bq.fit(params=fit_params, seed=100 + step)
        err = abs(bq.Z_mean() - z_true) / z_true
        print(
            f"step {step}: x_next={x_next:+.3f}  E[Z]={bq.Z_mean():.6f}  "
            f"V[Z]={bq.Z_var():.3e}  rel-err={err:.2e}"
        )

    zm, zv = bq.marginalize(n=100, seed=999)
    print(f"marginalized over 100 hyper draws: E[Z]={zm.mean():.6f} ± {zm.std():.1e}")

    try:
        import matplotlib

        matplotlib.use("Agg")
        out = pathlib.Path("/tmp/tpubq_example")
        out.mkdir(exist_ok=True)
        fig, _ = bq.plot(f_l=f_l)
        fig.savefig(out / "posterior.png", dpi=110)
        import matplotlib.pyplot as plt

        fig2, ax = plt.subplots()
        bq.plot_expected_squared_mean(ax=ax)
        fig2.savefig(out / "esm.png", dpi=110)
        print(f"plots in {out}/")
    except Exception as e:  # headless without matplotlib is fine
        print("plotting skipped:", e)


if __name__ == "__main__":
    main()
