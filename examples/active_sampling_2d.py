"""2-D active sampling: BQ beyond the reference's 1-D regime.

Estimates Z = ∫ ℓ(x) N(x | 0, I₂) dx for a 2-D Gaussian likelihood with a
known closed-form answer. Everything the 1-D workflow uses generalizes:
candidates become a Halton space-filling design over the live bounding box
(sup-norm spacing filter), the V[Z] quadrature becomes a tensor-product
Gauss–Hermite rule, and ``choose_next`` scores a 2-D grid in one dispatch
(optionally polishing the winner off-grid with ``refine=True``).

Run: python examples/active_sampling_2d.py [--steps 8] [--dtype float64]
"""

import argparse

import numpy as np
from scipy import stats

import tpubq

MU_L = np.array([0.3, -0.2])
SIG_L = 0.55  # isotropic likelihood scale


def f_l(x):
    """ℓ(x) = N(x | MU_L, SIG_L² I), x: (n, 2) or (2,)."""
    x = np.atleast_2d(x)
    return np.exp(-0.5 * np.sum((x - MU_L) ** 2, axis=-1) / SIG_L**2) / (
        2.0 * np.pi * SIG_L**2
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument(
        "--dtype", default=None, choices=["float64", "float32"],
        help="default: float32 on TPU, float64 elsewhere",
    )
    ap.add_argument("--n-hyper", type=int, default=50,
                help="hyper samples for the final marginalization")
    args = ap.parse_args()
    if args.dtype is None:
        import jax

        args.dtype = "float32" if jax.devices()[0].platform == "tpu" else "float64"

    # Z = ∫ N(x; μ_l, σ² I) N(x; 0, I) dx = N(μ_l; 0, (1 + σ²) I)
    z_true = float(
        stats.multivariate_normal.pdf(MU_L, mean=np.zeros(2), cov=(1 + SIG_L**2) * np.eye(2))
    )

    rng = np.random.default_rng(4)
    x0 = rng.uniform(-2.0, 2.0, size=(12, 2))
    bq = tpubq.BQ(
        x0, f_l(x0), n_candidate=16, candidate_thresh=0.3,
        x_mean=np.zeros(2), x_var=np.eye(2), dtype=args.dtype,
    )
    # dim-aware params: (h, w_1, w_2)
    bq.init(params_tl=(0.7, 0.8, 0.8), params_l=(0.3, 0.5, 0.5)).fit(seed=0)
    print(f"true Z = {z_true:.6f}")
    print(f"start : E[Z]={bq.Z_mean():.6f}  V[Z]={bq.Z_var():.3e}  ns={bq.ns}")

    g = np.linspace(-2.5, 2.5, 41)
    grid = np.stack(np.meshgrid(g, g, indexing="ij"), axis=-1).reshape(-1, 2)

    for step in range(args.steps):
        x_next = bq.choose_next(grid, n=0, seed=step, refine=True)
        bq.add_observation(x_next, float(f_l(x_next)[0]))
        if (step + 1) % 2 == 0:
            # refresh the hypers as the dataset grows (the reference's own
            # workflow: fit_hypers between acquisitions)
            bq.fit_hypers(seed=step)
        print(
            f"step {step + 1}: x_next=({x_next[0]:+.3f}, {x_next[1]:+.3f})  "
            f"E[Z]={bq.Z_mean():.6f}  V[Z]={bq.Z_var():.3e}"
        )

    zm_pt = bq.Z_mean()
    rel = abs(zm_pt - z_true) / z_true
    # Marginalize with a moderately tight hyper prior: in 2-D with few
    # observations the MLL is flat along some hyper directions, and the
    # default ultra-weak prior (std 5 in log space) would let samples wander
    # to extreme length-scales that dominate the average. prior_std is the
    # knob for that (see tpubq.models.marginalize.sample_hypers).
    zms, _zvs = bq.marginalize(n=args.n_hyper, seed=9, prior_std=1.5)
    zm_marg = float(np.median(zms))
    print(
        f"final : E[Z]={zm_pt:.6f} (rel err {rel:.2%}); "
        f"marginalized (prior_std=1.5) median {zm_marg:.6f}"
    )
    assert rel < 0.10, "2-D estimate should land within 10% of the closed form"
    assert abs(zm_marg - z_true) / z_true < 0.35


if __name__ == "__main__":
    main()
