"""Fleet serving walkthrough: many evidence estimations per dispatch.

The production shape the reference cannot express: B independent BQ
problems (here: the same likelihood family with different true means —
think "one evidence integral per model/dataset pair") advance TOGETHER —
one compiled program per fleet operation, one compiled scan for the whole
active-learning campaign.

Run: python examples/fleet_serving.py [--problems 16] [--steps 6]
"""

import argparse

import numpy as np
from scipy import stats

import tpubq

SIG_L = 0.5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--problems", type=int, default=16)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--dtype", default=None, choices=["float64", "float32"])
    args = ap.parse_args()
    if args.dtype is None:
        import jax

        args.dtype = "float32" if jax.devices()[0].platform == "tpu" else "float64"

    B = args.problems
    rng = np.random.RandomState(0)
    mus = rng.uniform(-0.8, 0.8, B)  # each problem's (unknown) likelihood center
    z_true = stats.norm.pdf(mus, 0.0, np.sqrt(1.0 + SIG_L**2))

    xs = np.stack([np.linspace(-2.2, 2.2, 8) for _ in range(B)])
    ls = np.stack([stats.norm.pdf(x, m, SIG_L) for x, m in zip(xs, mus)])

    fleet = tpubq.BQFleet(
        xs, ls, params_tl=(0.7, 0.8), params_l=(0.3, 0.4),
        n_candidate=12, candidate_thresh=0.2, x_mean=0.0, x_var=1.0,
        max_obs=8 + args.steps, dtype=args.dtype,
    )
    err0 = np.abs(fleet.Z_mean() - z_true) / z_true
    print(f"fleet of {B}: start  median rel-err {np.median(err0):.2e}")

    import jax.numpy as jnp

    mus_j = jnp.asarray(mus, fleet.options.np_dtype)
    grid = jnp.asarray(np.linspace(-4, 4, 2001), fleet.options.np_dtype)[:, None]

    # NB: the fleet loop vmaps loglik over problems, but each call sees only
    # its own x — fold the per-problem center in via a closure over the index
    # is not possible under vmap, so use a shared integrand family evaluated
    # per problem through run_active_loop_batch's (B,)-vmapped choices:
    step_hist = []
    for step in range(args.steps):
        x_next = fleet.choose_next(grid)  # (B, 1)
        l_next = stats.norm.pdf(x_next[:, 0], mus, SIG_L)
        fleet.add_observation(x_next, l_next)
        err = np.abs(fleet.Z_mean() - z_true) / z_true
        step_hist.append(np.median(err))
        print(f"step {step}: median rel-err {step_hist[-1]:.2e}  ns={int(fleet.ns[0])}")

    assert step_hist[-1] <= err0.max()

    # per-problem hyperparameter fitting: all B x ntry restarts, ONE program
    fleet.fit(seed=0)
    err_fit = np.abs(fleet.Z_mean() - z_true) / z_true
    print(f"after fit: median rel-err {np.median(err_fit):.2e}")

    # per-problem hyper-marginalized estimates: (B, n) in one pipeline
    zms, zvs = fleet.marginalize(n=32, seed=1)
    err_marg = np.abs(zms.mean(axis=1) - z_true) / z_true
    print(f"marginalized (n=32/problem): median rel-err {np.median(err_marg):.2e}")

    # serving observability: per-problem diagnostics in one dispatch
    diag = fleet.health()
    assert bool(np.all(np.asarray(diag["alpha_l_finite"])))
    print(f"health: max cond(K_l) ~ "
          f"{float(np.max(np.asarray(diag['gp_l']['cond_estimate']))):.1e}, "
          f"max jitter {float(np.max(np.asarray(diag['jitter_l']))):.1e}")
    print("done: every problem advanced in lock-step, one dispatch per op")


if __name__ == "__main__":
    main()
