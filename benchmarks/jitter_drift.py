"""Accuracy referendum on the f32 refit jitter policy (round 5).

Question: does replacing the 2-rung f32 ladder (factor at 0 AND 1e-4,
select the first finite — ~33 us/step of the active loop, loop_variants.py)
with ONE guaranteed factorization at fixed 1e-4 relative jitter move the
Z moments any further from the float64 fine-ladder TRUTH than the ladder
already sits?

The reference's own conditioning policy is UNCONDITIONAL jitter
(bq_c.pyx::improve_covariance_conditioning adds a scaled diagonal bump with
no try/retry), so "fixed 1e-4" is the reference-faithful spelling; the
minimal-jitter-first ladder was our round-1 embellishment. What must be
checked is accuracy: a 1e-4 bump on a well-conditioned Gram perturbs alpha
by ~j/lambda_min in the rough eigendirections. The integration vectors z
are smooth (aligned with the LARGE eigenvalues), so the Z-moment drift
should be far below the f32 GH quadrature error (~1e-4) — this measures it.

Runs on CPU in both dtypes: f64 fine ladder = truth; f32 ladder and f32
fixed@1e-4 are the contestants, over the same 40-step active loop as
bench.py's active_loop metric (grid 1e4, max_obs=64). Reports max relative
Z_mean / Z_var deviation from truth along the whole trajectory plus how
many steps each policy's chosen x diverges from truth's.

Usage: JAX_PLATFORMS=cpu python benchmarks/jitter_drift.py
"""

import os
import pathlib
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def run_loop(dtype, mode, n_steps=40):
    """mode: 'ladder' | 'fixed4' (single rung at 1e-4)."""
    import jax

    # The sandbox's site customization re-pins JAX_PLATFORMS to the TPU
    # tunnel even when the env var says cpu (see tests/conftest.py) — and
    # the tunneled compiler crashes on f64 programs. Pin via config too.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import tpubq  # noqa: F401
    from tpubq.models import acquire, bq as bqm
    from tpubq.models.bq import Z_mean, Z_var, _fit_gps
    from tpubq.utils.options import BQOptions

    base = 1e-4 if mode == "fixed4" else 1e-12
    opts = BQOptions(n_candidate=12, candidate_thresh=0.2, max_obs=64,
                     dtype=dtype, base_jitter=base)
    rng = np.random.default_rng(0)
    x0 = np.sort(rng.uniform(-3, 3, size=(10, 1)), axis=0)
    l0 = np.exp(-0.5 * (x0[:, 0] - 0.2) ** 2 / 0.25) / np.sqrt(2 * np.pi * 0.25)
    state = bqm.init_state(x0, l0, opts, params_tl=(0.7, 0.8),
                           params_l=(0.3, 0.4), x_mean=[0.0], x_var=[[1.0]])
    grid = jnp.asarray(np.linspace(-4, 4, 10000), opts.np_dtype)[:, None]
    mu, sig2 = 0.2, 0.25

    def loglik(x):
        return jnp.exp(-0.5 * (x[0] - mu) ** 2 / sig2) / jnp.sqrt(
            2 * jnp.pi * sig2)

    ladder = mode == "ladder"

    def step(st, _):
        x_next, _s = acquire.choose_next(st, opts, grid)
        i = jnp.minimum(st.ns, opts.max_obs - 1)
        st = st._replace(
            x_s=st.x_s.at[i].set(x_next),
            l_s=st.l_s.at[i].set(loglik(x_next)),
            obs_mask=st.obs_mask.at[i].set(True),
            ns=jnp.minimum(st.ns + 1, opts.max_obs),
        )
        st = _fit_gps(st, opts, ladder=ladder)
        return st, (x_next[0], Z_mean(st, opts), Z_var(st, opts))

    _st, (xs, zm, zv) = jax.jit(
        lambda s: jax.lax.scan(step, s, None, length=n_steps))(state)
    return np.asarray(xs, np.float64), np.asarray(zm, np.float64), np.asarray(zv, np.float64)


def main():
    xs_t, zm_t, zv_t = run_loop("float64", "ladder")
    print(f"truth (f64 ladder): Z_mean[-1]={zm_t[-1]:.6e} Z_var[-1]={zv_t[-1]:.3e}")
    for mode in ("ladder", "fixed4"):
        xs, zm, zv = run_loop("float32", mode)
        dzm = np.max(np.abs(zm - zm_t) / np.maximum(np.abs(zm_t), 1e-300))
        dzv = np.max(np.abs(zv - zv_t) / np.maximum(np.abs(zv_t), 1e-300))
        # V[Z] decays to the f32 cancellation floor; also report drift over
        # the first 20 steps where V[Z] is still f32-resolvable
        dzv20 = np.max(np.abs(zv[:20] - zv_t[:20])
                       / np.maximum(np.abs(zv_t[:20]), 1e-300))
        ndx = int(np.sum(np.abs(xs - xs_t) > 1e-6))
        print(f"f32 {mode:7s}: max|dZm|/Zm={dzm:.2e}  max|dZv|/Zv={dzv:.2e} "
              f"(first20: {dzv20:.2e})  x-divergence steps: {ndx}/{len(xs)}")
    # f64 fixed@1e-4 isolates the jitter-policy effect from f32 rounding
    xs, zm, zv = run_loop("float64", "fixed4")
    dzm = np.max(np.abs(zm - zm_t) / np.maximum(np.abs(zm_t), 1e-300))
    dzv = np.max(np.abs(zv - zv_t) / np.maximum(np.abs(zv_t), 1e-300))
    ndx = int(np.sum(np.abs(xs - xs_t) > 1e-6))
    print(f"f64 fixed4 : max|dZm|/Zm={dzm:.2e}  max|dZv|/Zv={dzv:.2e} "
          f" x-divergence steps: {ndx}/{len(xs)}")


if __name__ == "__main__":
    main()
