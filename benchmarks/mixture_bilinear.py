"""Validate the mixture-pair-measure V[Z] bilinear form (VERDICT r4 next #3).

The f32 Matérn V[Z] currently pays GH cusp floors (512 nodes 1-D → ~5e-4,
48/axis 2-D → ~1.5e-3): the integrand m̃(x) C_tl(x,x') m̃(x') has the
kernel's diagonal derivative cusp inside the quadrature domain. The fix
explored here decomposes V = A − βᵀK̃⁻¹β with the CUSP-CARRYING kernel
k_tl expanded in its Gamma scale mixture (k_tl = h² Σ_j c_j g_j, g_j
gaussian), and the gaussian absorbed into the quadrature MEASURE:

  A   = Σ_j c_j · Z_j · E_j[ m̃(x) m̃(x') ],   Z_j = ∫∫ k_j p p  (closed form)
        (x, x') ~ the 2d-dim gaussian ∝ p(x) p(x') g_j(x−x'):
        s = (x+x'−2μ)/√2 ~ N(0, Σ) ⊥ r = (x−x')/√2 ~ N(0, (Σ⁻¹+2W_j⁻¹)⁻¹)
  β_i = Σ_j c_j · int_K(X_i; w_j) · E_ij[ m̃(x) ],
        x ~ N(μ_ij, V_j), V_j = (Σ⁻¹+W_j⁻¹)⁻¹, μ_ij = V_j(W_j⁻¹X_i + Σ⁻¹μ)

Every expectation integrand is m̃ (the linear-GP mean + γ: C^{2ν} smooth,
evaluated stably from posterior VALUES, never through the α-amplified
closed-form assembly that is f32-fatal), so GH converges at m̃'s smoothness,
not the kernel cusp's. The remaining top-level cancellation A − βᵀK̃⁻¹β is
the same one the GH bilinear already carries implicitly (aᵀKoo a − ‖Va‖²).

This script validates against the f64 exact closed form (Gamma-mixture
cross-kernel family, ~1e-12) and measures the f32 floor.

Usage: JAX_PLATFORMS=cpu python benchmarks/mixture_bilinear.py
"""

import dataclasses
import os
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # the sandbox's site customization pins JAX_PLATFORMS to the TPU tunnel
    # even when the env var is overridden; pin via config (see tests/conftest)
    import jax

    jax.config.update("jax_platforms", "cpu")


def build_state(kernel, d, dtype):
    import jax.numpy as jnp

    from tpubq.models import bq as bqm
    from tpubq.utils.options import BQOptions

    opts = BQOptions(n_candidate=12, candidate_thresh=0.2, max_obs=32,
                     dtype=dtype, kernel=kernel, use_pallas=False)
    rng = np.random.default_rng(0)
    x0 = np.sort(rng.uniform(-2.5, 2.5, size=(10, d)), axis=0)
    l0 = np.exp(-0.5 * np.sum((x0 - 0.2) ** 2, -1) / 0.25)
    if kernel == "rq":
        ptl, pl = (0.7, 0.8, 2.0), (0.3, 0.4, 2.0)
    else:
        ptl, pl = (0.7, 0.8), (0.3, 0.4)
    state = bqm.init_state(
        x0, l0, opts, params_tl=ptl, params_l=pl,
        x_mean=[0.0] * d, x_var=(np.eye(d) * 1.0).tolist())
    return state, opts


def mixture_bilinear_zvar(state, opts, n_pair_axis=16, n_b_axis=16):
    """The candidate production form (prototype)."""
    import jax
    import jax.numpy as jnp

    from tpubq.models import gp as gpm
    from tpubq.ops import integrals as igr
    from tpubq.ops import linalg
    from tpubq.ops.kernels import get_kernel
    from scipy.special import roots_hermitenorm

    kfn, _ = get_kernel(opts.kernel)
    dtype = state.x_s.dtype
    d = opts.dim
    mu, Sig = state.x_mean, state.x_var
    gp_tl, gp_l = state.gp_log_l, state.gp_l
    h_tl, w_tl = gp_tl.theta[0], gp_tl.theta[1:1 + d]

    # mixture rule for the OUTER (tl) kernel
    if opts.kernel.startswith("matern"):
        nu = 2.5 if opts.kernel == "matern52" else 1.5
        t, wq = igr._matern_mix_rule(nu)
        s2 = jnp.asarray(t / nu, dtype)          # width² multipliers
        wq = jnp.asarray(wq, dtype)
    elif opts.kernel == "rq":
        s2, wq = igr.rq_mix_rule(gp_tl.theta[-1], dtype)
    else:
        raise ValueError(opts.kernel)
    ws = jnp.sqrt(s2)[:, None] * w_tl[None, :]   # (J, d) component widths

    def m_tilde(pts):  # (m, d) -> (m,) linear-GP mean + gamma  (stable)
        return gpm.gp_mean(kfn, gp_l, pts) + state.gamma

    Sig_inv = jnp.linalg.inv(Sig)
    L_Sig = jnp.linalg.cholesky(Sig)

    # ---- A-term: pair-measure expectations -----------------------------
    gx, gw = roots_hermitenorm(n_pair_axis)
    gx = jnp.asarray(gx, dtype)
    gw = jnp.asarray(gw / np.sqrt(2.0 * np.pi), dtype)
    # tensor nodes in 2d dims: a (s coords), b (r coords)
    grids = jnp.meshgrid(*([gx] * (2 * d)), indexing="ij")
    U = jnp.stack([g.ravel() for g in grids], -1)          # (n_u, 2d)
    wg = jnp.meshgrid(*([gw] * (2 * d)), indexing="ij")
    W_u = jnp.prod(jnp.stack([g.ravel() for g in wg]), 0)  # (n_u,)
    a_nodes, b_nodes = U[:, :d], U[:, d:]

    def A_comp(wj):
        Winv = 1.0 / (wj * wj)
        Sr = jnp.linalg.inv(Sig_inv + 2.0 * jnp.diag(Winv))
        L_r = jnp.linalg.cholesky(Sr)
        s = a_nodes @ L_Sig.T
        r = b_nodes @ L_r.T
        x = mu + (s + r) / jnp.sqrt(jnp.asarray(2.0, dtype))
        xp = mu + (s - r) / jnp.sqrt(jnp.asarray(2.0, dtype))
        E = jnp.sum(W_u * m_tilde(x) * m_tilde(xp))
        Z_j = igr.int_int_K(d, h_tl, wj, mu, Sig)
        return Z_j * E

    A = wq @ jax.vmap(A_comp)(ws)

    # ---- beta: conditional-measure expectations ------------------------
    gxb, gwb = roots_hermitenorm(n_b_axis)
    gxb = jnp.asarray(gxb, dtype)
    gwb = jnp.asarray(gwb / np.sqrt(2.0 * np.pi), dtype)
    gridsb = jnp.meshgrid(*([gxb] * d), indexing="ij")
    Ub = jnp.stack([g.ravel() for g in gridsb], -1)        # (n_b, d)
    wgb = jnp.meshgrid(*([gwb] * d), indexing="ij")
    W_b = jnp.prod(jnp.stack([g.ravel() for g in wgb]), 0)

    X = state.x_s                                          # (n, d) padded
    m_s = state.obs_mask.astype(dtype)

    def beta_comp(wj):
        Wj_inv = 1.0 / (wj * wj)
        Vj = jnp.linalg.inv(Sig_inv + jnp.diag(Wj_inv))
        L_V = jnp.linalg.cholesky(Vj)
        # conditional means per observation point
        mu_i = (X * Wj_inv[None, :] + (Sig_inv @ mu)[None, :]) @ Vj.T  # (n, d)
        pts = mu_i[:, None, :] + Ub[None, :, :] @ L_V.T    # (n, n_b, d)
        vals = m_tilde(pts.reshape(-1, d)).reshape(X.shape[0], -1)
        E_i = vals @ W_b                                   # (n,)
        coeff = igr.int_K(X, h_tl, wj, mu, Sig)            # (n,)
        return coeff * E_i

    beta = (wq @ jax.vmap(beta_comp)(ws)) * m_s
    u = linalg.tri_solve(gp_tl.L, beta)
    return A - u @ u


def main():
    import jax
    import jax.numpy as jnp

    import tpubq  # noqa: F401
    from tpubq.models import bq as bqm

    for kernel in ("matern52", "matern32", "rq"):
        for d in (1, 2):
            state, opts = build_state(kernel, d, "float64")
            # f64 truth
            if kernel == "rq":
                # converged GH is the best available truth for rq V[Z]
                ref = float(bqm.Z_var_gh(state, dataclasses.replace(opts, n_gh=2048 if d == 1 else 96 ** 2)))
            else:
                ref = float(bqm.Z_var_exact(state, opts))
            gh = float(bqm.Z_var_gh(state, opts))
            print(f"{kernel} d={d}: ref={ref:.6e}  GH(prod)={gh:.6e} "
                  f"rel={abs(gh - ref) / ref:.2e}")
            for n_pair in (8, 12, 16, 20):
                v = float(mixture_bilinear_zvar(state, opts, n_pair, n_pair))
                print(f"   mix f64 n={n_pair}/axis: {v:.6e}  "
                      f"rel={abs(v - ref) / ref:.2e}")
            # f32 floor
            state32, opts32 = build_state(kernel, d, "float32")
            gh32 = float(bqm.Z_var(state32, opts32))
            print(f"   GH f32(prod dispatch): rel={abs(gh32 - ref) / ref:.2e}")
            for n_pair in (12, 16):
                v32 = float(mixture_bilinear_zvar(state32, opts32, n_pair, n_pair))
                print(f"   mix f32 n={n_pair}/axis: rel={abs(v32 - ref) / ref:.2e}")


if __name__ == "__main__":
    main()
