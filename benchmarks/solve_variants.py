"""Measure triangular-solve variants on the two thin driver metrics' hot
paths (VERDICT r4 next #1):

1. gp_fit's (alpha, Kinv) production — currently ONE chol_solve with the
   stacked [y | I] right-hand side (n+1 RHS, forward+backward sweeps):
     a) joint:  sol = cho_solve(L, [y | I])
     b) split:  alpha = cho_solve(L, y); Kinv = cho_solve(L, I)
        (lets XLA DCE the Kinv solve on paths that never read it —
        marginalize's 100-sample pipeline returns only Z moments)
     c) linv:   Linv = solve_triangular(L, I); Kinv = Linv^T Linv;
        alpha = cho_solve(L, y)   (ONE n-RHS triangular sweep instead of
        two, plus an MXU matmul — LAPACK potri's construction)
2. the f32 V[Z] quadrature bilinear form a^T C_tl a — currently materializes
   the full (m, n) solve and (m, m) covariance:
     a) full:   C = Koo - V^T V, V = L^{-1} Kox^T (n x m);  a @ C @ a
     b) vector: a^T (Koo a) - ||L^{-1} (Kox^T a)||^2   (1-RHS solve)

Both at the single-problem shape (n=64/76) and the marginalize batch
(B=100), scan-differenced with perturbed carries (anti-hoist, same
methodology as single_loop_breakdown.py).

Usage: python benchmarks/solve_variants.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp
    from jax import scipy as jsp

    import tpubq  # noqa: F401

    platform = jax.devices()[0].platform
    dtype = jnp.float32 if platform != "cpu" else jnp.float64
    rng = np.random.default_rng(0)

    def spd(n):
        x = rng.uniform(-3, 3, size=(n, 1))
        K = np.exp(-0.5 * (x - x.T) ** 2 / 0.4**2) + 1e-4 * np.eye(n)
        return jnp.asarray(np.linalg.cholesky(K), dtype)

    def timeit(fn, args, n_steps=60, k_short=4, k_long=16, reps=3):
        def step(eps, _):
            pert = tuple(a * (1.0 + eps) for a in args)
            y = fn(*pert)
            s = sum(jnp.sum(v) for v in jax.tree.leaves(y))
            return eps + 1e-25 * s, None

        def loop(eps, _):
            e, _ = jax.lax.scan(step, eps, None, length=n_steps)
            return e, None

        def run(K):
            f = jax.jit(lambda e: jax.lax.scan(loop, e, None, length=K))
            e0 = jnp.asarray(1e-9, dtype)
            jax.block_until_ready(f(e0))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(f(e0))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_s, t_l = run(k_short), run(k_long)
        return (t_l - t_s) / ((k_long - k_short) * n_steps)

    print(f"platform={platform} dtype={dtype.__name__}")

    # ---- 1. (alpha, Kinv) production at n in {64, 76} -----------------
    for n in (64, 76):
        L = spd(n)
        y = jnp.asarray(rng.normal(size=n), dtype)
        eye = jnp.eye(n, dtype=dtype)

        def joint(L, y):
            sol = jsp.linalg.cho_solve((L, True), jnp.concatenate(
                [y[:, None], eye], axis=1))
            return sol[:, 0], sol[:, 1:]

        def split(L, y):
            a = jsp.linalg.cho_solve((L, True), y)
            Ki = jsp.linalg.cho_solve((L, True), eye)
            return a, Ki

        def linv(L, y):
            a = jsp.linalg.cho_solve((L, True), y)
            Li = jsp.linalg.solve_triangular(L, eye, lower=True)
            return a, Li.T @ Li

        def alpha_only(L, y):
            return jsp.linalg.cho_solve((L, True), y)

        for name, fn in (("joint", joint), ("split", split), ("linv", linv),
                         ("alpha_only", alpha_only)):
            dt = timeit(fn, (L, y))
            print(f"  kinv n={n} {name:10s}: {dt*1e6:8.2f} us")
        # accuracy cross-check
        aj, Kj = joint(L, y)
        for name, fn in (("split", split), ("linv", linv)):
            a2, K2 = fn(L, y)
            print(f"    {name}: |dKinv|_max={float(jnp.max(jnp.abs(K2-Kj))):.2e}"
                  f" |dalpha|_max={float(jnp.max(jnp.abs(a2-aj))):.2e}")

    # ---- batched at B=100 (the marginalize shape) ----------------------
    B, n = 100, 76
    Ls = jnp.stack([spd(n) for _ in range(B)])
    ys = jnp.asarray(rng.normal(size=(B, n)), dtype)
    eye = jnp.eye(n, dtype=dtype)

    def bjoint(Ls, ys):
        def one(L, y):
            sol = jsp.linalg.cho_solve((L, True), jnp.concatenate(
                [y[:, None], eye], axis=1))
            return sol[:, 0], sol[:, 1:]
        return jax.vmap(one)(Ls, ys)

    def balpha(Ls, ys):
        return jax.vmap(lambda L, y: jsp.linalg.cho_solve((L, True), y))(Ls, ys)

    for name, fn in (("joint", bjoint), ("alpha_only", balpha)):
        dt = timeit(fn, (Ls, ys), n_steps=20)
        print(f"  B={B} n={n} {name:10s}: {dt*1e6:8.2f} us")

    # ---- 2. V[Z] bilinear form at (n=64, m=128 GH nodes) ---------------
    n, m = 64, 128
    L = spd(n)
    Kox = jnp.asarray(rng.uniform(0.1, 1.0, size=(m, n)), dtype)
    Koo = jnp.asarray(
        np.exp(-0.5 * (np.linspace(-3, 3, m)[:, None]
                       - np.linspace(-3, 3, m)[None, :]) ** 2), dtype)
    a = jnp.asarray(rng.normal(size=m) * 0.01, dtype)

    def full(L, Kox, a):
        V = jsp.linalg.solve_triangular(L, Kox.T, lower=True)
        C = Koo - V.T @ V
        Ca = C @ a
        return a @ Ca

    def vector(L, Kox, a):
        u = jsp.linalg.solve_triangular(L, Kox.T @ a, lower=True)
        return a @ (Koo @ a) - u @ u

    for name, fn in (("full", full), ("vector", vector)):
        dt = timeit(fn, (L, Kox, a))
        print(f"  zvar n={n} m={m} {name:8s}: {dt*1e6:8.2f} us")
    print(f"    rel diff: "
          f"{abs(float(full(L, Kox, a) - vector(L, Kox, a)) / float(full(L, Kox, a))):.2e}")

    # batched vector-vs-full at B=100 (the marginalize Z_var shape)
    Ls = jnp.stack([spd(n) for _ in range(B)])
    As = jnp.asarray(rng.normal(size=(B, m)) * 0.01, dtype)

    for name, fn in (("full", full), ("vector", vector)):
        bf = lambda Ls, As: jax.vmap(lambda L, a: fn(L, Kox, a))(Ls, As)
        dt = timeit(bf, (Ls, As), n_steps=20)
        print(f"  zvar B={B} {name:8s}: {dt*1e6:8.2f} us")


if __name__ == "__main__":
    main()
