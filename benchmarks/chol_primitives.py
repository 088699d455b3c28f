"""Raw TPU cost of small-matrix Cholesky/tri-solve variants.

Answers one question for the single-problem refit redesign: is a stacked
jnp.linalg.cholesky on (B, n, n) vectorized over B (cost ~ one matrix) or
serialized (cost ~ B matrices)? Plus block-diagonal folding (one bigger
matrix instead of several small calls) and the Pallas batch-major kernel
at sub-lane batch sizes, and the same for the [y | I] chol_solve.

Usage: python benchmarks/chol_primitives.py
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    import jax
    import jax.numpy as jnp

    import tpubq  # noqa: F401
    from tpubq.ops import pallas_kernels as pk

    platform = jax.devices()[0].platform
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    def spd(n):
        A = rng.standard_normal((n, n))
        return jnp.asarray(A @ A.T + n * np.eye(n), dtype)

    def time_op(fn, x, iters=400, reps=3):
        # scan-differenced: perturb the input through the carry so nothing
        # hoists; fixed costs cancel in the (long - short) difference
        def make(k):
            def step(c, _):
                y = fn(x * (1.0 + c))
                return c + 1e-30 * jnp.sum(jax.tree.leaves(y)[0]), None

            return jax.jit(lambda c0: jax.lax.scan(step, c0, None, length=k)[0])

        def run(k):
            f = make(k)
            c0 = jnp.asarray(1e-9, dtype)
            jax.block_until_ready(f(c0))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                jax.block_until_ready(f(c0))
                ts.append(time.perf_counter() - t0)
            return min(ts)

        t_s, t_l = run(iters // 4), run(iters)
        return (t_l - t_s) / (iters - iters // 4)

    print(f"platform={platform}")
    cases = []
    for n in (64, 80, 128, 160, 280):
        cases.append((f"chol({n})", jnp.linalg.cholesky, spd(n)))
    for b, n in ((2, 64), (2, 80), (4, 80), (8, 80), (2, 160)):
        A = jnp.stack([spd(n) for _ in range(b)])
        cases.append((f"chol({b},{n})", jnp.linalg.cholesky, A))
    if pk.on_tpu():
        for b, n in ((8, 80), (8, 128)):
            A = jnp.stack([spd(n) for _ in range(b)])
            if pk.bm_supported(n, b):
                cases.append((f"bm({b},{n})", pk.cholesky_batch_major, A))

    import jax.scipy as jsp

    for n, m in ((64, 65), (80, 81), (160, 162)):
        L = jnp.linalg.cholesky(spd(n))
        R = jnp.asarray(rng.standard_normal((n, m)), dtype)

        def solve(x, L=L):
            return jsp.linalg.cho_solve((L, True), x)

        cases.append((f"cho_solve({n},{m})", solve, R))
    # batched solve: (2, n, m) against a stacked L
    n, m = 80, 81
    Ls = jnp.stack([jnp.linalg.cholesky(spd(n)) for _ in range(2)])
    Rs = jnp.asarray(rng.standard_normal((2, n, m)), dtype)

    def solve2(x):
        return jsp.linalg.cho_solve((Ls, True), x)

    cases.append(("cho_solve(2,80,81)", solve2, Rs))

    for name, fn, x in cases:
        dt = time_op(fn, x)
        print(f"{name:20s}: {dt*1e6:8.2f} us")


if __name__ == "__main__":
    main()
