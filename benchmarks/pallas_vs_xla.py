"""Pallas-vs-XLA dispatch measurements for the BASELINE-pinned kernels.

VERDICT r1 #2: every Pallas kernel must either be dispatched on a measured-
winning production path or documented (with numbers) as losing to XLA at all
reachable sizes. This harness produces those numbers on the real chip at the
sizes the BQ workload actually reaches:

  * Gram          — (nsc x nsc) self-Grams (nsc ~ 48) and (nsc x G) cross-
                    Grams against the candidate grid (G = 1e4..1e5): the
                    matrices behind gp_fit and _esm_affine_terms.
  * batched chol  — (B, nsc, nsc), B = 100 hyper samples (marginalize) and
                    B = 1024 (fleet).
  * blocked chol  — single (N, N), N = 256..2048 (large-N capability).
  * blocked solve — L^{-1} R with R = (nsc, G) (the chol_solve behind the
                    XLA ESM path) and (N, N) at N = 1024.

Timing methodology (axon tunnel): per-call inputs VARY (the tunnel dedupes
identical dispatches), calls are enqueued asynchronously and blocked once.

Usage: python benchmarks/pallas_vs_xla.py [--csv out.csv]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import scipy as jsp

import tpubq  # noqa: F401  (pins x64 + matmul precision)
from tpubq.ops import pallas_kernels as pk
from tpubq.ops.kernels import gaussian_K


def _timeit(fn, args_list, n_warm=2):
    """Median wall time per call: async enqueue over varied inputs, one block."""
    for a in args_list[:n_warm]:
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    outs = [fn(*a) for a in args_list]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / len(args_list)
    return dt


def _gram_cases(rng, dtype):
    for n1, n2 in ((48, 48), (48, 10_000), (48, 100_000), (512, 512)):
        theta = jnp.asarray([0.8, 0.6], dtype)
        xs1 = [jnp.asarray(rng.uniform(-2, 2, (n1, 1)), dtype) for _ in range(8)]
        xs2 = [jnp.asarray(rng.uniform(-3, 3, (n2, 1)), dtype) for _ in range(8)]
        args = [(theta, a, b) for a, b in zip(xs1, xs2)]
        xla = jax.jit(gaussian_K)
        pal = lambda t, a, b: pk.gaussian_gram(t, a, b, interpret=False)
        yield f"gram_{n1}x{n2}", xla, pal, args


def _batched_chol_cases(rng, dtype):
    for B, N in ((100, 48), (1024, 48)):
        Ks = []
        for _ in range(8):
            A = rng.standard_normal((B, N, N))
            K = np.einsum("bij,bkj->bik", A, A) + N * np.eye(N)
            Ks.append((jnp.asarray(K, dtype),))
        xla = jax.jit(jax.vmap(jnp.linalg.cholesky))
        pal = lambda K: pk.cholesky_batched(K, interpret=False)
        yield f"batched_chol_{B}x{N}", xla, pal, Ks


def _blocked_chol_cases(rng, dtype):
    # N=2048 exceeds the ~16 MB scoped VMEM (matrix + scratch are VMEM-
    # resident); 1024 is the kernel's practical ceiling at f32.
    for N in (256, 512, 1024):
        Ks = []
        for _ in range(6):
            A = rng.standard_normal((N, N))
            K = A @ A.T + N * np.eye(N)
            Ks.append((jnp.asarray(K, dtype),))
        xla = jax.jit(jnp.linalg.cholesky)
        pal = lambda K: pk.cholesky_blocked(K, interpret=False)
        yield f"blocked_chol_{N}", xla, pal, Ks


def _blocked_solve_cases(rng, dtype):
    # M is VMEM-bounded too (R resident): 1e5 RHS would need a column-tiled
    # grid — measured at the sizes the current kernel admits.
    for N, M in ((48, 2_000), (48, 10_000), (1024, 1024)):
        args = []
        for _ in range(6):
            A = rng.standard_normal((N, N))
            L = np.linalg.cholesky(A @ A.T + N * np.eye(N))
            R = rng.standard_normal((N, M))
            args.append((jnp.asarray(L, dtype), jnp.asarray(R, dtype)))
        xla = jax.jit(lambda L, R: jsp.linalg.solve_triangular(L, R, lower=True))
        pal = lambda L, R: pk.tri_solve_blocked(L, R, interpret=False)
        yield f"blocked_solve_{N}x{M}", xla, pal, args


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()
    assert pk.on_tpu(), "dispatch measurements must run on the real chip"
    rng = np.random.default_rng(0)
    dtype = jnp.float32

    rows = []
    for gen in (_gram_cases, _batched_chol_cases, _blocked_chol_cases, _blocked_solve_cases):
        for name, xla, pal, case_args in gen(rng, dtype):
            t_x = _timeit(xla, case_args)
            t_p = _timeit(pal, case_args)
            # parity check on the first case
            ox = np.asarray(xla(*case_args[0]))
            op = np.asarray(pal(*case_args[0]))
            err = float(np.max(np.abs(ox - op)) / (np.max(np.abs(ox)) + 1e-30))
            winner = "pallas" if t_p < t_x else "xla"
            rows.append((name, t_x * 1e3, t_p * 1e3, t_x / t_p, err, winner))
            print(f"{name:26s} xla {t_x*1e3:9.3f} ms   pallas {t_p*1e3:9.3f} ms   "
                  f"speedup {t_x/t_p:6.2f}x   relerr {err:.2e}   -> {winner}")
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("case,xla_ms,pallas_ms,speedup,relerr,winner\n")
            for r in rows:
                f.write(",".join(str(v) for v in r) + "\n")


if __name__ == "__main__":
    main()
