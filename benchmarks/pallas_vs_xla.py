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
  * blocked chol  — single (N, N), N = 256..1024 (the kernel is VMEM-
                    resident; 2048 f32 exceeds the ~16 MB scoped VMEM).
  * blocked solve — L^{-1} R with R = (nsc, G) (the chol_solve behind the
                    XLA ESM path) and (N, N) at N = 1024 (M likewise
                    VMEM-bounded in the current kernel).

Timing methodology (axon tunnel): a bare op dispatch pays ~5 ms of tunnel
overhead, drowning sub-ms compute. Each op is therefore repeated ITERS times
inside ONE jitted ``lax.scan`` whose carry feeds a tiny data-dependent
perturbation back into the inputs (defeats dedup/DCE), and the per-iteration
time is (total - overhead) / ITERS with overhead measured by a 1-iteration
run of the same program shape.

Usage: PYTHONPATH=/root/repo python benchmarks/pallas_vs_xla.py [--csv out]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import scipy as jsp

import tpubq  # noqa: F401  (pins x64 + matmul precision)
from tpubq.ops import pallas_kernels as pk
from tpubq.ops.kernels import gaussian_K

ITERS = 256


def _scan_timer(op, advance, args, iters=ITERS):
    """Wall time per op application inside one jitted scan (min of 3;
    1-iteration program of identical shape subtracted as dispatch overhead)."""

    def make(n):
        @jax.jit
        def run(args):
            def body(a, _):
                out = op(*a)
                return advance(a, out), jnp.sum(out)

            a, s = jax.lax.scan(body, args, None, length=n)
            return s

        return run

    big, one = make(iters), make(1)
    jax.block_until_ready(big(args))  # compile
    jax.block_until_ready(one(args))

    def best(f, reps=3):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f(args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_one = best(one)
    t_big = best(big)
    return max(t_big - t_one, 1e-9) / (iters - 1)


def _bench(name, xla_op, pal_op, advance, args, rows):
    t_x = _scan_timer(xla_op, advance, args)
    t_p = _scan_timer(pal_op, advance, args)
    ox = np.asarray(jax.jit(xla_op)(*args))
    op_ = np.asarray(jax.jit(pal_op)(*args))
    err = float(np.max(np.abs(ox - op_)) / (np.max(np.abs(ox)) + 1e-30))
    winner = "pallas" if t_p < t_x else "xla"
    rows.append((name, t_x * 1e3, t_p * 1e3, t_x / t_p, err, winner))
    print(f"{name:26s} xla {t_x*1e3:9.4f} ms   pallas {t_p*1e3:9.4f} ms   "
          f"speedup {t_x/t_p:6.2f}x   relerr {err:.2e}   -> {winner}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", default=None)
    args_ns = ap.parse_args()
    assert pk.on_tpu(), "dispatch measurements must run on the real chip"
    rng = np.random.default_rng(0)
    dtype = jnp.float32
    rows = []

    # -- Gram ---------------------------------------------------------------
    for n1, n2 in ((48, 48), (48, 10_000), (48, 100_000), (512, 512)):
        theta = jnp.asarray([0.8, 0.6], dtype)
        x1 = jnp.asarray(rng.uniform(-2, 2, (n1, 1)), dtype)
        x2 = jnp.asarray(rng.uniform(-3, 3, (n2, 1)), dtype)

        def advance(a, out):
            t, a1, a2 = a
            return (t, a1 + 1e-7 * out[:, :1], a2 + 1e-7 * out.T[:, :1])

        _bench(
            f"gram_{n1}x{n2}",
            gaussian_K,
            functools.partial(pk.gaussian_gram, interpret=False),
            advance, (theta, x1, x2), rows,
        )

    # -- batched Cholesky ----------------------------------------------------
    for B, N in ((100, 48), (1024, 48)):
        A = rng.standard_normal((B, N, N))
        K = jnp.asarray(np.einsum("bij,bkj->bik", A, A) + N * np.eye(N), dtype)

        def advance(a, out):
            return (a[0] + 1e-6 * jnp.einsum("bij,bkj->bik", out, out),)

        _bench(
            f"batched_chol_{B}x{N}",
            jax.vmap(jnp.linalg.cholesky),
            functools.partial(pk.cholesky_batched, interpret=False),
            advance, (K,), rows,
        )

    # -- blocked Cholesky (single large matrix) -------------------------------
    for N in (256, 512, 1024):
        A = rng.standard_normal((N, N))
        K = jnp.asarray(A @ A.T + N * np.eye(N), dtype)

        def advance(a, out):
            return (a[0] + 1e-6 * (out @ out.T),)

        _bench(
            f"blocked_chol_{N}",
            jnp.linalg.cholesky,
            functools.partial(pk.cholesky_blocked, interpret=False),
            advance, (K,), rows,
        )

    # -- blocked triangular solve ---------------------------------------------
    for N, M in ((48, 2_000), (48, 10_000), (1024, 1024)):
        A = rng.standard_normal((N, N))
        L = jnp.asarray(np.linalg.cholesky(A @ A.T + N * np.eye(N)), dtype)
        R = jnp.asarray(rng.standard_normal((N, M)), dtype)

        def advance(a, out):
            return (a[0], a[1] + 1e-6 * out)

        _bench(
            f"blocked_solve_{N}x{M}",
            lambda L, R: jsp.linalg.solve_triangular(L, R, lower=True),
            functools.partial(pk.tri_solve_blocked, interpret=False),
            advance, (L, R), rows,
        )

    # -- batch-major Cholesky (batch in the VPU lanes) ------------------------
    # The one batched shape class where Pallas beats XLA (XLA serializes one
    # custom call per matrix; the batch-major kernel factors one problem per
    # lane). Shapes: marginalize sample batches and fleet refits.
    for B, N in ((100, 26), (64, 76), (1024, 26)):
        A = rng.standard_normal((B, N, N))
        Ks = jnp.asarray(A @ np.transpose(A, (0, 2, 1)) + N * np.eye(N), dtype)

        def advance(a, out):
            return (a[0] * (1.0 + 1e-9 * out[0, 0, 0]),)

        _bench(
            f"batchmajor_chol_{B}x{N}",
            jnp.linalg.cholesky,
            functools.partial(pk.cholesky_batch_major, interpret=False),
            advance, (Ks,), rows,
        )

    if args_ns.csv:
        with open(args_ns.csv, "w") as f:
            f.write("case,xla_ms,pallas_ms,speedup,relerr,winner\n")
            for r in rows:
                f.write(",".join(str(v) for v in r) + "\n")


if __name__ == "__main__":
    main()
