"""Rung-stacking experiment: fold the two f32 jitter-ladder rungs into ONE
batched Cholesky round instead of two sequential ones.

Context: the f32 `jitter_cholesky` (ops/linalg.py) factors its two rungs
(0, 1e-4) unconditionally and selects the first finite factor with data
flow — two `posdef_cholesky` calls in sequence. On the single-problem path
that is 2 × ~12 µs of serial latency; under fleet/marginalize vmap it is
two full batched Cholesky rounds of B matrices each.

Hypothesis: stacking the rungs into the batch axis — factor (2B, n, n) in
one `posdef_cholesky` round, then select per problem — costs ~one round:
the batch-major Pallas kernel lays batch in VPU lanes, so 2B vs B is close
to free while lanes are under-occupied. If true, the fleet refit (the
measured roofline of the B=64 active loop, PARITY addendum (i)) drops by
up to one batched-factorization round per step.

Variants timed (scan-differenced, B problems × n × n PSD Grams with a
controllable fraction of rung-0 failures):
  seq2   — production shape: two sequential batched rounds (vmap over B,
           rung loop outside), data-flow select
  stack  — one (2B, n, n) round via posdef_cholesky's batching rule,
           select finite-finest per problem
  one    — single rung-0 round only (the floor; NOT safe, ceiling only)

Usage: python benchmarks/rung_stack.py [--B 64] [--n 48] [--fail 0.1]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--B", type=int, default=64)
    p.add_argument("--n", type=int, default=48)
    p.add_argument("--fail", type=float, default=0.1,
                   help="fraction of matrices that need the 1e-4 rung")
    p.add_argument("--reps", type=int, default=7)
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"],
                   help="force a platform (cpu skips the axon tunnel, which "
                        "can hang init when wedged — probe with a bounded "
                        "`timeout 90 python -c 'import jax; jax.devices()'` "
                        "before running TPU)")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from tpubq.utils.profiling import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp

    from tpubq.ops import linalg

    B, n = args.B, args.n
    rng = np.random.RandomState(0)
    # PSD Grams; a `fail` fraction made numerically singular at rung 0
    X = rng.randn(B, n, 3)
    K = np.einsum("bik,bjk->bij", X, X) / 3.0
    n_bad = int(round(args.fail * B))
    for b in range(n_bad):
        v = rng.randn(n)
        K[b] = np.outer(v, v)  # rank-1: rung 0 fails in f32
    K = jnp.asarray(K + 1e-6 * np.eye(n), jnp.float32)
    mask = jnp.ones((B, n), bool)

    scale = jax.vmap(linalg._diag_scale)(K, mask)  # (B,)
    eye = jnp.eye(n, dtype=jnp.float32)[None]
    rungs = linalg.JITTER_LADDER_F32

    def seq2(Kb):
        L, ok = None, None
        for r in reversed(rungs):
            Li = jax.vmap(linalg.posdef_cholesky)(
                Kb + eye * (r * scale)[:, None, None])
            oki = jnp.all(jnp.isfinite(Li), axis=(1, 2))
            if L is None:
                L, ok = Li, oki
            else:
                L = jnp.where(oki[:, None, None], Li, L)
                ok = jnp.logical_or(oki, ok)
        return L, ok

    def stack(Kb):
        Ks = jnp.concatenate(
            [Kb + eye * (r * scale)[:, None, None] for r in rungs], axis=0)
        Ls = jax.vmap(linalg.posdef_cholesky)(Ks)  # (2B, n, n)
        L0, L1 = Ls[:B], Ls[B:]  # rung order matches `rungs`
        ok0 = jnp.all(jnp.isfinite(L0), axis=(1, 2))
        ok1 = jnp.all(jnp.isfinite(L1), axis=(1, 2))
        L = jnp.where(ok0[:, None, None], L0, L1)
        return L, jnp.logical_or(ok0, ok1)

    def one(Kb):
        L = jax.vmap(linalg.posdef_cholesky)(Kb)
        return L, jnp.all(jnp.isfinite(L), axis=(1, 2))

    # parity: seq2 and stack must select identical factors
    La, oka = jax.jit(seq2)(K)
    Lb, okb = jax.jit(stack)(K)
    assert np.array_equal(np.asarray(oka), np.asarray(okb))
    sel = np.nanmax(np.abs(np.where(np.isfinite(La), La, 0.0)
                           - np.where(np.isfinite(Lb), Lb, 0.0)))
    print(f"parity seq2 vs stack: max |ΔL| = {sel:.3e}")
    assert sel == 0.0, sel

    def timed(fn, n_iter):
        def body(c, _):
            L, ok = fn(K * (1.0 + c * 1e-30))
            return c + 1e-30 * jnp.sum(L[0, 0]), jnp.sum(ok)

        f = jax.jit(lambda: jax.lax.scan(body, jnp.float32(0.0), None,
                                         length=n_iter))
        jax.block_until_ready(f())
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(f())
            ts.append(time.perf_counter() - t0)
        return min(ts)

    platform = jax.devices()[0].platform
    print(f"platform={platform} B={B} n={n} fail={args.fail}")
    n_s, n_l = 8, 520
    base = None
    for name, fn in (("one", one), ("seq2", seq2), ("stack", stack)):
        dt = (timed(fn, n_l) - timed(fn, n_s)) / (n_l - n_s)
        if base is None:
            base = dt
        print(f"{name:6s}: {dt * 1e6:8.1f} µs/round  ({dt / base:4.2f}× the single-rung floor)")


if __name__ == "__main__":
    main()
