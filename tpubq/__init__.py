"""tpubq — TPU-native Bayesian Quadrature.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``jhamrick/bayesian-quadrature`` (reference: ``bayesian_quadrature/bq.py::BQ``):
an Osborne-style Bayesian Quadrature estimator that places a Gaussian process
on the *log*-likelihood, linearizes the exp-transform, and estimates the
evidence integral ``Z = ∫ ℓ(x) N(x | x_mean, x_var) dx`` with closed-form
mean and variance, driving active sampling by expected-squared-mean scoring.

Unlike the reference (Python + Cython, sequential CPU loops), every numeric
path here is a batched XLA program: candidate scoring is one fused dispatch
over the whole grid, hyperparameter restarts and marginalization samples run
as batched Cholesky pipelines, and the hot kernels (Gram construction,
blocked Cholesky, fused MLL+gradient) have Pallas TPU implementations.

Precision note: the correctness targets (1e-6 relative error of E[Z]/V[Z]
against closed forms) require float64, so x64 is enabled at import. TPU hot
paths run float32 via ``dtype="float32"`` options (bfloat16 state is NOT
supported — the Z/ESM closed forms are cancellation-dominated and lose all
signal below f32; bf16 on this workload only ever appears inside matmul
passes, which the matmul-precision pin below already disables).
"""

import os as _os

import jax as _jax

# Library-level knob: tpubq's parity numerics want x64 available and
# full-precision matmuls. Embedders that manage their own JAX config can opt
# out with TPUBQ_NO_GLOBAL_CONFIG=1 (f64 paths then require the host app to
# enable x64 itself; f32 paths must pass dtype="float32" options anyway).
if not _os.environ.get("TPUBQ_NO_GLOBAL_CONFIG"):
    _jax.config.update("jax_enable_x64", True)
    # TPU matmuls default to bf16 passes; this workload's matmuls are tiny
    # (Grams of a few hundred rows — MXU time is negligible) while its
    # numerics hinge on cancellation (posterior covariances, Schur
    # complements), so pin full-precision accumulation globally.
    _jax.config.update("jax_default_matmul_precision", "highest")

from tpubq.utils.options import BQOptions

__version__ = "0.1.0"
__all__ = ["BQ", "BQFleet", "BQOptions", "__version__"]


def __getattr__(name):
    # Lazy: the BQ class pulls in fit/acquire/marginalize; keep `import tpubq`
    # light so ops-only users (and the Pallas kernels) import fast.
    if name == "BQFleet":
        from tpubq.models.batched import BQFleet

        return BQFleet
    if name == "BQ":
        from tpubq.models.api import BQ

        return BQ
    raise AttributeError(f"module 'tpubq' has no attribute {name!r}")
