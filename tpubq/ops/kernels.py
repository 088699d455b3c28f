"""Covariance kernels.

Reference parity: the reference imports its kernels from the external ``gp``
package (``gp/kernels/gaussian.py::GaussianKernel``,
``gp/kernels/periodic.py::PeriodicKernel``), each backed by a Cython
extension for evaluation and hand-written parameter jacobians. Here kernels
are pure-JAX functions of a flat parameter vector; derivatives come from
``jax.grad`` (no hand-written jacobians), and the Gram-matrix hot path has a
Pallas TPU kernel (``tpubq.ops.pallas_kernels``).

Parameterization:
  gaussian: ``theta = [h, w_1, ..., w_d]`` with
      k(a, b) = h^2 exp(-1/2 * sum_j ((a_j - b_j) / w_j)^2)
  periodic: ``theta = [h, w, p]`` (1-D circular domains), with
      k(a, b) = h^2 exp(-2 sin^2((a - b) / (2 p)) / w^2)

All evaluation functions take ``x1: (n1, d)``, ``x2: (n2, d)`` and return the
``(n1, n2)`` Gram matrix in the dtype of the inputs.
"""

from __future__ import annotations

import jax.numpy as jnp


def sqdist(x1: jnp.ndarray, x2: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Scaled squared distances sum_j ((x1_i - x2_j) / w_j)^2 → (n1, n2)."""
    a = x1 / w
    b = x2 / w
    d2 = jnp.sum((a[:, None, :] - b[None, :, :]) ** 2, axis=-1)
    return d2


def gaussian_K(theta: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Gaussian (RBF) Gram matrix. Reference: gp/kernels/gaussian.py::GaussianKernel.K."""
    h = theta[0]
    w = theta[1:]
    return (h * h) * jnp.exp(-0.5 * sqdist(x1, x2, w))


def gaussian_Kdiag(theta: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    h = theta[0]
    return jnp.full((x.shape[0],), h * h, dtype=x.dtype)


def periodic_K(theta: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Periodic Gram matrix. Reference: gp/kernels/periodic.py::PeriodicKernel.K."""
    h, w, p = theta[0], theta[1], theta[2]
    diff = x1[:, None, :] - x2[None, :, :]
    s = jnp.sin(diff / (2.0 * p)) ** 2
    return (h * h) * jnp.exp(-2.0 * jnp.sum(s, axis=-1) / (w * w))


def periodic_Kdiag(theta: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    h = theta[0]
    return jnp.full((x.shape[0],), h * h, dtype=x.dtype)


def matern52_K(theta: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Matérn-5/2 Gram matrix: h² (1 + √5 r + 5r²/3) exp(−√5 r), r = ‖Δ/w‖.

    Capability extension beyond the reference's two kernels (its GP engine
    was kernel-pluggable in principle); Z/ESM paths route through the
    Gauss–Hermite measure quadrature (tpubq.models.bq.int_K_measure), which
    is kernel-agnostic.
    """
    h = theta[0]
    w = theta[1:]
    r2 = sqdist(x1, x2, w)
    r = jnp.sqrt(r2 + 1e-36)  # safe at r = 0 (gradient-stable)
    s5r = jnp.sqrt(5.0) * r
    return (h * h) * (1.0 + s5r + (5.0 / 3.0) * r2) * jnp.exp(-s5r)


def matern52_Kdiag(theta: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    h = theta[0]
    return jnp.full((x.shape[0],), h * h, dtype=x.dtype)


def matern32_K(theta: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Matérn-3/2 Gram matrix: h² (1 + √3 r) exp(−√3 r), r = ‖Δ/w‖.

    Capability extension (see matern52_K); Z/ESM via the kernel-agnostic
    measure quadratures (tpubq.models.bq.int_K_measure).
    """
    h = theta[0]
    w = theta[1:]
    r = jnp.sqrt(sqdist(x1, x2, w) + 1e-36)
    s3r = jnp.sqrt(3.0) * r
    return (h * h) * (1.0 + s3r) * jnp.exp(-s3r)


def matern32_Kdiag(theta: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    h = theta[0]
    return jnp.full((x.shape[0],), h * h, dtype=x.dtype)


def rq_K(theta: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Rational-quadratic Gram: h² (1 + r²/(2α))^{−α}, r = ‖Δ/w‖;
    ``theta = [h, w_1..w_d, α]`` (a scale-mixture of gaussians over inverse
    squared length-scales; α → ∞ recovers the gaussian kernel)."""
    h = theta[0]
    w = theta[1:-1]
    a = theta[-1]
    r2 = sqdist(x1, x2, w)
    return (h * h) * jnp.power(1.0 + r2 / (2.0 * a), -a)


def rq_Kdiag(theta: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    h = theta[0]
    return jnp.full((x.shape[0],), h * h, dtype=x.dtype)


_KERNELS = {
    "gaussian": (gaussian_K, gaussian_Kdiag),
    "periodic": (periodic_K, periodic_Kdiag),
    "matern52": (matern52_K, matern52_Kdiag),
    "matern32": (matern32_K, matern32_Kdiag),
    "rq": (rq_K, rq_Kdiag),
}


def get_kernel(name: str):
    """Return ``(K, Kdiag)`` evaluation functions for a kernel family."""
    try:
        return _KERNELS[name]
    except KeyError:
        raise ValueError(f"unknown kernel {name!r}") from None


class _KernelFacade:
    """Object-style kernel with parameter derivatives — the surface of the
    reference's kernel classes (gp/kernels/gaussian.py::GaussianKernel etc.,
    whose hand-written Cython ``jacobian``/``hessian`` become autodiff here).
    """

    _name: str = ""

    def __init__(self, *params):
        import jax

        self.params = jnp.asarray(params, jnp.result_type(float))
        self._kfn, self._kdiagfn = get_kernel(self._name)
        self._jac = jax.jacfwd(lambda t, a, b: self._kfn(t, a, b))
        self._hess = jax.jacfwd(self._jac)

    @staticmethod
    def _2d(x):
        x = jnp.asarray(x)
        return x[:, None] if x.ndim == 1 else x

    def K(self, x1, x2):
        return self._kfn(self.params, self._2d(x1), self._2d(x2))

    def jacobian(self, x1, x2):
        """∂K/∂params, shape (n1, n2, p) → transposed to (p, n1, n2) as the
        reference returns it."""
        J = self._jac(self.params, self._2d(x1), self._2d(x2))
        return jnp.moveaxis(J, -1, 0)

    def hessian(self, x1, x2):
        H = self._hess(self.params, self._2d(x1), self._2d(x2))
        return jnp.moveaxis(H, (-2, -1), (0, 1))

    def __call__(self, x1, x2):
        return self.K(x1, x2)


class GaussianKernel(_KernelFacade):
    """k(a,b) = h² exp(−(a−b)²/(2w²)); params (h, w) (gaussian.py parity)."""

    _name = "gaussian"

    def __init__(self, h, w):
        super().__init__(h, w)


class PeriodicKernel(_KernelFacade):
    """k(a,b) = h² exp(−2 sin²((a−b)/2p)/w²); params (h, w, p)."""

    _name = "periodic"

    def __init__(self, h, w, p):
        super().__init__(h, w, p)


class Matern52Kernel(_KernelFacade):
    """Matérn-5/2; params (h, w)."""

    _name = "matern52"

    def __init__(self, h, w):
        super().__init__(h, w)


class Matern32Kernel(_KernelFacade):
    """Matérn-3/2; params (h, w)."""

    _name = "matern32"

    def __init__(self, h, w):
        super().__init__(h, w)


class RationalQuadraticKernel(_KernelFacade):
    """Rational quadratic; params (h, w, alpha)."""

    _name = "rq"

    def __init__(self, h, w, alpha):
        super().__init__(h, w, alpha)
