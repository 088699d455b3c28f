from tpubq.ops import integrals, kernels, linalg

__all__ = ["integrals", "kernels", "linalg"]
