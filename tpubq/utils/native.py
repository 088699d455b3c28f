"""ctypes loader for the C++ twin of the reference's native layer.

Builds ``native/bq_native.cpp`` with g++ -O3 on first use (cached as a .so
under ``native/build/``) and exposes float64 NumPy wrappers. The library is
an *oracle and baseline*, not the TPU compute path — see the header of
bq_native.cpp. Import degrades gracefully (``available() == False``) when no
compiler is present.
"""

from __future__ import annotations

import ctypes
import hashlib
import math
import pathlib
import subprocess

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parents[2]
_SRC = _ROOT / "native" / "bq_native.cpp"


def _so_path() -> pathlib.Path:
    """Build artifact keyed by a source content hash (mtimes are unreliable
    after git checkout: source and a stale .so get identical timestamps)."""
    digest = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:12]
    return _ROOT / "native" / "build" / f"libbq_native-{digest}.so"


_lib = None
_tried = False

_f8 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
_SIG = {
    "bq_int_K": ([_f8, _f8, ctypes.c_size_t] + [ctypes.c_double] * 4, None),
    "bq_int_int_K": ([ctypes.c_double] * 4, ctypes.c_double),
    "bq_int_K1_K2": (
        [_f8, _f8, ctypes.c_size_t, _f8, ctypes.c_size_t] + [ctypes.c_double] * 6,
        None,
    ),
    "bq_int_int_K1_K2": (
        [_f8, _f8, ctypes.c_size_t, _f8, ctypes.c_size_t] + [ctypes.c_double] * 6,
        None,
    ),
    "bq_int_K1_int_K2": ([_f8, _f8, ctypes.c_size_t] + [ctypes.c_double] * 6, None),
    "bq_improve_conditioning": ([_f8, _f8, ctypes.c_size_t], ctypes.c_double),
    "bq_int_K_periodic": (
        [_f8, _f8, ctypes.c_size_t] + [ctypes.c_double] * 5 + [ctypes.c_int],
        None,
    ),
    "bq_int_int_K1_K2_periodic": (
        [_f8, _f8, ctypes.c_size_t, _f8, ctypes.c_size_t]
        + [ctypes.c_double] * 8 + [ctypes.c_int],
        None,
    ),
    "bq_esm_grid": (
        [_f8, _f8, ctypes.c_size_t, _f8, ctypes.c_size_t, _f8, _f8, _f8,
         ctypes.c_size_t, _f8, _f8] + [ctypes.c_double] * 8,
        None,
    ),
}


def _build(so: pathlib.Path):
    so.parent.mkdir(parents=True, exist_ok=True)
    # No -march=native: the artifact may outlive the build host (e.g. restored
    # from a cache) and ISA-specific code SIGILLs elsewhere. -O3 is enough for
    # an oracle/baseline library.
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(so),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _open(so: pathlib.Path):
    lib = ctypes.CDLL(str(so))
    for name, (argtypes, restype) in _SIG.items():
        fn = getattr(lib, name)
        fn.argtypes = argtypes
        fn.restype = restype
    # Selftest: int_int_K(h=1, w=1, mu=0, s2=1) = 1/sqrt(1 + 2) (closed form);
    # catches a foreign/incompatible binary before callers trust it.
    got = float(lib.bq_int_int_K(1.0, 1.0, 0.0, 1.0))
    if not math.isfinite(got) or abs(got - 1.0 / math.sqrt(3.0)) > 1e-9:
        raise OSError(f"bq_native selftest failed: {got}")
    return lib


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        so = _so_path()
        if not so.exists():
            _build(so)
        try:
            _lib = _open(so)
        except OSError:
            # stale/foreign artifact → rebuild once from source and retry
            _build(so)
            _lib = _open(so)
    except Exception:  # no compiler / load failure → oracle unavailable
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _c(x):
    return np.ascontiguousarray(np.asarray(x, np.float64).reshape(-1))


def int_K(x, h, w, mu, s2):
    x = _c(x)
    out = np.empty_like(x)
    _load().bq_int_K(out, x, x.size, h, w, mu, s2)
    return out


def int_int_K(h, w, mu, s2):
    return float(_load().bq_int_int_K(h, w, mu, s2))


def int_K1_K2(x1, x2, h1, w1, h2, w2, mu, s2):
    x1, x2 = _c(x1), _c(x2)
    out = np.empty((x1.size, x2.size))
    _load().bq_int_K1_K2(out, x1, x1.size, x2, x2.size, h1, w1, h2, w2, mu, s2)
    return out


def int_int_K1_K2(x1, x2, h1, w1, h2, w2, mu, s2):
    x1, x2 = _c(x1), _c(x2)
    out = np.empty((x1.size, x2.size))
    _load().bq_int_int_K1_K2(out, x1, x1.size, x2, x2.size, h1, w1, h2, w2, mu, s2)
    return out


def int_K1_int_K2(x1, h1, w1, h2, w2, mu, s2):
    x1 = _c(x1)
    out = np.empty_like(x1)
    _load().bq_int_K1_int_K2(out, x1, x1.size, h1, w1, h2, w2, mu, s2)
    return out


def int_K_periodic(x, h, w, p, mu, s2, nterms=64):
    x = _c(x)
    out = np.empty_like(x)
    _load().bq_int_K_periodic(out, x, x.size, h, w, p, mu, s2, nterms)
    return out


def int_int_K1_K2_periodic(x1, x2, t1, t2, mu, s2, nterms=64):
    x1, x2 = _c(x1), _c(x2)
    out = np.empty((x1.size, x2.size))
    _load().bq_int_int_K1_K2_periodic(
        out, x1, x1.size, x2, x2.size, t1[0], t1[1], t1[2], t2[0], t2[1],
        t2[2], mu, s2, nterms,
    )
    return out


def improve_conditioning(K):
    K = np.ascontiguousarray(np.asarray(K, np.float64))
    L = np.empty_like(K)
    jitter = float(_load().bq_improve_conditioning(K, L, K.shape[0]))
    return L, jitter


def esm_grid(grid, xsc, alpha, L_l, xs, alpha_tl, L_tl, h_l, w_l, h_tl, w_tl,
             mu, s2, gamma=1.0, thresh=0.0):
    grid, xsc, alpha, xs, alpha_tl = map(_c, (grid, xsc, alpha, xs, alpha_tl))
    L_l = np.ascontiguousarray(np.asarray(L_l, np.float64))
    L_tl = np.ascontiguousarray(np.asarray(L_tl, np.float64))
    out = np.empty_like(grid)
    _load().bq_esm_grid(
        out, grid, grid.size, xsc, xsc.size, alpha, L_l, xs, xs.size, alpha_tl,
        L_tl, h_l, w_l, h_tl, w_tl, mu, s2, gamma, thresh,
    )
    return out
