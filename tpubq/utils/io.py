"""State persistence for raw BQState pytrees (single problems and fleets).

The reference persists one estimator per .npz (bq.py::BQ.save/load — that
surface lives on the BQ class). This module is the functional counterpart
for production checkpointing: any BQState (including batched fleet states
with a leading problem axis) round-trips through one .npz; factorizations
are stored too, so load is exact and refit-free, but ``refit=True``
recomputes them (the reference's behavior).
"""

from __future__ import annotations

import numpy as np

from tpubq.models import bq as bqm
from tpubq.models.gp import GPState
from tpubq.utils.options import FIELD_NAMES as _OPT_FIELDS, BQOptions

__all__ = ["save_state", "load_state"]


def _npz_path(path) -> str:
    """np.savez appends .npz to extensionless paths; normalize so the
    overwrite guard and load see the real file."""
    p = str(path)
    return p if p.endswith(".npz") else p + ".npz"


def _flat(state: bqm.BQState):
    out = {}
    for name, val in state._asdict().items():
        if isinstance(val, GPState):
            for sub, sval in val._asdict().items():
                if sub == "Kinv":
                    continue  # derivable from L on load; persisting it would
                    # double the matrix payload of every checkpoint
                out[f"{name}.{sub}"] = np.asarray(sval)
        else:
            out[name] = np.asarray(val)
    return out


def save_state(path, state: bqm.BQState, opts: BQOptions, force: bool = False,
               extras: dict = None):
    """Write a BQState (+ its options) to one .npz.

    ``extras``: optional {name: scalar/array} side-channel fields (e.g. the
    fleet's instance-RNG seed) stored as ``__x_<name>``; read back with
    ``load_extras``. Kept out of the state/options namespaces so old
    checkpoints stay loadable and new fields never shadow state leaves."""
    import os

    path = _npz_path(path)
    if os.path.exists(path) and not force:
        raise IOError(f"{path} already exists (use force=True)")
    np.savez(
        path,
        **_flat(state),
        **{f"__opt_{k}": getattr(opts, k) for k in _OPT_FIELDS},
        **{f"__x_{k}": np.asarray(v) for k, v in (extras or {}).items()},
    )


def load_extras(path) -> dict:
    """Read back the ``extras`` side-channel of ``save_state`` (empty dict
    for checkpoints written before a given extra existed)."""
    with np.load(_npz_path(path), allow_pickle=False) as d:
        return {k[len("__x_"):]: d[k][()] for k in d.files if k.startswith("__x_")}


def load_state(path, refit: bool = False):
    """Read (state, opts) back. ``refit=True`` recomputes factorizations
    (use after changing jax precision config or hardware)."""
    import jax
    import jax.numpy as jnp

    with np.load(_npz_path(path), allow_pickle=False) as d:
        opt_kwargs = {}
        for k in _OPT_FIELDS:
            if f"__opt_{k}" not in d.files:
                continue  # option added after this file was saved → default
            v = d[f"__opt_{k}"][()]
            if isinstance(v, (np.str_, np.bytes_)):
                v = str(v)
            elif hasattr(v, "item"):
                v = v.item()
            opt_kwargs[k] = v
        opts = BQOptions(**opt_kwargs)

        def gp(prefix):
            fields = {
                sub: jnp.asarray(d[f"{prefix}.{sub}"])
                for sub in GPState._fields
                if f"{prefix}.{sub}" in d.files
            }
            # fields added after a checkpoint was saved get derived/defaults
            if "ok" not in fields:
                fields["ok"] = jnp.asarray(True)
            if "Kinv" not in fields:
                from tpubq.ops import linalg as _linalg

                L = fields["L"]
                # batched (fleet) states carry a leading problem axis
                eye = jnp.eye(L.shape[-1], dtype=L.dtype)
                solve = _linalg.chol_solve
                for _ in range(L.ndim - 2):
                    solve = jax.vmap(solve, in_axes=(0, None))
                fields["Kinv"] = solve(L, eye)
            missing = set(GPState._fields) - set(fields)
            if missing:
                raise KeyError(f"checkpoint missing GPState fields: {sorted(missing)}")
            return GPState(**fields)

        state = bqm.BQState(
            **{
                name: (gp(name) if name in ("gp_log_l", "gp_l") else jnp.asarray(d[name]))
                for name in bqm.BQState._fields
            }
        )
    if refit:
        import jax

        if state.ns.ndim == 0:
            state = bqm._fit_gps_jit(state, opts, True)
        else:  # fleet state: one compiled vmapped refit
            state = jax.jit(
                jax.vmap(bqm._fit_gps, in_axes=(0, None, None)),
                static_argnums=(1, 2),
            )(state, opts, True)
    return state, opts
