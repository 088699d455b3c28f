"""Fleet API: many independent BQ problems in one dispatch.

No reference analogue (the reference is strictly one estimator per Python
object) — this is the TPU-native extension for production/serving: a batch
of ``BQState``s is one pytree with a leading batch axis on every leaf, and
every estimator operation is the ``vmap`` of the single-problem program. On
a mesh, shard the batch axis (``jax.NamedSharding`` on the leaves) and the
same functions scale across chips.

All problems in a batch share one ``BQOptions`` (static shapes); their data,
measures, γ, and hyperparameters vary freely.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpubq.models import acquire, bq as bqm
from tpubq.models.bq import BQState, _fit_gps
from tpubq.utils.options import BQOptions

__all__ = [
    "BQFleet",
    "init_batch",
    "Z_mean_batch",
    "Z_var_batch",
    "expected_squared_mean_batch",
    "choose_next_batch",
    "add_observation_batch",
    "run_active_loop_batch",
]


def init_batch(
    xs,
    ls,
    opts: BQOptions,
    params_tl=None,
    params_l=None,
    s_tl=0.0,
    s_l=0.0,
    gamma=1.0,
    x_means=None,
    x_vars=None,
) -> BQState:
    """Build a batched BQState from (B, n) observations.

    ``xs``: (B, n) or (B, n, d); ``ls``: (B, n) positive. Per-problem
    measures via ``x_means`` (B, d) / ``x_vars`` (B, d, d) (defaults:
    standard normal). Hyperparameters may be shared (p,) or per-problem
    (B, p). Returns a BQState whose every leaf has a leading B axis.
    """
    dtype = opts.np_dtype
    xs = np.asarray(xs, dtype)
    if xs.ndim == 2:
        xs = xs[:, :, None]
    ls = np.asarray(ls, dtype)
    B, n, d = xs.shape
    if np.any(ls <= 0) or not np.all(np.isfinite(ls)):
        raise ValueError("l must be finite and positive")
    if n > opts.max_obs:
        raise ValueError(f"{n} observations exceed max_obs={opts.max_obs}")

    from tpubq.models.bq import default_params, validate_theta

    if params_tl is None:
        params_tl = default_params(opts)
    if params_l is None:
        params_l = default_params(opts)
    # validate the param width (last axis, whether shared (p,) or per-problem (B, p))
    for name, p in (("params_tl", params_tl), ("params_l", params_l)):
        validate_theta(np.zeros(np.asarray(p, dtype).shape[-1]), opts, name)

    # measures broadcast like hyperparameters: scalar / (d,) / (d, d) are
    # shared across the fleet; (B, d) / (B, d, d) are per-problem
    if x_means is None:
        x_means = np.zeros((B, d), dtype)
    else:
        x_means = np.asarray(x_means, dtype)
        if x_means.ndim == 0:
            x_means = np.full((B, d), float(x_means), dtype)
        elif x_means.ndim == 1:
            # (d,) = shared mean; (B,) = per-problem scalar means (d == 1).
            # When B == d the shared reading wins (pass (B, 1) to be explicit).
            if x_means.shape[0] == d:
                x_means = np.broadcast_to(x_means, (B, d))
            elif d == 1 and x_means.shape[0] == B:
                x_means = x_means[:, None]
            else:
                raise ValueError(
                    f"x_means of shape {x_means.shape} matches neither (d,)="
                    f"({d},) shared nor (B,)=({B},) per-problem (d=1) form"
                )
    x_means = np.asarray(x_means, dtype).reshape(B, d)
    if x_vars is None:
        x_vars = np.tile(np.eye(d, dtype=dtype)[None], (B, 1, 1))
    else:
        x_vars = np.asarray(x_vars, dtype)
        if x_vars.ndim == 0:
            x_vars = np.eye(d, dtype=dtype) * x_vars
        elif x_vars.ndim == 1:
            # (d,) = shared diagonal; (B,) = per-problem variances (d == 1)
            if x_vars.shape[0] == d:
                x_vars = np.diag(x_vars.astype(dtype))
            elif d == 1 and x_vars.shape[0] == B:
                x_vars = x_vars[:, None, None]
            else:
                raise ValueError(
                    f"x_vars of shape {x_vars.shape} matches neither (d,)="
                    f"({d},) shared-diagonal nor (B,)=({B},) per-problem "
                    "(d=1) form"
                )
        if x_vars.ndim == 2:
            x_vars = np.broadcast_to(x_vars, (B, d, d))
    x_vars = np.asarray(x_vars, dtype).reshape(B, d, d)

    def _per_problem(params):
        p = np.asarray(params, dtype)
        if p.ndim == 1:
            return np.broadcast_to(p, (B, p.shape[0])).copy()
        if p.shape[0] != B:
            raise ValueError(f"per-problem params must be (B, p); got {p.shape}")
        return p

    theta_tl = _per_problem(params_tl)
    theta_l = _per_problem(params_l)

    def one(x, l, ttl, tl_, mu, Sig):
        return bqm.init_state(
            x, l, opts, params_tl=ttl, params_l=tl_, s_tl=s_tl, s_l=s_l,
            gamma=gamma, x_mean=mu, x_var=Sig,
        )

    # init_state is pure given fixed shapes; vmap builds the whole fleet in
    # one compiled program.
    return jax.vmap(
        lambda x, l, a, b, mu, S: one(x, l, a, b, mu, S)
    )(jnp.asarray(xs), jnp.asarray(ls), jnp.asarray(theta_tl),
      jnp.asarray(theta_l), jnp.asarray(x_means), jnp.asarray(x_vars))


@partial(jax.jit, static_argnames=("opts",))
def Z_mean_batch(states: BQState, opts: BQOptions) -> jnp.ndarray:
    return jax.vmap(bqm.Z_mean, (0, None))(states, opts)


@partial(jax.jit, static_argnames=("opts",))
def Z_var_batch(states: BQState, opts: BQOptions) -> jnp.ndarray:
    return jax.vmap(bqm.Z_var, (0, None))(states, opts)


@partial(jax.jit, static_argnames=("opts", "per_problem"))
def expected_squared_mean_batch(
    states: BQState, opts: BQOptions, grids, per_problem: bool = False
) -> jnp.ndarray:
    """(B, G) ESM scores.

    ``per_problem=False`` (default): one shared grid, (G,) or (G, d).
    ``per_problem=True``: a grid per problem, (B, G) or (B, G, d). Explicit
    rather than shape-inferred — a shared (G, d) grid with G == B would
    otherwise be silently misread as per-problem rows.
    """
    grids = jnp.asarray(grids)
    return jax.vmap(acquire.expected_squared_mean, (0, None, 0 if per_problem else None))(
        states, opts, grids
    )


def _batch_size(states: BQState) -> int:
    return states.ns.shape[0]


@partial(jax.jit, static_argnames=("opts",))
def choose_next_batch(states: BQState, opts: BQOptions, grid):
    """Per-problem argmax of ESM over a shared grid → ((B, d), (B, G))."""
    from tpubq.models.acquire import as_points

    scores = expected_squared_mean_batch(states, opts, grid)
    # as_points, not a raw [:, None]: for dim > 1 a 1-D grid array is ONE
    # d-dimensional point, which a raw reshape would scramble into d bogus
    # 1-D points and return a wrong-shaped x_next.
    grid2 = as_points(jnp.asarray(grid, states.x_s.dtype), opts.dim)
    return grid2[jnp.argmax(scores, axis=1)], scores


@partial(jax.jit, static_argnames=("opts",))
def add_observation_batch(states: BQState, opts: BQOptions, x_new, l_new) -> BQState:
    """Append one observation per problem and refit the whole fleet."""
    return jax.vmap(acquire.add_observation, (0, None, 0, 0))(
        states, opts, jnp.asarray(x_new), jnp.asarray(l_new)
    )


@partial(jax.jit, static_argnames=("opts", "loglik_fn", "n_steps"))
def run_active_loop_batch(states: BQState, opts: BQOptions, loglik_fn, grid, n_steps: int):
    """Fleet-wide active sampling: every problem picks and absorbs its own
    next point each step (one compiled scan for the whole fleet).
    ``loglik_fn(x: (d,)) -> ()`` is vmapped across the fleet's choices.
    """

    def step(sts, _):
        x_next, _ = choose_next_batch(sts, opts, grid)
        l_next = jax.vmap(loglik_fn)(x_next)
        sts = add_observation_batch(sts, opts, x_next, l_next)
        return sts, (Z_mean_batch(sts, opts), Z_var_batch(sts, opts))

    return jax.lax.scan(step, states, None, length=n_steps)


class BQFleet:
    """User-facing fleet: B independent BQ problems advanced in one dispatch.

    The stateful convenience shell over this module's functional API (as
    ``tpubq.BQ`` is over the single-problem core) — the production serving
    shape the reference cannot express. All problems share one ``BQOptions``
    (static shapes); data, measures, and hyperparameters vary per problem.

    Example:
        fleet = BQFleet(xs, ls, n_candidate=12, candidate_thresh=0.2)
        zm, zv = fleet.Z_mean(), fleet.Z_var()        # (B,), (B,)
        x_next = fleet.choose_next(grid)              # (B, d)
        fleet.add_observation(x_next, l_next)         # one dispatch
        fleet.save("fleet.npz"); fleet2 = BQFleet.load("fleet.npz")
    """

    def __init__(self, xs, ls, params_tl=None, params_l=None, **options):
        from tpubq.utils.options import parse_bq_kwargs

        xs = np.asarray(xs)
        opts, x_means, x_vars, gamma, s_tl, s_l = parse_bq_kwargs(
            options, xs.shape[2] if xs.ndim == 3 else 1, xs.shape[1]
        )
        self.options = opts
        self._states = init_batch(
            xs, ls, self.options, params_tl=params_tl, params_l=params_l,
            s_tl=s_tl, s_l=s_l, gamma=gamma, x_means=x_means, x_vars=x_vars,
        )

    # -- construction from existing states ----------------------------------
    @classmethod
    def from_states(cls, states: BQState, opts: BQOptions) -> "BQFleet":
        if states.ns.ndim != 1:
            raise ValueError(
                "BQFleet needs a BATCHED state (every leaf with a leading "
                "problem axis); this looks like a single-problem state — use "
                "tpubq.BQ / tpubq.models functions for those, or stack "
                "states with jax.tree.map"
            )
        obj = object.__new__(cls)
        obj.options = opts
        obj._states = states
        return obj

    @property
    def states(self) -> BQState:
        return self._states

    def __len__(self) -> int:
        return _batch_size(self._states)

    @property
    def ns(self) -> np.ndarray:
        return np.asarray(self._states.ns)

    def problem(self, i: int):
        """Extract problem ``i`` as a standalone single-problem state view
        (pair it with ``self.options`` for any tpubq.models function)."""
        return jax.tree.map(lambda a: a[i], self._states)

    # -- estimation -----------------------------------------------------------
    def Z_mean(self) -> np.ndarray:
        return np.asarray(Z_mean_batch(self._states, self.options))

    def Z_var(self) -> np.ndarray:
        return np.asarray(Z_var_batch(self._states, self.options))

    def expected_squared_mean(self, grid, per_problem: bool = False) -> np.ndarray:
        return np.asarray(
            expected_squared_mean_batch(self._states, self.options, grid, per_problem)
        )

    # -- active sampling -------------------------------------------------------
    def choose_next(self, grid) -> np.ndarray:
        x_next, _ = choose_next_batch(self._states, self.options, grid)
        return np.asarray(x_next)

    def add_observation(self, x_next, l_next) -> "BQFleet":
        l_next = np.asarray(l_next)
        if np.any(~np.isfinite(l_next)) or np.any(l_next <= 0):
            raise ValueError("l must be finite and positive")
        if np.any(self.ns >= self.options.max_obs):
            raise ValueError(
                f"a fleet member is at capacity (max_obs={self.options.max_obs}); "
                "rebuild the fleet with a larger max_obs"
            )
        # duplicate-location rejection, per problem (reference parity with
        # BQ.add_observation — duplicates make the Gram singular-up-to-jitter)
        x_arr = np.asarray(x_next, self.options.np_dtype).reshape(
            (len(self), self.options.dim)
        )
        # duplicate check computed ON DEVICE — only a scalar comes back
        # (pulling the whole (B, max_obs, d) fleet state to host per call
        # would serialize a full-state transfer into the serving hot path)
        dist = jnp.max(
            jnp.abs(self._states.x_s - jnp.asarray(x_arr)[:, None, :]), axis=-1
        )
        min_dist = jnp.min(
            jnp.where(self._states.obs_mask, dist, jnp.inf), axis=1
        )
        if bool(jnp.any(min_dist < 1e-10)):
            raise ValueError("duplicate observation location in the fleet")
        self._states = add_observation_batch(
            self._states, self.options, x_arr, l_next
        )
        return self

    def run_active_loop(self, loglik_fn, grid, n_steps: int):
        """Advance every problem ``n_steps`` (one compiled scan); returns the
        per-step (Z_mean, Z_var) histories, each (n_steps, B)."""
        if np.any(self.ns + n_steps > self.options.max_obs):
            raise ValueError(
                f"{n_steps} steps would exceed max_obs="
                f"{self.options.max_obs} for a fleet member (ns="
                f"{self.ns.tolist()}); rebuild the fleet with a larger max_obs"
            )
        self._states, (zms, zvs) = run_active_loop_batch(
            self._states, self.options, loglik_fn, grid, n_steps
        )
        return np.asarray(zms), np.asarray(zvs)

    # -- persistence ------------------------------------------------------------
    def save(self, path, force: bool = False):
        from tpubq.utils.io import save_state

        save_state(path, self._states, self.options, force=force)

    @classmethod
    def load(cls, path, refit: bool = False) -> "BQFleet":
        from tpubq.utils.io import load_state

        states, opts = load_state(path, refit=refit)
        return cls.from_states(states, opts)

    def __repr__(self):
        return f"BQFleet(B={len(self)}, ns={self.ns.tolist()}, options={self.options})"
