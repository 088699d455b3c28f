"""Device-mesh utilities.

The reference is a single-process CPU library with no distributed story
(SURVEY.md §2.5); the TPU-native scaling axes of this workload are the
candidate grid ("sp"-like: shard the scored points) and the hyper-sample
batch ("dp"-like: shard the marginalization samples). Meshes here are
standard ``jax.sharding.Mesh``es; collectives are XLA collectives inserted
by ``shard_map`` programs (see tpubq.parallel.sharded).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

#: Axis names: dp = hyper-sample (data-parallel-like) axis, sp = candidate
#: grid (sequence-parallel-like) axis.
AXIS_SAMPLE = "dp"
AXIS_GRID = "sp"


def _factor2(n: int) -> Tuple[int, int]:
    """Split n into (a, b), a*b = n, as square as possible (a <= b)."""
    a = int(math.isqrt(n))
    while n % a:
        a -= 1
    return a, n // a


def make_mesh(
    n_devices: Optional[int] = None,
    shape: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, str] = (AXIS_SAMPLE, AXIS_GRID),
) -> Mesh:
    """A 2-D (dp, sp) mesh over the first ``n_devices`` devices.

    ``shape`` overrides the default near-square factorization. With one
    device this degenerates to a (1, 1) mesh and all sharded programs run
    unchanged single-chip.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"asked for {n_devices} devices, have {len(devs)}")
    if shape is None:
        shape = _factor2(n_devices)
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"shape {shape} does not cover {n_devices} devices")
    grid = np.asarray(devs[:n_devices]).reshape(tuple(shape))
    return Mesh(grid, axis_names)
