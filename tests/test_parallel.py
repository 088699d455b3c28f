"""Sharded programs vs single-chip: tolerance-identical on an 8-device CPU mesh
(the multi-chip validation strategy — no multi-node reference exists to port,
SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import util as tu
from tpubq.models import acquire, marginalize as margm
from tpubq.parallel import mesh as meshm
from tpubq.parallel.sharded import (
    choose_next_sharded,
    marginalize_sharded,
    pad_to_multiple,
)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return meshm.make_mesh(8)


def test_mesh_factorization():
    m = meshm.make_mesh(8)
    assert m.shape[meshm.AXIS_SAMPLE] * m.shape[meshm.AXIS_GRID] == 8
    assert meshm._factor2(8) == (2, 4)
    assert meshm._factor2(7) == (1, 7)


def test_pad_to_multiple():
    a = jnp.arange(10.0)[:, None]
    p, n = pad_to_multiple(a, 4)
    assert p.shape[0] == 12 and n == 10
    np.testing.assert_allclose(np.asarray(p[10:]), np.broadcast_to(np.asarray(a[-1]), (2, 1)))


def test_choose_next_sharded_matches_single(mesh8):
    bq = tu.make_bq()
    grid = np.linspace(-3, 3, 37)[:, None]  # deliberately not divisible by 4
    x1, s1 = acquire.choose_next(bq.state, bq.options, jnp.asarray(grid))
    x8, s8 = choose_next_sharded(bq.state, bq.options, jnp.asarray(grid), mesh8)
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), rtol=1e-12)


def test_choose_next_sharded_marginalized_matches_single(mesh8):
    bq = tu.make_bq()
    grid = np.linspace(-3, 3, 24)[:, None]
    hyp = jnp.asarray(bq.sample_hypers(5, seed=11))  # 5 not divisible by 2
    x1, s1 = acquire.choose_next(bq.state, bq.options, jnp.asarray(grid), hyp)
    x8, s8 = choose_next_sharded(bq.state, bq.options, jnp.asarray(grid), mesh8, hyp)
    np.testing.assert_allclose(np.asarray(s8), np.asarray(s1), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(x8), np.asarray(x1), rtol=1e-12)


def test_marginalize_sharded_matches_single(mesh8):
    bq = tu.make_bq()
    hyp = jnp.asarray(bq.sample_hypers(10, seed=13))  # 10 not divisible by 8
    zm1, zv1 = margm.marginalize(bq.state, bq.options, hyp)
    zm8, zv8 = marginalize_sharded(bq.state, bq.options, hyp, mesh8)
    np.testing.assert_allclose(np.asarray(zm8), np.asarray(zm1), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(zv8), np.asarray(zv1), rtol=1e-10)
