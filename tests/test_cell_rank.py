"""Pallas counting-sort rank kernel vs a NumPy oracle (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ivfadc_tpu.ops.cell_rank import MAX_KC, cell_ranks


def _oracle(cells, kc):
    rank = np.zeros(len(cells), np.int64)
    seen = {}
    for i, c in enumerate(cells):
        rank[i] = seen.get(c, 0)
        seen[c] = rank[i] + 1
    return rank, np.bincount(cells, minlength=kc)


@pytest.mark.parametrize("engine", ["v1", "v2"])
@pytest.mark.parametrize("P,kc,seed", [
    (4096, 1024, 0),      # uniform, multi-block
    (1000, 17, 1),        # ragged P (pads with sentinel)
    (1024, 2, 2),         # heavy collisions
    (2048, 4096, 3),      # kc == MAX_KC, mostly-unique cells
    (128, 5, 4),          # single group
])
def test_ranks_match_oracle(P, kc, seed, engine):
    cells = np.random.RandomState(seed).randint(0, kc, P).astype(np.int32)
    r, c = cell_ranks(jnp.asarray(cells), kc=kc, interpret=True,
                      engine=engine)
    er, ec = _oracle(cells, kc)
    np.testing.assert_array_equal(np.asarray(r), er)
    np.testing.assert_array_equal(np.asarray(c), ec)


def test_skewed_distribution():
    # one dominant cell (the pattern of a hot probe cell)
    rng = np.random.RandomState(5)
    cells = np.where(rng.rand(4096) < 0.9, 7, rng.randint(0, 64, 4096)) \
        .astype(np.int32)
    r, c = cell_ranks(jnp.asarray(cells), kc=64, interpret=True)
    er, ec = _oracle(cells, 64)
    np.testing.assert_array_equal(np.asarray(r), er)
    np.testing.assert_array_equal(np.asarray(c), ec)
