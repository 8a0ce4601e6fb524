"""Factored O(P^2) Viterbi recurrence vs the dense O(P^4) oracle.

The reference's tie rule — `>=` scanning previous states in ascending
row-major order, so the LAST maximal state wins (src/hmm.cpp:464-471)
— must survive the rank-1-style factorization bit-exactly, including
on engineered all-equal / duplicated-value columns where ties are
everywhere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pangenie_tpu.hmm.viterbi import (
    _prev_best_dense,
    _prev_best_factored,
    viterbi,
)
from pangenie_tpu.utils.synthetic import synthetic_columns


def _check(lv, lt, P):
    lv = jnp.asarray(lv, jnp.float64)
    lt = jnp.asarray(lt, jnp.float64)
    dv, di = jax.jit(_prev_best_dense, static_argnums=2)(lv, lt, P)
    fv, fi = jax.jit(_prev_best_factored, static_argnums=2)(lv, lt, P)
    np.testing.assert_array_equal(np.asarray(dv), np.asarray(fv))
    np.testing.assert_array_equal(np.asarray(di), np.asarray(fi))


@pytest.mark.parametrize("P", [1, 2, 3, 5, 8, 13])
def test_factored_matches_dense_random(P):
    rng = np.random.default_rng(P)
    for trial in range(8):
        lv = rng.normal(size=P * P)
        lt = np.sort(rng.normal(size=3))[::-1].copy()  # stay >= rec
        _check(lv, lt, P)


@pytest.mark.parametrize("P", [2, 3, 6])
def test_factored_matches_dense_ties(P):
    rng = np.random.default_rng(100 + P)
    cases = [
        np.zeros(P * P),                                # all equal
        np.repeat(rng.normal(size=P), P),               # equal rows
        np.tile(rng.normal(size=P), P),                 # equal cols
        rng.choice([0.0, 1.0], size=P * P),             # heavy duplicates
        rng.choice([-1.0, 0.0], size=P * P),
    ]
    lts = [
        np.array([0.0, 0.0, 0.0]),                      # uniform
        np.array([0.0, -1.0, -2.0]),
        np.array([-0.1, -0.1, -3.0]),                   # cross-class ties
    ]
    for lv in cases:
        for lt in lts:
            _check(lv, lt, P)


def test_factored_matches_dense_padding_transitions():
    # padded columns use trans = (1, 0, 0): lt = (0, -inf, -inf)
    rng = np.random.default_rng(4)
    P = 4
    lv = rng.normal(size=P * P)
    with np.errstate(divide="ignore"):
        lt = np.log(np.array([1.0, 0.0, 0.0]))
    _check(lv, lt, P)


def test_viterbi_states_unchanged_vs_dense_step():
    """Full scan: states from the factored step equal a dense-step run
    on realistic synthetic columns."""
    from functools import partial

    import importlib

    # the hmm package re-exports the `viterbi` FUNCTION under the same
    # name as the module; go through importlib for the module object
    vmod = importlib.import_module("pangenie_tpu.hmm.viterbi")

    cols = synthetic_columns(n_columns=64, n_paths=6, n_kmers=8, seed=9)
    cols = type(cols)(*[jnp.asarray(x) for x in cols])
    fast = np.asarray(viterbi(cols))

    orig = vmod._viterbi_step
    try:
        vmod._viterbi_step = partial(orig, dense=True)
        dense = np.asarray(viterbi.__wrapped__(cols))
    finally:
        vmod._viterbi_step = orig
    np.testing.assert_array_equal(fast, dense)
