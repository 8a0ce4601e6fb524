"""Two-pass blocked Viterbi (hmm/viterbi.py::_viterbi_fast) must
produce the same state sequence as the reference-faithful scan,
including tie-heavy and -inf-emission inputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pangenie_tpu.hmm.viterbi import _viterbi_fast, _viterbi_scan
from pangenie_tpu.utils.synthetic import synthetic_columns


def _cols(N, P, K, A=2, seed=0, dtype=jnp.float32):
    cols = synthetic_columns(
        n_columns=N, n_paths=P, n_kmers=K, n_alleles=A, seed=seed,
        dtype=dtype,
    )
    return type(cols)(*[jnp.asarray(x) for x in cols])


@pytest.mark.parametrize("seed,N,P,A", [
    (0, 2113, 6, 2),      # tail columns (N % 64 != 0)
    (1, 2048, 8, 2),      # exact segment multiple
    (2, 2176, 5, 4),      # multiallelic
])
def test_fast_matches_scan(seed, N, P, A):
    cols = _cols(N, P, 8, A=A, seed=seed)
    fast = np.asarray(_viterbi_fast(cols, uniform=False))
    scan = np.asarray(_viterbi_scan(cols, uniform=False))
    np.testing.assert_array_equal(fast, scan)


def test_fast_matches_scan_uniform():
    cols = _cols(2100, 6, 8, seed=3)
    fast = np.asarray(_viterbi_fast(cols, uniform=True))
    scan = np.asarray(_viterbi_scan(cols, uniform=True))
    np.testing.assert_array_equal(fast, scan)


def test_tie_heavy_inputs():
    """Constant emissions everywhere: every step is a pure tie-break
    exercise — the replayed backtraces must pick identical states."""
    cols = _cols(2304, 5, 4, seed=4)
    lp = jnp.zeros_like(cols.lp)  # log 1 for every kmer/CN
    cols = cols._replace(lp=lp)
    fast = np.asarray(_viterbi_fast(cols, uniform=False))
    scan = np.asarray(_viterbi_scan(cols, uniform=False))
    np.testing.assert_array_equal(fast, scan)


def test_dispatch_uses_fast_for_long_chromosomes(monkeypatch):
    import importlib

    # the hmm package re-exports the viterbi FUNCTION under the same
    # name; import the submodule explicitly
    V = importlib.import_module("pangenie_tpu.hmm.viterbi")

    called = {}
    orig = V._viterbi_fast

    def spy(cols, uniform):
        called["fast"] = True
        return orig(cols, uniform)

    monkeypatch.setattr(V, "_viterbi_fast", spy)
    monkeypatch.delenv("PANGENIE_TPU_NO_FAST_VITERBI", raising=False)
    # a fresh shape forces a re-trace, so the spy observes the dispatch
    cols = _cols(2051, 4, 4, seed=5)
    V.viterbi(cols, False)
    assert called.get("fast")
