"""Any-A generic Pallas forward-backward vs the XLA scan oracle.

The generic path precomputes per-column [P, P] state emissions
A-bucketed (each column pays its own allele-count cost) and runs the
scan in a fused kernel with no allele cap — one multiallelic SV bubble
must no longer disqualify a chromosome (VERDICT round 1, item 3;
reference keeps such bubbles in the same HMM,
src/multiallelicuniquekmers.cpp).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pangenie_tpu.hmm.forward_backward import (
    _allele_emissions,
    forward_backward,
)
from pangenie_tpu.hmm.pallas_fb import (
    bucketed_state_emissions,
    forward_backward_batch_pallas_e,
)
from pangenie_tpu.utils.synthetic import synthetic_columns


def _f32_device(cols):
    leaves = []
    for x in cols:
        x = np.asarray(x)
        if x.dtype == np.float64:
            x = x.astype(np.float32)
        leaves.append(jnp.asarray(x))
    return type(cols)(*leaves)


def _mixed_allele_columns(B, N, P, K, A_hi, wide_every=7, seed=3):
    """Columns mostly biallelic with every `wide_every`-th column using
    A_hi alleles — the realistic mixed-chromosome shape."""
    cols = synthetic_columns(
        n_columns=N, n_paths=P, n_kmers=K, n_alleles=A_hi,
        batch_dims=(B,), dtype=np.float32, seed=seed,
    )
    alleles = np.asarray(cols.alleles).copy()
    incidence = np.asarray(cols.incidence).copy()
    nr_local = np.asarray(cols.nr_local).copy()
    narrow = np.ones(N, dtype=bool)
    narrow[::wide_every] = False
    # narrow columns: restrict alleles and kmer incidence to {0, 1}
    alleles[:, narrow] = alleles[:, narrow] % 2
    inc_narrow = incidence[:, narrow]
    wide_hits = inc_narrow[..., 2:].any(-1)
    inc_narrow[..., 0] |= wide_hits
    inc_narrow[..., 2:] = False
    incidence[:, narrow] = inc_narrow
    nr_local[:, narrow] = 2
    nr_local[:, ~narrow] = A_hi
    return cols._replace(
        alleles=alleles,
        allele_local=alleles.copy(),
        incidence=incidence,
        nr_local=nr_local,
    )


def test_bucketed_emissions_match_full():
    cols = _f32_device(_mixed_allele_columns(2, 21, 6, 4, A_hi=5))
    B, N, P = cols.alleles.shape
    E_b = np.asarray(bucketed_state_emissions(cols)).reshape(B, N, P, P)
    EA = np.asarray(jax.vmap(_allele_emissions)(cols))
    oh = np.asarray(
        jax.nn.one_hot(cols.allele_local, EA.shape[-1], dtype=cols.lp.dtype)
    )
    E_full = np.einsum("bnpa,bnac,bnqc->bnpq", oh, EA, oh)
    np.testing.assert_array_equal(E_b, E_full.astype(np.float32))


@pytest.mark.parametrize("B,N,P,K,A_hi", [(2, 23, 8, 6, 5), (1, 9, 4, 4, 3)])
def test_generic_pallas_matches_xla_scan(B, N, P, K, A_hi):
    cols = _f32_device(_mixed_allele_columns(B, N, P, K, A_hi))
    ref_p, ref_c = jax.jit(jax.vmap(forward_backward))(cols)
    pal_p, pal_c = forward_backward_batch_pallas_e(cols, interpret=True)
    np.testing.assert_allclose(
        np.asarray(pal_p), np.asarray(ref_p), rtol=2e-4, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(pal_c), np.asarray(ref_c))


def test_generic_dispatch_requires_concrete_columns():
    """Under jit tracing, dispatch must fall back to the XLA scan."""
    from pangenie_tpu.hmm.batch import forward_backward_batch

    cols = _f32_device(
        synthetic_columns(
            n_columns=8, n_paths=4, n_kmers=4, batch_dims=(2,),
            dtype=np.float32,
        )
    )
    posts, corr = jax.jit(forward_backward_batch)(cols)
    ref_p, ref_c = jax.jit(jax.vmap(forward_backward))(cols)
    np.testing.assert_allclose(np.asarray(posts), np.asarray(ref_p))
    np.testing.assert_allclose(np.asarray(corr), np.asarray(ref_c))


@pytest.mark.parametrize("N,chunk", [(70, 16), (64, 32), (47, 16)])
def test_generic_pallas_chunked_matches_xla_scan(N, chunk):
    """The N-chunked core (alpha/beta/boundary-E carries across chunks,
    chunk-local alpha recompute) must match the scan for multi-chunk N,
    exact chunk multiples, and padded tails alike."""
    from pangenie_tpu.hmm.pallas_fb import (
        _fb_pallas_e_core,
        bucketed_collapse,
    )

    cols = _f32_device(_mixed_allele_columns(2, N, 6, 4, A_hi=4, seed=9))
    ref_p, ref_c = jax.jit(jax.vmap(forward_backward))(cols)
    E = bucketed_state_emissions(cols)
    posts, log_corr = _fb_pallas_e_core(
        E, cols.trans, cols.is_last, cols.scale, P=6, chunk=chunk,
        interpret=True,
    )
    pal_p = bucketed_collapse(posts, cols)
    np.testing.assert_allclose(
        np.asarray(pal_p), np.asarray(ref_p), rtol=2e-4, atol=1e-7
    )
    np.testing.assert_allclose(np.asarray(log_corr), np.asarray(ref_c))
