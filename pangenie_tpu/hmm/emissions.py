"""Per-column emission computation inside HMM scans (JAX).

The reference builds a dense [allele x allele] probability matrix per
column by multiplying per-kmer copy-number probabilities
(src/emissionprobabilitycomputer.cpp:36-53):

  E[a1, a2] = prod_k P(count_k | c),  c = u[k, a1] + u[k, a2]

with u the kmer x allele incidence (a kmer may lie on zero, one or
several alleles). We compute the log-emission the same way — in ALLELE
space [A, A] (A = distinct alleles in the column, usually 2), then
gather to the [P, P] path-pair state space:

  logEA[a1, a2] = sum_k lp[k, u1 + u2]
  logE[p1, p2]  = logEA[local_allele(p1), local_allele(p2)]

Computing in allele space is both cheaper (O(K A^2) + O(P^2) gather
instead of O(K P^2)) and tie-exact: states carrying the same allele
pair share ONE matrix entry, so the exact-equality structure the
reference's Viterbi tie-breaking relies on (same emission for (i,j)
and (j,i)) holds bitwise, which a per-state matmul formulation does
not guarantee under XLA reduction reordering.

Undefined alleles marginalize over copy numbers
(src/emissionprobabilitycomputer.cpp:40-46):
  both undefined: prod_k (p0 + p1 + p2) / 3                  (u-independent)
  one undefined:  prod_k 0.5 * (p[c] + p[c+1]),  c = u1 + u2 (asserted < 2)
The c < 2 assertion holds whenever kmers never lie on an undefined
allele (true for the real selection pipeline); we clamp c to 1 instead
of reproducing the reference's out-of-bounds read.

An all-zero emission matrix (possible only when zero probabilities are
injected) makes the column uniform: logE = 0 (reference `all_zeros`).

Zero probabilities (-inf logs) are handled by the same selection form
used for finite values — no inf*0 arithmetic arises.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_emission_allele_matrix(
    lp,            # [K, 3] log probs (may contain -inf)
    incidence,     # [K, A] kmer-on-allele (bool/0-1)
    kmer_mask,     # [K] bool
    undefined,     # [A] bool — allele is undefined
    all_zeros,     # scalar bool
    scale,         # scalar: subset-independent log rescale (subtracted)
):
    """Return logEA [A, A] for one column (rescaled by -scale)."""
    inc = incidence.astype(jnp.int32)
    c = inc[:, :, None] + inc[:, None, :]  # [K, A, A] in {0, 1, 2}

    # defined-defined: select lp[k, c]
    contrib = jnp.where(
        c == 0, lp[:, 0, None, None],
        jnp.where(c == 1, lp[:, 1, None, None], lp[:, 2, None, None]),
    )
    logE_dd = jnp.sum(
        jnp.where(kmer_mask[:, None, None], contrib, 0.0), axis=0
    )  # [A, A]

    # undefined marginals, computed in LOG space: logaddexp keeps tiny
    # probabilities finite where a float32 linear sum would flush to
    # zero (the linear-space form needed a second [K, 3] linear-prob
    # array shipped to the device; reference semantics
    # src/emissionprobabilitycomputer.cpp:40-46)
    l0, l1, l2 = lp[:, 0], lp[:, 1], lp[:, 2]
    log_half = jnp.log(jnp.asarray(0.5, lp.dtype))
    g0 = jnp.logaddexp(l0, l1) + log_half
    g1 = jnp.logaddexp(l1, l2) + log_half
    contrib_r = jnp.where(c >= 1, g1[:, None, None], g0[:, None, None])
    logR = jnp.sum(
        jnp.where(kmer_mask[:, None, None], contrib_r, 0.0), axis=0
    )  # [A, A]
    suu_k = jnp.logaddexp(jnp.logaddexp(l0, l1), l2) - jnp.log(
        jnp.asarray(3.0, lp.dtype)
    )
    suu = jnp.sum(jnp.where(kmer_mask, suu_k, 0.0))

    und1 = undefined[:, None]
    und2 = undefined[None, :]
    logEA = jnp.where(und1 & und2, suu, jnp.where(und1 | und2, logR, logE_dd))
    logEA = jnp.where(all_zeros, jnp.zeros_like(logEA), logEA - scale)
    return logEA


def log_emission_column(
    lp,            # [K, 3]
    incidence,     # [K, A]
    kmer_mask,     # [K]
    allele_local,  # [P] local allele index per path
    undefined,     # [A] allele undefined flags
    all_zeros,     # scalar bool
    scale,         # scalar
):
    """Return logE [P, P]: allele-space matrix gathered to state space."""
    logEA = log_emission_allele_matrix(
        lp, incidence, kmer_mask, undefined, all_zeros, scale
    )
    return logEA[jnp.ix_(allele_local, allele_local)]


def emission_scale(log_probs, kmer_mask):
    """Host/JAX precompute of the per-column rescale constant.

    scale_n = sum_k max_c lp[k, c] — independent of the path subset, so
    the same constant multiplies every subset's raw likelihoods and
    cancels in the final per-variant normalization (the cross-subset
    `combine` in the reference adds RAW likelihoods, so only a
    subset-independent rescale is sound). Upper-bounds every emission
    entry (defined and marginalized), keeping E' <= 1.
    """
    m = jnp.max(log_probs, axis=-1)
    m = jnp.where(kmer_mask & jnp.isfinite(m), m, 0.0)
    return jnp.sum(m, axis=-1)
