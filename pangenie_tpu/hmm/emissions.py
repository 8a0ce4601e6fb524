"""Per-column emission computation inside HMM scans (JAX).

The reference builds a dense [allele x allele] probability matrix per
column by multiplying per-kmer copy-number probabilities
(src/emissionprobabilitycomputer.cpp:36-53). Here the log-emission over
path-pair states factorizes MXU-friendly:

With u[k, p] = 1{kmer k lies on the allele of path p} and per-kmer log
probs lp[k, c] for copy number c = u[k, p1] + u[k, p2] in {0, 1, 2}:

  logE[p1, p2] = sum_k lp[k, u1 + u2]
               = S0 + v[p1] + v[p2] + Q[p1, p2]
  S0 = sum_k lp0[k]
  v  = u^T (lp1 - lp0)                      (matvec)
  Q  = u^T diag(lp0 - 2 lp1 + lp2) u        (matmul, MXU)

Undefined alleles marginalize over copy numbers (reference
src/emissionprobabilitycomputer.cpp:40-46):
  both undefined:  sum_k log((p0 + p1 + p2) / 3)
  one undefined:   sum_k log(0.5 * (p[u] + p[u+1])), u from the defined path

An all-zero emission matrix (possible only when zero probabilities are
injected) makes the column uniform: logE = 0 (reference `all_zeros`).

A "safe" selection-based path avoids inf-arithmetic when -inf log probs
are present (zero probabilities); the fast path assumes finite lp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def log_emission_column(
    lp,          # [K, 3] log probs (may contain -inf on safe path)
    pr,          # [K, 3] linear probs
    kmer_allele, # [K] allele id per kmer (-1 pad)
    kmer_mask,   # [K] bool
    alleles,     # [P] global allele id per path
    undefined,   # [P] bool
    all_zeros,   # scalar bool
    scale,       # scalar: subset-independent log rescale (subtracted)
    safe: bool,
):
    """Return logE [P, P] for one column (rescaled by -scale)."""
    dtype = lp.dtype
    u = (kmer_allele[:, None] == alleles[None, :]) & kmer_mask[:, None]  # [K,P]
    uf = u.astype(dtype)

    # undefined-allele marginal terms (linear space, then log); selection
    # form so -inf logs (zero probabilities) never meet multiplication
    p0, p1, p2 = pr[:, 0], pr[:, 1], pr[:, 2]
    ru0 = jnp.log(0.5 * (p0 + p1))
    ru1 = jnp.log(0.5 * (p1 + p2))
    suu_k = jnp.log((p0 + p1 + p2) / 3.0)
    suu = jnp.sum(jnp.where(kmer_mask, suu_k, 0.0))
    r_contrib = jnp.where(u, ru1[:, None], ru0[:, None])
    r = jnp.sum(jnp.where(kmer_mask[:, None], r_contrib, 0.0), axis=0)  # [P]

    if safe:
        # selection-based: c[k,p1,p2] = u1 + u2, gather lp[k, c]
        c = u[:, :, None].astype(jnp.int32) + u[:, None, :].astype(jnp.int32)
        contrib = jnp.where(
            c == 0, lp[:, 0, None, None],
            jnp.where(c == 1, lp[:, 1, None, None], lp[:, 2, None, None]),
        )
        contrib = jnp.where(kmer_mask[:, None, None], contrib, 0.0)
        logE_dd = jnp.sum(contrib, axis=0)  # [P, P]
    else:
        lp0 = jnp.where(kmer_mask, lp[:, 0], 0.0)
        lp1 = jnp.where(kmer_mask, lp[:, 1], 0.0)
        lp2 = jnp.where(kmer_mask, lp[:, 2], 0.0)
        S0 = jnp.sum(lp0)
        v = uf.T @ (lp1 - lp0)  # [P]
        w = lp0 - 2.0 * lp1 + lp2
        Q = (uf * w[:, None]).T @ uf  # [P, P] on the MXU
        logE_dd = S0 + v[:, None] + v[None, :] + Q

    und1 = undefined[:, None]
    und2 = undefined[None, :]
    logE = jnp.where(
        und1 & und2,
        suu,
        jnp.where(und1, r[None, :], jnp.where(und2, r[:, None], logE_dd)),
    )
    logE = jnp.where(all_zeros, jnp.zeros_like(logE), logE - scale)
    return logE


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
