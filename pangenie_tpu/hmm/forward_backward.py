"""Forward-Backward pair HMM as batched JAX scans.

Re-design of the reference HMM forward/backward passes
(src/hmm.cpp:175-405) for TPU:

- The P^2 path-pair state space is kept as a [P, P] matrix; the
  reference's rank-1 transition trick (helpers h_i = row sums,
  h_j = col sums, h_ij = total; src/hmm.cpp:209-234) becomes broadcasted
  elementwise math — O(P^2) VPU work per column, no P^2 x P^2 matmul.
- Each column is normalized to sum 1 exactly as the reference does,
  with the underflow -> uniform fallback (src/hmm.cpp:253-267).
- Posterior per column = alpha_norm * beta_unnorm * forward_norm_sum
  (src/hmm.cpp:364-368), accumulated into a per-column
  [A, A] allele-pair matrix via two small MXU matmuls (H^T P H with H
  the path->local-allele one-hot). Raw (unnormalized) outputs are
  comparable across path subsets up to the shared emission rescale.
- The reference's sqrt(N) sparse-column recompute (src/hmm.cpp:81-89,
  298-308) is a CPU memory trick; on TPU we store the forward pass in
  HBM ([N, P, P]) and trade to a two-level checkpointed scan only when
  that exceeds memory (see `segment_size`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .emissions import log_emission_column


class ColumnArrays(NamedTuple):
    """Stacked per-column device inputs (leading axis = column)."""

    lp: jax.Array          # [N, K, 3]
    pr: jax.Array          # [N, K, 3]
    incidence: jax.Array   # [N, K, A] kmer-on-allele (local allele ids)
    kmer_mask: jax.Array   # [N, K]
    alleles: jax.Array     # [N, P] global allele ids (host scatter only)
    undefined: jax.Array   # [N, A] local allele undefined
    all_zeros: jax.Array   # [N]
    scale: jax.Array       # [N]
    trans: jax.Array       # [N, 3]; trans[n] = t(n-1 -> n), trans[0] unused
    allele_local: jax.Array  # [N, P] local allele index per path
    nr_local: jax.Array    # [N]
    is_last: jax.Array     # [N] True at the LAST REAL column (padding
                           # columns after it are pass-through)


def _emission(col: ColumnArrays):
    return log_emission_column(
        col.lp,
        col.pr,
        col.incidence,
        col.kmer_mask,
        col.allele_local,
        col.undefined,
        col.all_zeros,
        col.scale,
    )


def _mix_previous(alpha, t):
    """Rank-1-factorized transition mix (src/hmm.cpp:232-234).

    prev[i,j] = t0*a[i,j] + t1*(h_i[i]+h_j[j]-2a[i,j])
              + t2*(h_ij - h_i[i] - h_j[j] + a[i,j])
    """
    h_i = jnp.sum(alpha, axis=1, keepdims=True)  # [P,1] row sums
    h_j = jnp.sum(alpha, axis=0, keepdims=True)  # [1,P] col sums
    h_ij = jnp.sum(alpha)
    return (
        t[0] * alpha
        + t[1] * (h_i + h_j - 2.0 * alpha)
        + t[2] * (h_ij - h_i - h_j + alpha)
    )


@jax.jit
def forward_backward(columns: ColumnArrays):
    """Run both passes; returns per-column allele-pair posteriors.

    Returns:
      posteriors: [N, A, A] rescaled raw genotype-likelihood matrices;
        symmetric states are NOT collapsed (caller adds G[i,j] + G[j,i]
        for i < j).
      log_correction: [N] per-column log factor such that the
        reference's raw (long double) posterior equals
        posteriors * exp(log_correction). The emissions are rescaled by
        exp(-scale_n) on device to stay in f64/f32 range; the column's
        posterior picks up exp(-(scale_n + scale_{n+1})) through the
        forward normalization constant and the backward emission
        (scale_{N-1} only for the last column). Undoing the factor in
        extended precision host-side restores the reference's raw
        values, which its cross-subset `combine` adds directly.
    """
    N, P = columns.alleles.shape
    A = columns.incidence.shape[2]
    dtype = columns.lp.dtype
    uniform_val = jnp.asarray(1.0, dtype) / (P * P)

    # ---- forward pass ----
    def fwd_step(carry, inputs):
        alpha_prev, is_first = carry
        col = inputs
        E = jnp.exp(_emission(col))
        prev = jnp.where(
            is_first, jnp.ones((P, P), dtype), _mix_previous(alpha_prev, col.trans)
        )
        cur = prev * E
        s = jnp.sum(cur)
        alpha = jnp.where(s > 0, cur / s, jnp.full((P, P), uniform_val))
        c_fwd = jnp.where(s > 0, s, jnp.asarray(1.0, dtype))
        return (alpha, jnp.zeros((), bool)), (alpha, c_fwd)

    init = (jnp.zeros((P, P), dtype), jnp.ones((), bool))
    _, (alphas, c_fwd) = jax.lax.scan(fwd_step, init, columns)

    # ---- backward pass (reverse scan) ----
    # at column n we need E_{n+1} and t(n -> n+1) = trans[n+1]; build
    # shifted inputs so each reverse step sees its successor's column
    next_cols = jax.tree.map(lambda x: jnp.roll(x, -1, axis=0), columns)

    def bwd_step(carry, inputs):
        beta_next = carry
        alpha_n, c_n, col_next, is_last = inputs
        E_next = jnp.exp(_emission(col_next))
        helper = beta_next * E_next
        cur = jnp.where(
            is_last,
            jnp.ones((P, P), dtype),
            _mix_previous(helper, col_next.trans),
        )
        s = jnp.sum(cur)
        beta = jnp.where(s > 0, cur / s, jnp.full((P, P), uniform_val))
        posterior = alpha_n * cur * c_n  # [P, P] raw
        return beta, posterior

    _, posts = jax.lax.scan(
        bwd_step,
        jnp.zeros((P, P), dtype),
        (alphas, c_fwd, next_cols, columns.is_last),
        reverse=True,
    )

    # ---- collapse to allele pairs (batched MXU matmuls) ----
    one_hot = jax.nn.one_hot(columns.allele_local, A, dtype=dtype)  # [N, P, A]
    posteriors = jnp.einsum("npa,npq,nqb->nab", one_hot, posts, one_hot)

    next_scale = jnp.concatenate(
        [columns.scale[1:], jnp.zeros(1, columns.scale.dtype)]
    )
    log_correction = columns.scale + next_scale
    return posteriors, log_correction
