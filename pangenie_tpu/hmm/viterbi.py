"""Viterbi (phasing) pass as a max-plus JAX scan.

The reference Viterbi is O(P^4) per column (src/hmm.cpp:408-511): for
every current path-pair it scans all previous path-pairs. Phasing only
ever runs on <= 30 paths (src/commands.cpp:434-436 caps phasing paths),
so S = P^2 <= 900 states: we build the [S, S] switch-count transition
matrix once and do the whole column as one masked max-reduction in log
space — exact semantics incl. the reference's tie-breaking (`>=` in
row-major previous-state order means the LAST maximal index wins,
src/hmm.cpp:464-471).

Backtrace pointers for all columns are stored ([N, S] int32) and the
path is recovered with a reverse pointer-chase scan; the reference's
sqrt(N)-checkpoint recompute (src/hmm.cpp:119-129, 152-158) is a
host-memory trick TPU HBM does not need at phasing scale.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp

from .forward_backward import ColumnArrays, _emission


def _switch_counts(P: int) -> jnp.ndarray:
    """[S, S] number of path switches between state j and state i."""
    ids = jnp.arange(P * P)
    p1 = ids // P
    p2 = ids % P
    sw = (p1[:, None] != p1[None, :]).astype(jnp.int32) + (
        p2[:, None] != p2[None, :]
    ).astype(jnp.int32)
    return sw


@partial(jax.jit, static_argnames=("uniform",))
def viterbi(columns: ColumnArrays, uniform: bool = False):
    """Max-plus scan; returns (best path-pair state per column) [N].

    States are flattened row-major: state = p1 * P + p2.
    """
    N, P = columns.alleles.shape
    S = P * P
    dtype = columns.lp.dtype
    sw = _switch_counts(P)
    neg_inf = jnp.asarray(-jnp.inf, dtype)

    def step(carry, inputs):
        lv_prev, is_first = carry
        col = inputs
        logE = _emission(col).reshape(S)
        if uniform:
            lt = jnp.zeros(3, dtype)
        else:
            lt = jnp.log(col.trans)
        T = lt[sw]  # [S, S]
        scores = lv_prev[:, None] + T  # scores[j, i]
        # last-max tie-breaking: argmax over reversed j
        best_val = jnp.max(scores, axis=0)
        rev_arg = jnp.argmax(scores[::-1, :], axis=0)
        best_idx = (S - 1) - rev_arg
        prev_cell = jnp.where(is_first, jnp.zeros(S, dtype), best_val)
        cur = prev_cell + logE
        # per-column normalization (reference divides by the sum; any
        # positive rescale preserves the argmax chain — subtract logsumexp
        # for bounded magnitudes, uniform fallback if everything is -inf)
        lse = jax.scipy.special.logsumexp(cur)
        cur = jnp.where(
            jnp.isfinite(lse), cur - lse, jnp.full(S, -jnp.log(float(S)), dtype)
        )
        backtrace = jnp.where(is_first, jnp.zeros(S, jnp.int32), best_idx.astype(jnp.int32))
        return (cur, jnp.zeros((), bool)), backtrace

    init = (jnp.zeros(S, dtype), jnp.ones((), bool))
    (last, _), backtraces = jax.lax.scan(step, init, columns)

    # best final state: reference takes `>=` over ascending i => last max
    # (src/hmm.cpp:132-141), on sum-normalized probabilities. Our values
    # are log-space max-normalized; ties coincide.
    rev = jnp.argmax(last[::-1])
    best_last = ((S - 1) - rev).astype(jnp.int32)

    def chase(state, bt):
        prev_state = bt[state]
        return prev_state, state

    # walk pointers from the end; state emitted for each column
    _, states_rev = jax.lax.scan(chase, best_last, backtraces, reverse=True)
    # states_rev[n] = state at column n (chase emits current state, then
    # moves to its predecessor for column n-1)
    return states_rev
