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

from .forward_backward import ColumnArrays
from .emissions import log_emission_allele_matrix


def _switch_counts(P: int) -> jnp.ndarray:
    """[S, S] number of path switches between state j and state i."""
    ids = jnp.arange(P * P)
    p1 = ids // P
    p2 = ids % P
    sw = (p1[:, None] != p1[None, :]).astype(jnp.int32) + (
        p2[:, None] != p2[None, :]
    ).astype(jnp.int32)
    return sw


def _log_allele_emissions(columns: ColumnArrays) -> jnp.ndarray:
    """All columns' log [A, A] emission matrices in one parallel pass
    (the emission has no sequential dependency; hoisting it out of the
    max-plus scan mirrors forward_backward._allele_emissions)."""
    return jax.vmap(log_emission_allele_matrix)(
        columns.lp,
        columns.pr,
        columns.incidence,
        columns.kmer_mask,
        columns.undefined,
        columns.all_zeros,
        columns.scale,
    )


def _viterbi_step(carry, inputs, P, dtype, uniform: bool,
                  with_backtrace: bool):
    lv_prev, is_first = carry
    logEA, allele_local, trans = inputs
    S = P * P
    sw = _switch_counts(P)
    logE = logEA[allele_local[:, None], allele_local[None, :]].reshape(S)
    if uniform:
        lt = jnp.zeros(3, dtype)
    else:
        lt = jnp.log(trans)
    T = lt[sw]  # [S, S]
    scores = lv_prev[:, None] + T  # scores[j, i]
    # last-max tie-breaking: argmax over reversed j
    best_val = jnp.max(scores, axis=0)
    prev_cell = jnp.where(is_first, jnp.zeros(S, dtype), best_val)
    cur = prev_cell + logE
    # per-column normalization (reference divides by the sum; any
    # positive rescale preserves the argmax chain — subtract logsumexp
    # for bounded magnitudes, uniform fallback if everything is -inf)
    lse = jax.scipy.special.logsumexp(cur)
    cur = jnp.where(
        jnp.isfinite(lse), cur - lse, jnp.full(S, -jnp.log(float(S)), dtype)
    )
    if not with_backtrace:
        return (cur, jnp.zeros((), bool)), None
    rev_arg = jnp.argmax(scores[::-1, :], axis=0)
    best_idx = (S - 1) - rev_arg
    backtrace = jnp.where(
        is_first, jnp.zeros(S, jnp.int32), best_idx.astype(jnp.int32)
    )
    return (cur, jnp.zeros((), bool)), backtrace


@partial(jax.jit, static_argnames=("uniform",))
def viterbi(columns: ColumnArrays, uniform: bool = False):
    """Max-plus scan; returns (best path-pair state per column) [N].

    States are flattened row-major: state = p1 * P + p2.
    """
    N, P = columns.alleles.shape
    S = P * P
    dtype = columns.lp.dtype
    logEA = _log_allele_emissions(columns)

    def step(carry, inputs):
        return _viterbi_step(carry, inputs, P, dtype, uniform, True)

    init = (jnp.zeros(S, dtype), jnp.ones((), bool))
    (last, _), backtraces = jax.lax.scan(
        step, init, (logEA, columns.allele_local, columns.trans)
    )

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


@partial(jax.jit, static_argnames=("uniform",))
def _viterbi_segment_forward(carry, cols: ColumnArrays, uniform: bool):
    """Carry the max-plus recurrence over one segment, no backtraces."""
    P = cols.alleles.shape[1]
    dtype = cols.lp.dtype
    logEA = _log_allele_emissions(cols)

    def step(c, inputs):
        return _viterbi_step(c, inputs, P, dtype, uniform, False)

    carry, _ = jax.lax.scan(
        step, carry, (logEA, cols.allele_local, cols.trans)
    )
    return carry


@partial(jax.jit, static_argnames=("uniform",))
def _viterbi_segment_backtrace(carry, cols: ColumnArrays, state_in,
                               uniform: bool):
    """Recompute one segment's backtraces from its entry carry and
    chase from state_in (or, when state_in < 0, the last-max argmax of
    the final column — the reference's `>=` ascending rule)."""
    P = cols.alleles.shape[1]
    dtype = cols.lp.dtype
    logEA = _log_allele_emissions(cols)

    def step(c, inputs):
        return _viterbi_step(c, inputs, P, dtype, uniform, True)

    (last, _), backtraces = jax.lax.scan(
        step, carry, (logEA, cols.allele_local, cols.trans)
    )
    S = last.shape[0]
    rev = jnp.argmax(last[::-1])
    last_max = ((S - 1) - rev).astype(jnp.int32)
    state = jnp.where(state_in >= 0, state_in, last_max)

    def chase(s, bt):
        return bt[s], s

    state_out, states = jax.lax.scan(chase, state, backtraces, reverse=True)
    return state_out, states


def viterbi_segmented(host_columns: ColumnArrays, segment: int,
                      uniform: bool = False):
    """Checkpointed Viterbi over host-resident columns: O(segment * S)
    device memory for the backtrace table (the reference's sqrt(N)
    recompute, src/hmm.cpp:119-129, on column segments)."""
    import numpy as np

    N, P = host_columns.alleles.shape
    S = P * P
    dtype = jnp.asarray(host_columns.lp[:1]).dtype
    n_segs = (N + segment - 1) // segment

    def dev_slice(sl) -> ColumnArrays:
        return ColumnArrays(*[jnp.asarray(x[sl]) for x in host_columns])

    checkpoints = []
    carry = (jnp.zeros(S, dtype), jnp.ones((), bool))
    for s in range(n_segs):
        checkpoints.append(carry)
        sl = slice(s * segment, min(N, (s + 1) * segment))
        carry = _viterbi_segment_forward(carry, dev_slice(sl), uniform)

    states = np.empty(N, dtype=np.int32)
    state = jnp.int32(-1)
    for s in range(n_segs - 1, -1, -1):
        sl = slice(s * segment, min(N, (s + 1) * segment))
        state, seg_states = _viterbi_segment_backtrace(
            checkpoints[s], dev_slice(sl), state, uniform
        )
        states[sl] = np.asarray(seg_states)
    return states
