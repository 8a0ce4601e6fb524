"""Haplotype sampling (panel reduction, the ``-x`` mechanism).

Re-design of the reference HaplotypeSampler
(src/haplotypesampler.cpp:20-314) for TPU: the greedy iterative
min-cost single-path Viterbi becomes a batched min-plus ``lax.scan``
over columns with uint32 phred costs. Each of the ``size`` iterations:

- forward scan, O(P) per column via the (min, second-min) trick
  (reference get_column_minima, src/haplotypesampler.cpp:79-107): the
  cheapest predecessor for state i is the previous column's minimum
  over j != i, which is min2 when i is the argmin and min1 otherwise;
- previously sampled paths are masked out per column (emission +inf ==
  UINT32_MAX with saturating adds, mirroring the reference's overflow
  clamps, src/haplotypesampler.cpp:259-283);
- backtrace pointer chase (reverse scan), then the chosen allele's
  emission cost is penalized per column (+allele_penalty, clamped to
  the default penalty 25 — which also CAPS undefined alleles' cost of
  50 down to 25 once penalized, a reference quirk we keep,
  src/samplingemissions.cpp:39-45).

Tie-breaking is faithful: first-minimum (lowest index) in column
minima and final-column argmin; on stay-vs-switch cost ties the switch
(helper) wins because the stay path only replaces on strict '<'
(src/haplotypesampler.cpp:267-274).

For short chromosomes the full [N, P] backtrace lives in HBM; beyond
~65k columns the checkpointed variant streams column segments and
recomputes backtraces per segment during the backward chase — the
device analogue of the reference's sqrt(N) sparse table
(src/haplotypesampler.cpp:116-126), with O(segment * P) device memory.
"""

from __future__ import annotations

import math
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..kmers.unique import UniqueKmersRecord

UINT_MAX = np.uint32(0xFFFFFFFF)


def sampling_emission_costs(record: UniqueKmersRecord) -> np.ndarray:
    """Initial per-allele phred costs for one column.

    cost = trunc(-10*log10(fraction of allele kmers with count >= 3)),
    25 if the fraction is 0, 50 for undefined alleles
    (reference src/samplingemissions.cpp:9-32; fraction is computed in
    float32 as the reference uses `float`).
    """
    allele_ids = record.get_allele_ids()
    max_allele = max(allele_ids)
    costs = np.zeros(max_allele + 1, dtype=np.uint32)
    for a in allele_ids:
        if record.is_undefined_allele(a):
            costs[a] = 50
            continue
        fraction = record.fraction_present_kmers_on_allele(a)
        if fraction > 0.0:
            costs[a] = int(-10.0 * math.log10(float(fraction)))
            assert costs[a] < 25
        else:
            costs[a] = 25
    return costs


def sampling_transition_cost(
    from_pos: int, to_pos: int, recomb_rate: float, nr_paths: int,
    effective_N: float,
) -> int:
    """trunc(-10*log10(p_recomb)) in long double
    (reference src/samplingtransitions.cpp:5-23)."""
    LD = np.longdouble
    distance = LD(to_pos - from_pos) * LD(0.000004) * LD(recomb_rate) * LD(
        effective_N
    )
    recomb_prob = (LD(1.0) - np.exp(-distance / LD(nr_paths))) * (
        LD(1.0) / LD(nr_paths)
    )
    return int(-10.0 * np.log10(recomb_prob))


def _sat_add(a, b):
    """uint32 saturating add (reference overflow clamps)."""
    s = a + b
    return jnp.where(s < a, jnp.uint32(0xFFFFFFFF), s)


@partial(jax.jit, static_argnames=())
def _viterbi_iteration(path_cost, mask, switch_cost):
    """One masked single-path min-plus Viterbi.

    Args:
      path_cost: [N, P] uint32 emission cost of path i at column n
        (already UINT_MAX where masked).
      mask: [N, P] bool — True where the path is still available.
      switch_cost: [N] uint32; switch_cost[n] = cost of a recombination
        between columns n-1 and n (entry 0 unused).

    Returns:
      path: [N] int32 chosen path per column,
      best_score: uint32 DP score of the path.
    """
    N, P = path_cost.shape
    umax = jnp.uint32(0xFFFFFFFF)
    idx = jnp.arange(P)

    def fwd(carry, inputs):
        prev, prev_mask, is_first = carry
        cost_n, mask_n, sw = inputs

        masked_prev = jnp.where(prev_mask, prev, umax)
        first_val = jnp.min(masked_prev)
        first_id = jnp.argmin(masked_prev)  # first occurrence
        rest = jnp.where(idx == first_id, umax, masked_prev)
        second_val = jnp.min(rest)
        second_id = jnp.argmin(rest)

        helper_val = jnp.where(idx == first_id, second_val, first_val)
        helper_id = jnp.where(idx == first_id, second_id, first_id)

        prev_cell = _sat_add(helper_val, sw)
        backtrace = helper_id.astype(jnp.int32)
        stay = _sat_add(prev, jnp.uint32(0))  # stay cost is 0
        take_stay = prev_mask & (stay < prev_cell)
        prev_cell = jnp.where(take_stay, stay, prev_cell)
        backtrace = jnp.where(take_stay, idx.astype(jnp.int32), backtrace)

        prev_cell = jnp.where(is_first, jnp.uint32(0), prev_cell)
        backtrace = jnp.where(is_first, jnp.int32(0), backtrace)

        cur = _sat_add(prev_cell, cost_n)
        cur = jnp.where(mask_n, cur, umax)
        return (cur, mask_n, jnp.zeros((), bool)), (cur, backtrace)

    init = (
        jnp.zeros(P, jnp.uint32),
        jnp.zeros(P, bool),
        jnp.ones((), bool),
    )
    (last, _, _), (_, backtraces) = jax.lax.scan(
        fwd, init, (path_cost, mask, switch_cost)
    )

    best_index = jnp.argmin(last).astype(jnp.int32)  # first occurrence
    best_score = jnp.min(last)

    def chase(state, bt):
        return bt[state], state

    _, path = jax.lax.scan(chase, best_index, backtraces, reverse=True)
    return path, best_score


@jax.jit
def _segment_forward(carry, path_cost, mask, switch_cost):
    """Run the forward recurrence over one column segment, returning
    only the end-of-segment carry (no backtraces stored)."""
    N, P = path_cost.shape
    umax = jnp.uint32(0xFFFFFFFF)
    idx = jnp.arange(P)

    def fwd(c, inputs):
        prev, prev_mask, is_first = c
        cost_n, mask_n, sw = inputs
        masked_prev = jnp.where(prev_mask, prev, umax)
        first_val = jnp.min(masked_prev)
        first_id = jnp.argmin(masked_prev)
        rest = jnp.where(idx == first_id, umax, masked_prev)
        second_val = jnp.min(rest)
        helper_val = jnp.where(idx == first_id, second_val, first_val)
        prev_cell = _sat_add(helper_val, sw)
        stay = prev
        take_stay = prev_mask & (stay < prev_cell)
        prev_cell = jnp.where(take_stay, stay, prev_cell)
        prev_cell = jnp.where(is_first, jnp.uint32(0), prev_cell)
        cur = _sat_add(prev_cell, cost_n)
        cur = jnp.where(mask_n, cur, umax)
        return (cur, mask_n, jnp.zeros((), bool)), None

    carry, _ = jax.lax.scan(fwd, carry, (path_cost, mask, switch_cost))
    return carry


@jax.jit
def _segment_backtrace(carry, path_cost, mask, switch_cost, state_in):
    """Recompute one segment's backtraces from its entry carry and
    chase the pointer path from state_in (the chosen state at the
    column AFTER the segment, or the argmin of the final column when
    state_in < 0)."""
    N, P = path_cost.shape
    umax = jnp.uint32(0xFFFFFFFF)
    idx = jnp.arange(P)

    def fwd(c, inputs):
        prev, prev_mask, is_first = c
        cost_n, mask_n, sw = inputs
        masked_prev = jnp.where(prev_mask, prev, umax)
        first_val = jnp.min(masked_prev)
        first_id = jnp.argmin(masked_prev)
        rest = jnp.where(idx == first_id, umax, masked_prev)
        second_val = jnp.min(rest)
        second_id = jnp.argmin(rest)
        helper_val = jnp.where(idx == first_id, second_val, first_val)
        helper_id = jnp.where(idx == first_id, second_id, first_id)
        prev_cell = _sat_add(helper_val, sw)
        backtrace = helper_id.astype(jnp.int32)
        stay = prev
        take_stay = prev_mask & (stay < prev_cell)
        prev_cell = jnp.where(take_stay, stay, prev_cell)
        backtrace = jnp.where(take_stay, idx.astype(jnp.int32), backtrace)
        prev_cell = jnp.where(is_first, jnp.uint32(0), prev_cell)
        backtrace = jnp.where(is_first, jnp.int32(0), backtrace)
        cur = _sat_add(prev_cell, cost_n)
        cur = jnp.where(mask_n, cur, umax)
        return (cur, mask_n, jnp.zeros((), bool)), (cur, backtrace)

    (last, _, _), (values, backtraces) = jax.lax.scan(
        fwd, carry, (path_cost, mask, switch_cost)
    )
    # entry state: either handed in from the next segment's chase, or
    # (for the final segment) the argmin of the last column
    state = jnp.where(
        state_in >= 0, state_in, jnp.argmin(last).astype(jnp.int32)
    )

    def chase(s, bt):
        return bt[s], s

    state_out, path = jax.lax.scan(chase, state, backtraces, reverse=True)
    return state_out, path, jnp.min(last)


def _viterbi_iteration_segmented(
    path_cost: np.ndarray, mask: np.ndarray, switch: np.ndarray,
    segment: int,
):
    """Checkpointed single-path Viterbi: O(segment * P) device memory
    instead of O(N * P) — the device analogue of the reference's
    sqrt(N) sparse table (src/haplotypesampler.cpp:116-126). Host
    arrays stream segment by segment; forward runs once storing only
    segment-boundary carries, backtraces are recomputed per segment
    during the backward chase (2x forward compute, as in the
    reference)."""
    N, P = path_cost.shape
    n_segs = (N + segment - 1) // segment

    carries = []
    carry = (
        jnp.zeros(P, jnp.uint32), jnp.zeros(P, bool), jnp.ones((), bool)
    )
    for s in range(n_segs):
        carries.append(carry)
        sl = slice(s * segment, min(N, (s + 1) * segment))
        carry = _segment_forward(
            carry, jnp.asarray(path_cost[sl]), jnp.asarray(mask[sl]),
            jnp.asarray(switch[sl]),
        )

    path = np.empty(N, dtype=np.int32)
    state = jnp.int32(-1)
    best_score = None
    for s in range(n_segs - 1, -1, -1):
        sl = slice(s * segment, min(N, (s + 1) * segment))
        state, seg_path, seg_best = _segment_backtrace(
            carries[s], jnp.asarray(path_cost[sl]), jnp.asarray(mask[sl]),
            jnp.asarray(switch[sl]), state,
        )
        path[sl] = np.asarray(seg_path)
        if best_score is None:
            best_score = seg_best  # from the final segment's last column
    return jnp.asarray(path), best_score


class HaplotypeSampler:
    """Greedy panel reduction; constructor does everything
    (reference src/haplotypesampler.cpp:20-77).
    """

    def __init__(
        self,
        records: Sequence[UniqueKmersRecord],
        size: int,
        recombrate: float = 1.26,
        effective_N: float = 25000.0,
        best_scores: Optional[List[int]] = None,
        add_reference: bool = False,
        path_output: str = "",
        chromosome: str = "None",
        allele_penalty: int = 10,
    ):
        self.records = records
        self.sampled_paths: List[List[int]] = []
        if size < 1:
            return

        N = len(records)
        if N == 0:
            return
        P = records[0].get_nr_paths()

        # dense emission state: [N, A_max] allele costs + [N, P] alleles
        allele_costs = [sampling_emission_costs(r) for r in records]
        A = max(len(c) for c in allele_costs)
        costs = np.full((N, A), 0, dtype=np.uint32)
        for n, c in enumerate(allele_costs):
            costs[n, : len(c)] = c
        alleles = np.zeros((N, P), dtype=np.int32)
        for n, r in enumerate(records):
            for p in range(P):
                alleles[n, p] = r.get_allele(p)

        positions = np.array(
            [r.get_variant_position() for r in records], dtype=np.int64
        )
        switch = np.zeros(N, dtype=np.uint32)
        for n in range(1, N):
            switch[n] = sampling_transition_cost(
                int(positions[n - 1]), int(positions[n]), recombrate, P,
                effective_N,
            )
        switch_j = jnp.asarray(switch)
        alleles_j = jnp.asarray(alleles)

        # beyond this many columns, use the checkpointed scan: device
        # memory O(segment * P) instead of O(N * P)
        SEGMENT = 1 << 16
        used = np.zeros((N, P), dtype=bool)  # masked (already sampled)
        for _ in range(size):
            if N > SEGMENT:
                host_cost = np.take_along_axis(costs, alleles, axis=1)
                path, score = _viterbi_iteration_segmented(
                    host_cost, ~used, switch, SEGMENT
                )
            else:
                mask = jnp.asarray(~used)
                path_cost = jnp.take_along_axis(
                    jnp.asarray(costs), alleles_j, axis=1
                )
                path, score = _viterbi_iteration(path_cost, mask, switch_j)
            path = np.asarray(path)
            if best_scores is not None:
                best_scores.append(int(score))
            self.sampled_paths.append(path.tolist())
            # mask the chosen path ids and penalize their alleles
            used[np.arange(N), path] = True
            chosen_alleles = alleles[np.arange(N), path]
            pen = costs[np.arange(N), chosen_alleles] + allele_penalty
            costs[np.arange(N), chosen_alleles] = np.where(pen > 25, 25, pen)

        if add_reference:
            self.sampled_paths.append([0] * N)

        if path_output:
            self._write_paths(path_output, chromosome)

        self._update_unique_kmers()

    # -- outputs -----------------------------------------------------------

    def _write_paths(self, path_output: str, chromosome: str) -> None:
        """Per-column sampled path/recombination TSV
        (reference src/haplotypesampler.cpp:45-66)."""
        with open(path_output, "w") as out:
            out.write("#chromosome\tposition")
            for path_id in range(len(self.sampled_paths)):
                out.write(
                    f"\tHaplotypeID_path{path_id}\tRecombination_path{path_id}"
                )
            out.write("\n")
            for n, record in enumerate(self.records):
                out.write(f"{chromosome}\t{record.get_variant_position()}")
                for path in self.sampled_paths:
                    recomb = int(n > 0 and path[n - 1] != path[n])
                    out.write(f"\t{path[n]}\t{recomb}")
                out.write("\n")

    def _update_unique_kmers(self) -> None:
        """Rewrite every record onto the sampled path set
        (reference src/haplotypesampler.cpp:296-309)."""
        nr_paths = len(self.sampled_paths)
        for n, record in enumerate(self.records):
            record.update_paths(
                [self.sampled_paths[j][n] for j in range(nr_paths)]
            )

    def get_sampled_paths(self) -> List[List[int]]:
        return self.sampled_paths


def get_column_minima(
    column: np.ndarray, mask: np.ndarray
) -> Tuple[int, int, int, int]:
    """(first_id, second_id, first_val, second_val) with the reference's
    tie-breaking (src/haplotypesampler.cpp:79-107). Exposed for tests.
    """
    first_val = second_val = int(UINT_MAX)
    first_id = second_id = int(UINT_MAX)
    for i in range(len(column)):
        if not mask[i]:
            continue
        if column[i] < first_val:
            second_val = first_val
            second_id = first_id
            first_val = int(column[i])
            first_id = i
        elif column[i] < second_val and i != first_id:
            second_val = int(column[i])
            second_id = i
    return first_id, second_id, first_val, second_val
