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


def bulk_emission_costs(records: Sequence[UniqueKmersRecord]) -> np.ndarray:
    """Vectorized :func:`sampling_emission_costs` over all records.

    Returns [N, A_max] uint32; entries for allele ids a record does not
    know stay 0 (they are never indexed). Uses the records' CSR arrays:
    per-(record, allele) kmer totals and read-supported totals come from
    two bincounts over record-offset allele keys.
    """
    N = len(records)
    n_alleles = np.fromiter(
        (max(r.alleles) + 1 if r.alleles else 1 for r in records),
        dtype=np.int64,
        count=N,
    )
    A = max(1, int(n_alleles.max()))

    data_lens = np.fromiter(
        (len(r.allele_data) for r in records), dtype=np.int64, count=N
    )
    rec_of = np.repeat(np.arange(N, dtype=np.int64), data_lens)
    total_e = int(data_lens.sum())
    if total_e:
        flat_allele = np.concatenate(
            [r.allele_data for r in records if len(r.allele_data)]
        ).astype(np.int64)
        if all(r.all_single_allele() for r in records):
            present_flags = np.concatenate(
                [r.kmer_counts for r in records if r.size()]
            ) >= 3
        else:
            present_flags = np.concatenate(
                [
                    np.repeat(r.kmer_counts >= 3, np.diff(r.allele_indptr))
                    for r in records
                    if r.size()
                ]
            )
        keys = rec_of * A + flat_allele
        totals = np.bincount(keys, minlength=N * A).reshape(N, A)
        present = np.bincount(
            keys[present_flags], minlength=N * A
        ).reshape(N, A)
    else:
        totals = np.zeros((N, A), dtype=np.int64)
        present = totals

    # fraction in float32 (the reference uses `float`), log10 in double
    frac = np.ones((N, A), dtype=np.float32)
    has_kmers = totals > 0
    np.divide(
        present.astype(np.float32),
        totals.astype(np.float32),
        out=frac,
        where=has_kmers,
    )
    costs = np.zeros((N, A), dtype=np.uint32)
    positive = frac > 0.0
    with np.errstate(divide="ignore"):
        logcost = np.trunc(-10.0 * np.log10(frac.astype(np.float64)))
    costs[positive] = logcost[positive].astype(np.uint32)
    costs[~positive] = 25
    if np.any(costs[positive] >= 25):
        raise AssertionError("bulk_emission_costs: cost >= 25 for positive fraction")

    # undefined alleles cost 50 (rare; per-record fix-up)
    for n, record in enumerate(records):
        if record.has_undefined_alleles():
            for a, undef in record.alleles.items():
                if undef:
                    costs[n, a] = 50
    # alleles outside a record's id set must stay 0, as in
    # sampling_emission_costs (costs array sized per record there)
    mask = (
        np.arange(A)[None, :] < n_alleles[:, None]
    )
    costs = np.where(mask, costs, 0).astype(np.uint32)
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
        costs = bulk_emission_costs(records)
        alleles = np.empty((N, P), dtype=np.int32)
        for n, r in enumerate(records):
            alleles[n] = r.path_to_allele

        positions = np.fromiter(
            (r.variant_position for r in records), dtype=np.int64, count=N
        )
        switch = np.zeros(N, dtype=np.uint32)
        if N > 1:
            # vectorized sampling_transition_cost in long double
            LD = np.longdouble
            distance = (
                np.diff(positions).astype(LD)
                * LD(0.000004) * LD(recombrate) * LD(effective_N)
            )
            recomb_prob = (LD(1.0) - np.exp(-distance / LD(P))) * (
                LD(1.0) / LD(P)
            )
            switch[1:] = np.trunc(-10.0 * np.log10(recomb_prob)).astype(
                np.uint32
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
        (reference src/haplotypesampler.cpp:45-66).

        Bulk-formatted: path ids, recombination flags and positions are
        assembled as one [N, 1+2S] integer matrix, string-joined per row
        and written in a single call (no per-column/per-path writes)."""
        S = len(self.sampled_paths)
        N = len(self.records)
        header = "#chromosome\tposition" + "".join(
            f"\tHaplotypeID_path{p}\tRecombination_path{p}" for p in range(S)
        )
        sampled = np.asarray(self.sampled_paths, dtype=np.int64)  # [S, N]
        recomb = np.zeros_like(sampled)
        if N > 1:
            recomb[:, 1:] = (np.diff(sampled, axis=1) != 0).astype(np.int64)
        body = np.empty((N, 1 + 2 * S), dtype=np.int64)
        body[:, 0] = np.fromiter(
            (r.get_variant_position() for r in self.records),
            dtype=np.int64, count=N,
        )
        body[:, 1::2] = sampled.T
        body[:, 2::2] = recomb.T
        prefix = chromosome + "\t"
        lines = [
            prefix + "\t".join(map(str, row)) for row in body.tolist()
        ]
        with open(path_output, "w") as out:
            out.write(header + "\n")
            out.write("\n".join(lines))
            if lines:
                out.write("\n")

    def _update_unique_kmers(self) -> None:
        """Rewrite every record onto the sampled path set
        (reference src/haplotypesampler.cpp:296-309)."""
        if not self.sampled_paths:
            return
        from ..kmers.unique import bulk_update_paths

        sampled = np.asarray(self.sampled_paths, dtype=np.int64)  # [S, N]
        bulk_update_paths(self.records, sampled)

    def get_sampled_paths(self) -> List[List[int]]:
        return self.sampled_paths


@partial(jax.jit, static_argnames=("size", "allele_penalty"))
def _sample_group(costs, alleles, switch, valid, size: int,
                  allele_penalty: int):
    """Device-resident batched greedy sampling.

    Args:
      costs: [C, N, A] uint32 initial per-allele emission costs.
      alleles: [C, N, P] int32 path->allele.
      switch: [C, N] uint32 per-column switch costs (1 in padding).
      valid: [C, N] bool — False on padding columns (their mask and
        penalty updates are suppressed so they stay neutral).
      size: number of greedy iterations.

    Returns: [size, C, N] int32 sampled path per iteration.

    The whole loop runs as one XLA program: per iteration a vmapped
    min-plus Viterbi picks a path per chromosome, then the chosen
    paths are masked and their alleles penalized with broadcast
    (scatter-free) updates — host<->device traffic is limited to the
    inputs once and the final paths.
    """
    C, N, P = alleles.shape
    p_iota = jnp.arange(P)

    def iteration(carry, _):
        costs, used = carry
        path_cost = jnp.take_along_axis(costs, alleles, axis=2)
        paths, _scores = jax.vmap(_viterbi_iteration)(
            path_cost, ~used, switch
        )
        hit = (p_iota[None, None, :] == paths[:, :, None]) & valid[
            :, :, None
        ]
        used = used | hit
        chosen = jnp.take_along_axis(
            alleles, paths[:, :, None], axis=2
        )[:, :, 0]
        sel = (
            jnp.arange(costs.shape[2])[None, None, :]
            == chosen[:, :, None]
        ) & valid[:, :, None]
        pen = jnp.minimum(
            costs + jnp.uint32(allele_penalty), jnp.uint32(25)
        )
        costs = jnp.where(sel, pen, costs)
        return (costs, used), paths

    used0 = jnp.zeros((C, N, P), bool)
    (_, _), all_paths = jax.lax.scan(
        iteration, (costs, used0), None, length=size
    )
    return all_paths


class _ChromState:
    """Dense per-chromosome sampling state for the batched driver."""

    def __init__(self, chromosome: str, records: Sequence[UniqueKmersRecord],
                 recombrate: float, effective_N: float):
        self.chromosome = chromosome
        self.records = records
        self.N = len(records)
        self.P = records[0].get_nr_paths()
        self.costs = bulk_emission_costs(records)  # [N, A]
        alleles = np.empty((self.N, self.P), dtype=np.int32)
        for n, r in enumerate(records):
            alleles[n] = r.path_to_allele
        self.alleles = alleles
        positions = np.fromiter(
            (r.variant_position for r in records), dtype=np.int64,
            count=self.N,
        )
        self.switch = np.zeros(self.N, dtype=np.uint32)
        if self.N > 1:
            LD = np.longdouble
            distance = (
                np.diff(positions).astype(LD)
                * LD(0.000004) * LD(recombrate) * LD(effective_N)
            )
            recomb_prob = (LD(1.0) - np.exp(-distance / LD(self.P))) * (
                LD(1.0) / LD(self.P)
            )
            self.switch[1:] = np.trunc(
                -10.0 * np.log10(recomb_prob)
            ).astype(np.uint32)
        self.used = np.zeros((self.N, self.P), dtype=bool)
        self.sampled_paths: List[List[int]] = []


def sample_panels_batched(
    chrom_records: "dict[str, Sequence[UniqueKmersRecord]]",
    size: int,
    recombrate: float = 1.26,
    effective_N: float = 25000.0,
    add_reference: bool = False,
    path_outputs: "Optional[dict[str, str]]" = None,
    allele_penalty: int = 10,
    max_group_bytes: int = 2 << 30,
) -> "dict[str, List[List[int]]]":
    """HaplotypeSampler over several chromosomes as BATCHED device scans.

    Chromosomes are independent, so each greedy iteration runs as ONE
    vmapped min-plus Viterbi over a [C, N_max, P] batch instead of C
    sequential dispatches — the production path for whole-genome
    sampling (the reference dispatches one thread per chromosome,
    src/commands.cpp:864-874; here the batch dim is the parallelism).

    Chromosomes are padded to a group-wide column count with (cost 0 on
    every path, all paths live, switch cost 0) columns. Such columns
    collapse every state onto the REAL final column's first-minimum
    state, reproducing the unpadded final-argmin tie-break exactly, and
    add 0 to the score, so sampled paths and scores are bit-identical
    to the sequential path (tested against HaplotypeSampler). Padded
    columns are excluded from the mask/penalty updates between
    iterations so they stay neutral.

    Chromosomes longer than the segmented-scan threshold fall back to
    the per-chromosome checkpointed path. Groups are capped at
    ``max_group_bytes`` of [C, N, P] cost tensor per dispatch.

    Updates every record's path set in place (as HaplotypeSampler does)
    and returns {chromosome: sampled paths}.
    """
    path_outputs = path_outputs or {}
    out: "dict[str, List[List[int]]]" = {}

    states: List[_ChromState] = []
    for chromosome, records in chrom_records.items():
        if size < 1 or not len(records):
            out[chromosome] = []
            continue
        st = _ChromState(chromosome, records, recombrate, effective_N)
        states.append(st)

    # full [N, P] backtraces live in HBM up to this budget; only truly
    # chromosome-scale states (e.g. 5M columns) fall back to the
    # checkpointed host-streaming scan
    SEGMENT = 1 << 16
    full_budget = 1 << 30
    long_states = [
        s for s in states if s.N * s.P * 4 > full_budget
    ]
    states = [s for s in states if s.N * s.P * 4 <= full_budget]

    # group chromosomes of similar length (padded N within 2x) under a
    # device-memory cap
    states.sort(key=lambda s: s.N)
    groups: List[List[_ChromState]] = []
    for st in states:
        Npad = 1 << max(0, (st.N - 1).bit_length())
        if groups:
            cur = groups[-1]
            cur_pad = 1 << max(0, (cur[0].N - 1).bit_length())
            pad_target = max(cur_pad, Npad)
            bytes_needed = (
                (len(cur) + 1) * pad_target * st.P * 4
            )
            if (1 << max(0, (cur[-1].N - 1).bit_length())) == Npad and \
                    bytes_needed <= max_group_bytes:
                cur.append(st)
                continue
        groups.append([st])

    for group in groups:
        C = len(group)
        N_max = max(s.N for s in group)
        P = group[0].P
        A = max(s.costs.shape[1] for s in group)
        # padding columns: emission cost 0 on every path, all paths
        # live, switch cost 1. The positive switch cost makes 'stay'
        # strictly cheaper for every state already at the running
        # minimum, so the real final column's FIRST-minimum state
        # self-sustains through the padding and the padded final argmin
        # lands exactly on it — reproducing the unpadded tie-break
        # (switch cost 0 breaks ties differently: all-equal columns
        # alternate backtraces and the entry state depends on padding
        # parity).
        switch = np.ones((C, N_max), dtype=np.uint32)
        alleles = np.zeros((C, N_max, P), dtype=np.int32)
        valid = np.zeros((C, N_max), dtype=bool)
        costs0 = np.zeros((C, N_max, A), dtype=np.uint32)
        for c, st in enumerate(group):
            switch[c, : st.N] = st.switch
            alleles[c, : st.N] = st.alleles
            valid[c, : st.N] = True
            costs0[c, : st.N, : st.costs.shape[1]] = st.costs

        # the whole greedy loop runs device-resident: ONE dispatch per
        # group, paths for every iteration read back together at the
        # end. (The per-iteration variant re-transferred [C, N, P]
        # cost + mask tensors each round — ~40 MB per iteration on
        # genome-scale groups, the dominant wall of the r2 sampler.)
        all_paths = _sample_group(
            jnp.asarray(costs0), jnp.asarray(alleles), jnp.asarray(switch),
            jnp.asarray(valid), size, int(allele_penalty),
        )
        all_paths = np.asarray(all_paths)  # [size, C, N_max]
        for c, st in enumerate(group):
            for it in range(size):
                st.sampled_paths.append(all_paths[it, c, : st.N].tolist())

    # long chromosomes: per-chromosome segmented scans
    for st in long_states:
        for _ in range(size):
            host_cost = np.take_along_axis(st.costs, st.alleles, axis=1)
            path, _score = _viterbi_iteration_segmented(
                host_cost, ~st.used, st.switch, SEGMENT
            )
            path = np.asarray(path)
            st.sampled_paths.append(path.tolist())
            rows_c = np.arange(st.N)
            st.used[rows_c, path] = True
            chosen = st.alleles[rows_c, path]
            pen = st.costs[rows_c, chosen] + allele_penalty
            st.costs[rows_c, chosen] = np.where(pen > 25, 25, pen)

    for st in states + long_states:
        if add_reference:
            st.sampled_paths.append([0] * st.N)
        sampler = HaplotypeSampler.__new__(HaplotypeSampler)
        sampler.records = st.records
        sampler.sampled_paths = st.sampled_paths
        output = path_outputs.get(st.chromosome, "")
        if output:
            sampler._write_paths(output, st.chromosome)
        sampler._update_unique_kmers()
        out[st.chromosome] = st.sampled_paths
    return out


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
