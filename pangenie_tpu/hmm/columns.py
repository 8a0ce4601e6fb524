"""Densification: per-bubble records -> padded per-chromosome tensors.

Replaces the reference ColumnIndexer (src/columnindexer.cpp:8-78) and
the per-column "computer" objects with dense arrays that a single
``lax.scan`` consumes:

- columns where every (selected) path carries REF or an undefined allele
  are dropped (they carry no genotyping signal),
- the path subset (``only_paths``) is fixed once for the whole scan
  (the reference asserts all columns share one path set),
- per-column kmer data is padded to the chromosome-wide max kmer count,
- log copy-number probabilities are precomputed host-side from the
  ProbabilityTable (so table overrides used by tests flow through).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from ..kmers.unique import UniqueKmersRecord
from ..model.probabilities import ProbabilityTable


@dataclass
class HMMColumns:
    """Dense inputs for one (chromosome, path-subset) HMM run.

    N kept columns, P selected paths, K max kmers per column,
    A max distinct alleles per column (among the FULL panel's paths, so
    local allele indices are comparable across path subsets).
    """

    variant_ids: np.ndarray      # [N] index into the full records list
    positions: np.ndarray        # [N] variant positions (for transitions)
    paths: np.ndarray            # [P] global path ids of this subset
    alleles: np.ndarray          # [N, P] global allele id per path
    undefined: np.ndarray        # [N, A] local allele is undefined
    kmer_counts: np.ndarray      # [N, K] read counts (padded 0)
    incidence: np.ndarray        # [N, K, A] kmer-on-(local)allele
    kmer_mask: np.ndarray        # [N, K] valid kmer
    coverage: np.ndarray         # [N] local coverage
    log_probs: np.ndarray        # [N, K, 3] log P(count | CN)
    probs: np.ndarray            # [N, K, 3] linear P(count | CN)
    all_zeros: np.ndarray        # [N] full-panel emission matrix all-zero
    local_alleles: np.ndarray    # [N, A] global allele ids, -1 padded
    allele_local: np.ndarray     # [N, P] local index of alleles[n, p]
    nr_local: np.ndarray         # [N] number of distinct alleles

    @property
    def n_columns(self) -> int:
        return len(self.positions)

    @property
    def n_paths(self) -> int:
        return len(self.paths)


def transition_probs(
    positions: np.ndarray,
    nr_paths: int,
    recombrate: float,
    effective_N: float,
    uniform: bool = False,
) -> np.ndarray:
    """Li-Stephens pair transition probabilities per adjacent column.

    Returns [N-1, 3] = (stay*stay, stay*switch, switch*switch), using
    d = delta_pos * 4e-6 * recombrate * effective_N,
    switch = (1 - exp(-d/P))/P, stay = exp(-d/P) + switch
    (reference src/transitionprobabilitycomputer.cpp:8-19).
    """
    n = len(positions)
    if n < 2:
        return np.zeros((0, 3), dtype=np.float64)
    if uniform:
        return np.ones((n - 1, 3), dtype=np.float64)
    distance = (
        np.diff(positions.astype(np.float64)) * 0.000004 * recombrate * effective_N
    )
    recomb = (1.0 - np.exp(-distance / nr_paths)) / nr_paths
    stay = np.exp(-distance / nr_paths) + recomb
    return np.stack([stay * stay, stay * recomb, recomb * recomb], axis=1)


def _probability_grid(
    table: ProbabilityTable, coverage: np.ndarray, counts: np.ndarray, mask: np.ndarray
) -> np.ndarray:
    """Vectorized [N, K, 3] P(count | CN) at per-column coverage."""
    N, K = counts.shape
    out = np.zeros((N, K, 3), dtype=np.float64)
    cov = coverage.astype(np.int64)[:, None].repeat(K, axis=1)
    cnt = counts.astype(np.int64)
    in_table = (
        (cov >= table.cov_min)
        & (cov < table.cov_max)
        & (cnt < table.count_max)
        & mask
    )
    if table.table.size and np.any(in_table):
        out[in_table] = table.table[cnt[in_table], cov[in_table] - table.cov_min]
    oob = mask & ~in_table
    if np.any(oob):
        # fall back per unique (cov, count) pair
        pairs = np.stack([cov[oob], cnt[oob]], axis=1)
        uniq, inverse = np.unique(pairs, axis=0, return_inverse=True)
        vals = np.stack(
            [table.compute_probability(int(c), int(x)) for c, x in uniq]
        )
        out[oob] = vals[inverse]
    return out


def _compute_all_zeros(
    records: Sequence[UniqueKmersRecord],
    kept: np.ndarray,
    probs: np.ndarray,
    kmer_mask: np.ndarray,
) -> np.ndarray:
    """Per-column flag: full-panel emission matrix identically zero.

    (reference src/emissionprobabilitycomputer.cpp:9-29). Checked over
    ALL allele ids the record knows (including alleles introduced only
    by kmers). Exact zeros only arise from zero copy-number
    probabilities (e.g. test-injected overrides), so columns with
    all-positive probs short-circuit.
    """
    N = len(kept)
    all_zeros = np.zeros(N, dtype=bool)
    suspicious = ~np.all((probs > 0) | ~kmer_mask[:, :, None], axis=(1, 2))
    for n in np.nonzero(suspicious)[0]:
        record = records[kept[n]]
        allele_ids = record.get_allele_ids()
        col_probs = probs[n]
        k_mask = kmer_mask[n]
        found_nonzero = False
        for a1 in allele_ids:
            for a2 in allele_ids:
                u1, u2 = record.is_undefined_allele(a1), record.is_undefined_allele(a2)
                value = 1.0
                for ki in range(record.size()):
                    if not k_mask[ki]:
                        continue
                    expected = int(record.kmer_on_allele(ki, a1)) + int(
                        record.kmer_on_allele(ki, a2)
                    )
                    if u1 and u2:
                        value *= (
                            col_probs[ki, 0] + col_probs[ki, 1] + col_probs[ki, 2]
                        ) / 3.0
                    elif u1 or u2:
                        expected = min(expected, 1)
                        value *= 0.5 * (
                            col_probs[ki, expected] + col_probs[ki, expected + 1]
                        )
                    else:
                        value *= col_probs[ki, expected]
                if value > 0:
                    found_nonzero = True
                    break
            if found_nonzero:
                break
        all_zeros[n] = not found_nonzero
    return all_zeros


def build_columns(
    records: Sequence[UniqueKmersRecord],
    probabilities: ProbabilityTable,
    only_paths: Optional[Sequence[int]] = None,
) -> HMMColumns:
    """Build dense HMM inputs for a chromosome and a path subset."""
    if not records:
        raise RuntimeError("build_columns: no variant records.")

    nr_total_paths = records[0].get_nr_paths()
    if only_paths is not None:
        paths = [p for p in only_paths if p < nr_total_paths]
    else:
        paths = list(range(nr_total_paths))
    if len(paths) == 0:
        raise RuntimeError("build_columns: column is not covered by any paths.")
    paths_arr = np.array(paths, dtype=np.int32)

    kept: List[int] = []
    for idx, record in enumerate(records):
        if record.get_nr_paths() == 0:
            raise RuntimeError(
                f"build_columns: column {idx} is not covered by any paths."
            )
        keep = False
        for p in paths:
            a = record.get_allele(p)
            if a != 0 and not record.is_undefined_allele(a):
                keep = True
                break
        if keep:
            kept.append(idx)
    kept_arr = np.array(kept, dtype=np.int64)
    N = len(kept)
    P = len(paths)
    if N == 0:
        K = 1
        return HMMColumns(
            variant_ids=kept_arr,
            positions=np.zeros(0, dtype=np.int64),
            paths=paths_arr,
            alleles=np.zeros((0, P), dtype=np.int32),
            undefined=np.zeros((0, 1), dtype=bool),
            kmer_counts=np.zeros((0, K), dtype=np.int32),
            incidence=np.zeros((0, K, 1), dtype=bool),
            kmer_mask=np.zeros((0, K), dtype=bool),
            coverage=np.zeros(0, dtype=np.int32),
            log_probs=np.zeros((0, K, 3), dtype=np.float64),
            probs=np.zeros((0, K, 3), dtype=np.float64),
            all_zeros=np.zeros(0, dtype=bool),
            local_alleles=np.full((0, 1), -1, dtype=np.int32),
            allele_local=np.zeros((0, P), dtype=np.int32),
            nr_local=np.zeros(0, dtype=np.int32),
        )

    K = max(1, max(records[i].size() for i in kept))

    positions = np.zeros(N, dtype=np.int64)
    alleles = np.zeros((N, P), dtype=np.int32)
    kmer_counts = np.zeros((N, K), dtype=np.int32)
    kmer_mask = np.zeros((N, K), dtype=bool)
    coverage = np.zeros(N, dtype=np.int32)

    # local allele compression is over the FULL panel's allele set so
    # that local indices agree across path subsets
    local_allele_lists: List[List[int]] = []
    A = 1
    for n, idx in enumerate(kept):
        record = records[idx]
        positions[n] = record.get_variant_position()
        coverage[n] = record.get_coverage()
        for j, p in enumerate(paths):
            alleles[n, j] = record.get_allele(p)
        for ki in range(record.size()):
            kmer_counts[n, ki] = record.get_readcount_of(ki)
            kmer_mask[n, ki] = True
        locals_n = sorted(set(record.path_to_allele))
        local_allele_lists.append(locals_n)
        A = max(A, len(locals_n))

    local_alleles = np.full((N, A), -1, dtype=np.int32)
    allele_local = np.zeros((N, P), dtype=np.int32)
    nr_local = np.zeros(N, dtype=np.int32)
    incidence = np.zeros((N, K, A), dtype=bool)
    undefined = np.zeros((N, A), dtype=bool)
    for n in range(N):
        record = records[kept[n]]
        locals_n = local_allele_lists[n]
        nr_local[n] = len(locals_n)
        local_alleles[n, : len(locals_n)] = locals_n
        lookup = {a: i for i, a in enumerate(locals_n)}
        for li, a in enumerate(locals_n):
            undefined[n, li] = record.is_undefined_allele(a)
        for j in range(P):
            allele_local[n, j] = lookup[int(alleles[n, j])]
        for ki in range(record.size()):
            for a in record.kmer_alleles[ki]:
                li = lookup.get(int(a))
                if li is not None:
                    incidence[n, ki, li] = True

    probs = _probability_grid(probabilities, coverage, kmer_counts, kmer_mask)
    with np.errstate(divide="ignore"):
        log_probs = np.where(probs > 0, np.log(np.maximum(probs, 1e-300)), -np.inf)
    all_zeros = _compute_all_zeros(records, kept_arr, probs, kmer_mask)

    return HMMColumns(
        variant_ids=kept_arr,
        positions=positions,
        paths=paths_arr,
        alleles=alleles,
        undefined=undefined,
        kmer_counts=kmer_counts,
        incidence=incidence,
        kmer_mask=kmer_mask,
        coverage=coverage,
        log_probs=log_probs,
        probs=probs,
        all_zeros=all_zeros,
        local_alleles=local_alleles,
        allele_local=allele_local,
        nr_local=nr_local,
    )
