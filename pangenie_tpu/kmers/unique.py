"""Per-bubble unique-kmer records and the selection pipeline.

Replaces the reference's UniqueKmers hierarchy
(src/uniquekmers.hpp, src/biallelicuniquekmers.cpp,
src/multiallelicuniquekmers.cpp) with ONE host-side record — the
biallelic/multiallelic split in the reference is a bit-packing detail
(KmerPath16 vs KmerPath); here kmer->allele incidence is a small list
per kmer, and the HMM layer densifies records into padded tensors.

Also hosts the two selection drivers:

- :class:`UniqueKmerComputer` (genotype-time, with read counts;
  reference src/uniquekmercomputer.cpp:95-253)
- :class:`StepwiseUniqueKmerComputer` (index-time, counts filled later;
  reference src/stepwiseuniquekmercomputer.cpp:96-265)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..model.probabilities import ProbabilityTable
from ..panel.graph import ChromosomeGraph
from .counter import KmerCounter
from .mer import decode_kmer


class UniqueKmersRecord:
    """Unique-kmer state of one variant bubble."""

    def __init__(self, variant_position: int, path_to_allele: Sequence[int]):
        self.variant_position = int(variant_position)
        self.path_to_allele: List[int] = [int(a) for a in path_to_allele]
        self.coverage = 0
        self.kmer_counts: List[int] = []
        self.kmer_alleles: List[List[int]] = []
        # allele id -> is_undefined; key set = alleles covered by paths
        # (+ any alleles later introduced by insert_kmer, mirroring the
        # reference's operator[] behaviour)
        self.alleles: Dict[int, bool] = {}
        for a in self.path_to_allele:
            self.alleles.setdefault(a, False)

    # -- mutation --------------------------------------------------------

    def insert_kmer(self, readcount: int, allele_ids: Sequence[int]) -> None:
        self.kmer_counts.append(int(readcount))
        self.kmer_alleles.append([int(a) for a in allele_ids])
        for a in allele_ids:
            self.alleles.setdefault(int(a), False)

    def update_readcount(self, kmer_index: int, new_count: int) -> None:
        if kmer_index >= len(self.kmer_counts):
            raise RuntimeError(
                f"UniqueKmersRecord.update_readcount: kmer index {kmer_index} "
                "does not exist."
            )
        self.kmer_counts[kmer_index] = int(new_count)

    def set_coverage(self, coverage: int) -> None:
        self.coverage = int(coverage)

    def set_undefined_allele(self, allele_id: int) -> None:
        if allele_id not in self.alleles:
            raise RuntimeError(
                f"UniqueKmersRecord.set_undefined_allele: allele_id {allele_id} "
                "does not exist."
            )
        self.alleles[allele_id] = True

    # -- queries ---------------------------------------------------------

    def size(self) -> int:
        return len(self.kmer_counts)

    def get_variant_position(self) -> int:
        return self.variant_position

    def get_coverage(self) -> int:
        return self.coverage

    def get_nr_paths(self) -> int:
        return len(self.path_to_allele)

    def get_allele(self, path_id: int) -> int:
        return self.path_to_allele[path_id]

    def get_readcount_of(self, kmer_index: int) -> int:
        return self.kmer_counts[kmer_index]

    def kmer_on_allele(self, kmer_index: int, allele_id: int) -> bool:
        return allele_id in self.kmer_alleles[kmer_index]

    def kmer_on_path(self, kmer_index: int, path_id: int) -> bool:
        return self.kmer_on_allele(kmer_index, self.path_to_allele[path_id])

    def get_path_ids(
        self, only_include: Optional[Sequence[int]] = None
    ) -> Tuple[List[int], List[int]]:
        """(paths, alleles); restricted to only_include when given.

        (reference src/biallelicuniquekmers.cpp:95-112)
        """
        paths: List[int] = []
        alleles: List[int] = []
        if only_include is not None:
            for p in only_include:
                if p < len(self.path_to_allele):
                    paths.append(p)
                    alleles.append(self.path_to_allele[p])
        else:
            for i, a in enumerate(self.path_to_allele):
                paths.append(i)
                alleles.append(a)
        return paths, alleles

    def get_allele_ids(self) -> List[int]:
        return sorted(self.alleles.keys())

    def get_defined_allele_ids(self) -> List[int]:
        return sorted(a for a, undef in self.alleles.items() if not undef)

    def is_undefined_allele(self, allele_id: int) -> bool:
        return self.alleles.get(allele_id, False)

    def kmers_on_allele(self, allele_id: int) -> int:
        return sum(1 for alleles in self.kmer_alleles if allele_id in alleles)

    def kmers_on_alleles(self) -> Dict[int, int]:
        return {a: self.kmers_on_allele(a) for a in self.alleles}

    def present_kmers_on_allele(self, allele_id: int) -> int:
        """Kmers on the allele with read support (count >= 3).

        (reference src/biallelicuniquekmers.cpp:170-180)
        """
        return sum(
            1
            for count, alleles in zip(self.kmer_counts, self.kmer_alleles)
            if count >= 3 and allele_id in alleles
        )

    def fraction_present_kmers_on_allele(self, allele_id: int) -> float:
        total = self.kmers_on_allele(allele_id)
        if total > 0:
            return np.float32(self.present_kmers_on_allele(allele_id)) / np.float32(
                total
            )
        return 1.0

    # -- panel subsetting ------------------------------------------------

    def update_paths(self, path_ids: Sequence[int]) -> None:
        """Restrict to the given paths (haplotype-sampling output).

        Kmers whose alleles are no longer covered are dropped and the
        remaining kmers renumbered in old-index order
        (reference src/biallelicuniquekmers.cpp:223-260).
        """
        updated_path_to_allele = [self.path_to_allele[p] for p in path_ids]
        surviving = dict.fromkeys(updated_path_to_allele)  # ordered unique
        undefined = [a for a in sorted(surviving) if self.alleles.get(a, False)]

        kmer_to_alleles: Dict[int, List[int]] = {}
        for a in sorted(surviving):
            for kidx, alleles in enumerate(self.kmer_alleles):
                if a in alleles:
                    kmer_to_alleles.setdefault(kidx, []).append(a)

        old_counts = list(self.kmer_counts)
        self.path_to_allele = updated_path_to_allele
        self.alleles = {}
        for a in updated_path_to_allele:
            self.alleles.setdefault(a, False)
        self.kmer_counts = []
        self.kmer_alleles = []
        for a in undefined:
            self.set_undefined_allele(a)
        for kidx in sorted(kmer_to_alleles):
            self.insert_kmer(old_counts[kidx], kmer_to_alleles[kidx])


# ---------------------------------------------------------------------------
# selection
# ---------------------------------------------------------------------------


def select_kmers(
    variant,
    occurrences: Dict[int, List[int]],
    is_biallelic: bool,
    genomic_counter: KmerCounter,
) -> Dict[int, List[int]]:
    """Pick unique kmers per allele (see _select_kmers_with_counts)."""
    sorted_kmers = sorted(occurrences.keys())
    if sorted_kmers:
        genomic_counts = genomic_counter.get_abundances(
            np.array(sorted_kmers, dtype=np.uint64)
        )
    else:
        genomic_counts = np.empty(0, dtype=np.int64)
    return _select_kmers_with_counts(
        variant, occurrences, is_biallelic, sorted_kmers, genomic_counts
    )


def _select_kmers_with_counts(
    variant,
    occurrences: Dict[int, List[int]],
    is_biallelic: bool,
    sorted_kmers: List[int],
    genomic_counts: np.ndarray,
) -> Dict[int, List[int]]:
    """Pick unique kmers per allele with round-robin caps.

    A kmer survives iff: genome-wide count equals its local count
    (unique to this bubble), it lies on exactly one allele, and that
    allele is covered by >= 1 path. Then a round-robin over alleles (in
    allele-id order, kmers in lexicographic order) picks at most
    16 (biallelic) / 32 kmers per allele and at most
    max(nr_paths, 301) in total. (reference src/uniquekmercomputer.cpp:45-92)
    """
    allele_to_kmers: Dict[int, List[int]] = {}
    # kmers iterate in packed-integer (== lexicographic) order, matching
    # the reference's ordered std::map<mer_dna, ...>
    for kmer, genomic_count in zip(sorted_kmers, genomic_counts):
        local_count = len(occurrences[kmer])
        if genomic_count - local_count != 0:
            continue
        if local_count > 1:
            continue
        allele = occurrences[kmer][0]
        if not variant.get_paths_of_allele(allele):
            continue
        allele_to_kmers.setdefault(allele, []).append(kmer)

    max_total = max(variant.nr_of_paths(), 301)
    max_kmers = 16 if is_biallelic else 32
    result: Dict[int, List[int]] = {}
    nr_selected = 0
    cursor = {a: 0 for a in allele_to_kmers}
    keep_adding = True
    while nr_selected < max_total and keep_adding:
        kmer_added = False
        for a in sorted(allele_to_kmers):
            queue = allele_to_kmers[a]
            picked = result.setdefault(a, [])
            if cursor[a] < len(queue) and len(picked) < max_kmers:
                picked.append(queue[cursor[a]])
                cursor[a] += 1
                kmer_added = True
                nr_selected += 1
            if nr_selected >= max_total:
                break
        keep_adding = kmer_added
    return {a: kmers for a, kmers in result.items() if kmers}


def _concat(parts: List[np.ndarray]) -> np.ndarray:
    if not parts:
        return np.empty(0, dtype=np.uint64)
    return np.concatenate(parts) if len(parts) > 1 else parts[0]


def _split_like(flat: np.ndarray, parts: List[np.ndarray]) -> List[np.ndarray]:
    """Split a batched-lookup result back into per-part arrays."""
    out = []
    pos = 0
    for p in parts:
        out.append(flat[pos : pos + len(p)])
        pos += len(p)
    return out


def _collect_allele_occurrences(
    variant, k: int, record: UniqueKmersRecord
) -> Dict[int, List[int]]:
    """Enumerate per-allele unique kmers across all defined alleles.

    occurrences[kmer] = list of alleles where the kmer is unique within
    the allele. Undefined alleles are flagged on the record and skipped.
    (reference src/uniquekmercomputer.cpp:125-134)
    """
    from .mer import unique_kmers_of_allele

    occurrences: Dict[int, List[int]] = {}
    for a in range(variant.nr_of_alleles()):
        if variant.is_undefined_allele(a):
            record.set_undefined_allele(a)
            continue
        allele_seq = variant.get_allele_sequence(a)
        for kmer in unique_kmers_of_allele(allele_seq, k):
            occurrences.setdefault(int(kmer), []).append(a)
    return occurrences


def _make_record(variant) -> Tuple[UniqueKmersRecord, bool]:
    path_to_alleles = [
        variant.get_allele_on_path(p) for p in range(variant.nr_of_paths())
    ]
    is_biallelic = all(a in (0, 1) for a in path_to_alleles)
    record = UniqueKmersRecord(variant.get_start_position(), path_to_alleles)
    return record, is_biallelic


class UniqueKmerComputer:
    """Genotype-time selection: kmers + read counts + local coverage.

    (reference src/uniquekmercomputer.cpp:34-253)
    """

    def __init__(
        self,
        genomic_kmers: KmerCounter,
        read_kmers: KmerCounter,
        graph: ChromosomeGraph,
        kmer_coverage: int,
    ):
        self.genomic_kmers = genomic_kmers
        self.read_kmers = read_kmers
        self.graph = graph
        self.kmer_coverage = kmer_coverage

    BLOCK = 512  # variants per lookup batch (bounds memory, amortizes
    #              numpy/native call overhead across bubbles)

    def compute_unique_kmers(
        self,
        probabilities: ProbabilityTable,
        delete_processed_variants: bool = False,
    ) -> List[UniqueKmersRecord]:
        from .mer import unique_kmers_of_allele

        result: List[UniqueKmersRecord] = []
        k = self.graph.kmer_size
        length = 2 * k
        nr_variants = self.graph.size()
        min_cov = self.kmer_coverage // 4
        max_cov = self.kmer_coverage * 4

        for block_start in range(0, nr_variants, self.BLOCK):
            block = range(
                block_start, min(block_start + self.BLOCK, nr_variants)
            )
            # pass 1: enumerate allele + flanking kmers, gather queries
            prep = []
            gen_parts: List[np.ndarray] = []
            flank_parts: List[np.ndarray] = []
            for v in block:
                variant = self.graph.get_variant(v)
                record, is_biallelic = _make_record(variant)
                occurrences = _collect_allele_occurrences(variant, k, record)
                sorted_kmers = np.fromiter(
                    sorted(occurrences), dtype=np.uint64, count=len(occurrences)
                )
                flanks = [
                    np.sort(
                        unique_kmers_of_allele(
                            self.graph.get_left_overhang(v, length), k
                        )
                    ),
                    np.sort(
                        unique_kmers_of_allele(
                            self.graph.get_right_overhang(v, length), k
                        )
                    ),
                ]
                prep.append((variant, record, is_biallelic, occurrences,
                             sorted_kmers, flanks))
                gen_parts.append(sorted_kmers)
                flank_parts.extend(flanks)

            # pass 2: three batched abundance lookups for the block
            gen_counts = _split_like(
                self.genomic_kmers.get_abundances(_concat(gen_parts)),
                gen_parts,
            )
            flank_gen = _split_like(
                self.genomic_kmers.get_abundances(_concat(flank_parts)),
                flank_parts,
            )
            flank_read = _split_like(
                self.read_kmers.get_abundances(_concat(flank_parts)),
                flank_parts,
            )

            # pass 3: per-bubble selection + local coverage
            sel_parts: List[np.ndarray] = []
            selections = []
            for i, (variant, record, is_biallelic, occurrences,
                    sorted_kmers, flanks) in enumerate(prep):
                allele_to_kmers = _select_kmers_with_counts(
                    variant, occurrences, is_biallelic,
                    sorted_kmers.tolist(), gen_counts[i],
                )
                # local coverage: mean read count of <=12 genome-unique
                # flanking kmers per side, counts outside
                # [peak/4, 4*peak] skipped AFTER the <=12 cap counter
                # (reference src/uniquekmercomputer.cpp:195-253)
                total_coverage = 0
                total_kmers = 0
                for side in range(2):
                    g = flank_gen[2 * i + side]
                    r = flank_read[2 * i + side]
                    selected = 0
                    for gi, ri in zip(g, r):
                        if selected >= 12:
                            break
                        if gi == 1:
                            selected += 1
                            if ri < min_cov or ri > max_cov:
                                continue
                            total_coverage += int(ri)
                            total_kmers += 1
                if total_kmers > 0 and total_coverage > 0:
                    record.set_coverage(total_coverage // total_kmers)
                else:
                    record.set_coverage(self.kmer_coverage)

                ordered = [
                    (a, kmer)
                    for a in sorted(allele_to_kmers)
                    for kmer in allele_to_kmers[a]
                ]
                selections.append((record, ordered))
                sel_parts.append(
                    np.fromiter(
                        (kmer for _, kmer in ordered), dtype=np.uint64,
                        count=len(ordered),
                    )
                )

            sel_counts = _split_like(
                self.read_kmers.get_abundances(_concat(sel_parts)), sel_parts
            )

            for i, (record, ordered) in enumerate(selections):
                counts = sel_counts[i]
                coverage = record.get_coverage()
                if len(ordered):
                    probs = probabilities.get_probabilities(coverage, counts)
                    for (a, _kmer), count, p in zip(ordered, counts, probs):
                        # skip kmers with all-zero probabilities
                        if p[0] > 0 or p[1] > 0 or p[2] > 0:
                            record.insert_kmer(int(count), [a])
                result.append(record)

            if delete_processed_variants:
                # keep the block's last variant: the next block's first
                # left overhang needs its end position
                first = block[0]
                if first > 0:
                    self.graph.delete_variant(first - 1)
                for v in block[:-1]:
                    self.graph.delete_variant(v)
                if block[-1] == nr_variants - 1:
                    self.graph.delete_variant(block[-1])
        return result

    def compute_local_coverage(self, var_index: int, length: int) -> int:
        """Mean read count of <=12 genome-unique flanking kmers per side,
        clamped to [peak/4, 4*peak]; fallback = global peak.

        (reference src/uniquekmercomputer.cpp:195-253)
        """
        from .mer import unique_kmers_of_allele

        k = self.graph.kmer_size
        min_cov = self.kmer_coverage // 4
        max_cov = self.kmer_coverage * 4
        total_coverage = 0
        total_kmers = 0
        max_number = 12

        for overhang in (
            self.graph.get_left_overhang(var_index, length),
            self.graph.get_right_overhang(var_index, length),
        ):
            selected = 0
            kmers = sorted(int(x) for x in unique_kmers_of_allele(overhang, k))
            if kmers:
                genomic = self.genomic_kmers.get_abundances(
                    np.array(kmers, dtype=np.uint64)
                )
                reads = self.read_kmers.get_abundances(
                    np.array(kmers, dtype=np.uint64)
                )
                for g, r in zip(genomic, reads):
                    if selected >= max_number:
                        break
                    if g == 1:
                        # counter incremented before the range check, for
                        # consistency with the stepwise computer
                        selected += 1
                        if r < min_cov or r > max_cov:
                            continue
                        total_coverage += int(r)
                        total_kmers += 1
        if total_kmers > 0 and total_coverage > 0:
            return total_coverage // total_kmers
        return self.kmer_coverage


class StepwiseUniqueKmerComputer:
    """Index-time selection: no read counts yet; writes the kmer TSV.

    (reference src/stepwiseuniquekmercomputer.cpp:96-265)
    """

    def __init__(self, genomic_kmers: KmerCounter, graph: ChromosomeGraph):
        self.genomic_kmers = genomic_kmers
        self.graph = graph

    BLOCK = 512

    def compute_unique_kmers(
        self, tsv_filename: str, delete_processed_variants: bool = False
    ) -> List[UniqueKmersRecord]:
        import gzip

        from .mer import unique_kmers_of_allele

        result: List[UniqueKmersRecord] = []
        k = self.graph.kmer_size
        overhang_size = 2 * k
        nr_variants = self.graph.size()
        with gzip.open(tsv_filename, "wt") as out:
            out.write("#chromosome\tstart\tend\tunique_kmers\tunique_kmers_overhang\n")
            for block_start in range(0, nr_variants, self.BLOCK):
                block = range(
                    block_start, min(block_start + self.BLOCK, nr_variants)
                )
                prep = []
                gen_parts: List[np.ndarray] = []
                flank_parts: List[np.ndarray] = []
                for v in block:
                    variant = self.graph.get_variant(v)
                    record, is_biallelic = _make_record(variant)
                    record.set_coverage(0)
                    occurrences = _collect_allele_occurrences(
                        variant, k, record
                    )
                    sorted_kmers = np.fromiter(
                        sorted(occurrences), dtype=np.uint64,
                        count=len(occurrences),
                    )
                    flanks = [
                        np.sort(
                            unique_kmers_of_allele(
                                self.graph.get_left_overhang(v, overhang_size), k
                            )
                        ),
                        np.sort(
                            unique_kmers_of_allele(
                                self.graph.get_right_overhang(v, overhang_size), k
                            )
                        ),
                    ]
                    prep.append((variant, record, is_biallelic, occurrences,
                                 sorted_kmers, flanks))
                    gen_parts.append(sorted_kmers)
                    flank_parts.extend(flanks)

                gen_counts = _split_like(
                    self.genomic_kmers.get_abundances(_concat(gen_parts)),
                    gen_parts,
                )
                flank_gen = _split_like(
                    self.genomic_kmers.get_abundances(_concat(flank_parts)),
                    flank_parts,
                )

                for i, (variant, record, is_biallelic, occurrences,
                        sorted_kmers, flanks) in enumerate(prep):
                    allele_to_kmers = _select_kmers_with_counts(
                        variant, occurrences, is_biallelic,
                        sorted_kmers.tolist(), gen_counts[i],
                    )
                    kmer_strs: List[str] = []
                    for a in sorted(allele_to_kmers):
                        for kmer in allele_to_kmers[a]:
                            record.insert_kmer(0, [a])
                            kmer_strs.append(decode_kmer(kmer, k))
                    # <=12 genome-unique kmers per flank
                    # (reference src/stepwiseuniquekmercomputer.cpp:227-265)
                    flanking: List[str] = []
                    for side in range(2):
                        g = flank_gen[2 * i + side]
                        selected = 0
                        for kmer, gi in zip(flanks[side], g):
                            if selected >= 12:
                                break
                            if gi == 1:
                                flanking.append(decode_kmer(int(kmer), k))
                                selected += 1
                    out.write(
                        f"{variant.chromosome}\t{variant.get_start_position()}\t"
                        f"{variant.get_end_position()}\t"
                        f"{','.join(kmer_strs) if kmer_strs else 'nan'}\t"
                        f"{','.join(flanking) if flanking else 'nan'}\n"
                    )
                    result.append(record)

                if delete_processed_variants:
                    first = block[0]
                    if first > 0:
                        self.graph.delete_variant(first - 1)
                    for v in block[:-1]:
                        self.graph.delete_variant(v)
                    if block[-1] == nr_variants - 1:
                        self.graph.delete_variant(block[-1])
        return result

    def determine_unique_flanking_kmers(
        self, var_index: int, length: int
    ) -> List[str]:
        """<=12 genome-unique kmers per flank, as strings.

        (reference src/stepwiseuniquekmercomputer.cpp:227-265)
        """
        from .mer import unique_kmers_of_allele

        k = self.graph.kmer_size
        max_number = 12
        result: List[str] = []
        for overhang in (
            self.graph.get_left_overhang(var_index, length),
            self.graph.get_right_overhang(var_index, length),
        ):
            selected = 0
            kmers = sorted(int(x) for x in unique_kmers_of_allele(overhang, k))
            if kmers:
                genomic = self.genomic_kmers.get_abundances(
                    np.array(kmers, dtype=np.uint64)
                )
                for kmer, g in zip(kmers, genomic):
                    if selected >= max_number:
                        break
                    if g == 1:
                        result.append(decode_kmer(kmer, k))
                        selected += 1
        return result
