"""Pangenome construction from a phased multi-sample VCF + reference FASTA.

Replaces the reference ``GraphBuilder`` (src/graphbuilder.cpp:55-353):
streams the VCF once, validates records, clusters variants closer than
k-1 bp, merges each cluster into a bubble, and derives the k-mer
counting corpus (reference unitigs between bubbles plus every allele
sequence with flanks).

TPU-first note: this stays host-side by design — parsing and graph
topology are irregular, pointer-ish work; the output of this layer is
what gets densified into device tensors downstream.
"""

from __future__ import annotations

import re
from typing import Dict, List

from ..io.fasta import FastaReader
from ..io.sequence import normalize_sequence
from .graph import ChromosomeGraph
from .variant import VariantBubble

_ALT_PATTERN = re.compile(rb"^[CAGTcagt,]+$")

_VCF_FIELDS = ["#CHROM", "POS", "ID", "REF", "ALT", "QUAL", "FILTER", "INFO", "FORMAT"]


_ATOI_RE = re.compile(r"\s*[+-]?\d+")


def _atoi(s: str) -> int:
    """C atoi: leading integer prefix, 0 if none."""
    try:
        return int(s)  # fast path: plain genotype indices
    except ValueError:
        m = _ATOI_RE.match(s)
        return int(m.group()) if m else 0


def _parse_info_ids(info: str) -> List[str]:
    """Extract the comma-separated INFO ID= values.

    (reference src/graphbuilder.cpp:44-53)
    """
    for field in info.split(";"):
        if field.startswith("ID="):
            return field[3:].split(",")
    return []


class PanelBuilder:
    """Builds per-chromosome ChromosomeGraph objects from VCF + FASTA."""

    def __init__(
        self,
        vcf_filename: str,
        reference_filename: str,
        segments_filename: str | None,
        kmer_size: int,
        add_reference: bool,
    ):
        self.kmer_size = kmer_size
        self.nr_variants = 0
        self.nr_paths = 0
        self.chromosomes: List[str] = []
        self.graphs: Dict[str, ChromosomeGraph] = {}

        fasta_reader = FastaReader(reference_filename)
        self._construct_graph(vcf_filename, fasta_reader, add_reference)
        if segments_filename is not None:
            self.write_path_segments(segments_filename, fasta_reader)
        self._leftover_fasta = fasta_reader

    # -- VCF streaming ---------------------------------------------------

    def _construct_graph(
        self, filename: str, fasta_reader: FastaReader, add_reference: bool
    ) -> None:
        if filename.endswith(".gz"):
            raise RuntimeError("PanelBuilder: uncompressed VCF-file is required.")
        try:
            file = open(filename, "r")
        except OSError as e:
            raise RuntimeError("PanelBuilder: input VCF file cannot be opened.") from e

        previous_chrom = ""
        previous_end_pos = 0
        nr_samples = 0  # set by the header line
        variant_cluster: List[VariantBubble] = []
        variant_cluster_ids: List[List[str]] = []
        current_graph: ChromosomeGraph | None = None
        header_seen = False

        from ..kmers import native as _native

        use_native_gt = _native.available()

        with file:
            for line in file:
                line = line.rstrip("\n")
                if not line:
                    continue
                if line.startswith("##"):
                    continue
                # data rows: only fields 0-8 are tokenized; the GT
                # region (field 9+) parses as one block natively
                tokens = (
                    line.split("\t")
                    if line.startswith("#")
                    else line.split("\t", 9)
                )
                if line.startswith("#"):
                    if len(tokens) < 9:
                        raise RuntimeError("PanelBuilder: not a proper VCF-file.")
                    if len(tokens) < 10:
                        raise RuntimeError("PanelBuilder: no haplotype paths given.")
                    for i in range(9):
                        if tokens[i] != _VCF_FIELDS[i]:
                            raise RuntimeError(
                                "PanelBuilder: VCF header line is malformed."
                            )
                    nr_samples = len(tokens) - 9
                    self.nr_paths = nr_samples * 2
                    if add_reference:
                        self.nr_paths += 1
                    header_seen = True
                    continue
                if len(tokens) < 10:
                    raise RuntimeError(
                        "PanelBuilder: malformed VCF-file, or no haplotype paths given."
                    )
                current_chrom = tokens[0]
                current_start_pos = int(tokens[1]) - 1  # VCF is 1-based
                if previous_chrom == current_chrom and current_start_pos < previous_end_pos:
                    raise RuntimeError(
                        f"PanelBuilder: variant at {current_chrom}:{current_start_pos} "
                        "overlaps previous one. VCF does not represent a pangenome graph."
                    )

                ref = normalize_sequence(tokens[3])
                # after the first graph was created, the chromosome's
                # sequence lives in that graph's FastaReader
                if previous_chrom == current_chrom:
                    assert current_graph is not None
                    reader = current_graph.fasta_reader
                else:
                    reader = fasta_reader
                observed = reader.get_subsequence(
                    current_chrom, current_start_pos, current_start_pos + len(ref)
                )
                if ref != observed:
                    raise RuntimeError(
                        "PanelBuilder: REF allele in VCF does not match reference FASTA."
                    )
                current_end_pos = current_start_pos + len(ref)

                if not _ALT_PATTERN.match(tokens[4].encode("ascii")):
                    # skip records with symbolic / undefined ALT alleles
                    continue
                alleles: List[bytes] = [ref] + [
                    normalize_sequence(a) for a in tokens[4].split(",")
                ]
                if len(alleles) > 65535:
                    raise RuntimeError(
                        "PanelBuilder: number of alternative alleles is limited to 65534."
                    )

                size_of_chromosome = reader.get_size_of(current_chrom)
                # skip variants too close to the chromosome ends
                if (current_start_pos < self.kmer_size * 2) or (
                    current_end_pos + self.kmer_size * 2 > size_of_chromosome
                ):
                    continue

                # start a new cluster if the chromosome changed or the
                # variant is >= k-1 bases away from the previous one
                if previous_chrom != current_chrom or (
                    current_start_pos - previous_end_pos
                ) >= (self.kmer_size - 1):
                    if current_graph is not None:
                        current_graph.add_variant_cluster(
                            variant_cluster, variant_cluster_ids, True
                        )
                    variant_cluster = []
                    variant_cluster_ids = []
                    if previous_chrom != current_chrom:
                        if current_graph is not None:
                            self.graphs[previous_chrom] = current_graph
                        current_graph = ChromosomeGraph(
                            fasta_reader.extract_name(current_chrom),
                            current_chrom,
                            self.kmer_size,
                            add_reference,
                        )

                var_ids = _parse_info_ids(tokens[7])

                if self.nr_paths > 65535:
                    raise RuntimeError(
                        "PanelBuilder: number of paths is limited to 65534."
                    )

                # construct per-path alleles; each missing '.' haplotype
                # becomes its own new "N" allele. Faithful to the
                # reference (src/graphbuilder.cpp:216-242): genotype
                # fields are parsed with atoi semantics, so "0:150"
                # (GT:PS format) reads as allele 0 and ".:100" is NOT
                # treated as missing (atoi('.') == 0)
                paths: List[int] = []
                if add_reference:
                    paths.append(0)
                undefined_index = len(alleles)
                parsed = (
                    _native.parse_gt_line(
                        tokens[9].encode("ascii"), undefined_index,
                        nr_samples,
                    )
                    if use_native_gt
                    else None
                )
                if parsed is not None:
                    gt_paths, n_undef = parsed
                    paths.extend(gt_paths.tolist())
                    if n_undef:
                        alleles.extend([b"N"] * n_undef)
                        assert undefined_index + n_undef <= 65535
                    gt_tokens = []
                else:
                    gt_tokens = tokens[9].split("\t")
                for token in gt_tokens:
                    if "/" in token:
                        raise RuntimeError("PanelBuilder: found unphased genotype.")
                    a, sep, b = token.partition("|")
                    if not sep or "|" in b:
                        raise RuntimeError(
                            "PanelBuilder: genotypes must be diploid (.|. if missing)."
                        )
                    for s in (a, b):
                        if s == ".":
                            alleles.append(b"N")
                            paths.append(undefined_index)
                            assert undefined_index < 65535
                            undefined_index += 1
                        else:
                            p_index = _atoi(s)
                            if p_index >= len(alleles) or p_index < 0:
                                raise RuntimeError(
                                    "PanelBuilder: invalid genotype in VCF."
                                )
                            paths.append(p_index)

                assert current_graph is not None
                left_flank = current_graph.fasta_reader.get_subsequence(
                    current_chrom,
                    current_start_pos - self.kmer_size + 1,
                    current_start_pos,
                )
                right_flank = current_graph.fasta_reader.get_subsequence(
                    current_chrom,
                    current_end_pos,
                    current_end_pos + self.kmer_size - 1,
                )
                variant = VariantBubble(
                    left_flank,
                    right_flank,
                    current_chrom,
                    current_start_pos,
                    current_end_pos,
                    alleles,
                    paths,
                )
                variant_cluster.append(variant)
                variant_cluster_ids.append(var_ids)
                previous_chrom = current_chrom
                previous_end_pos = current_end_pos

        if not header_seen:
            raise RuntimeError("PanelBuilder: not a proper VCF-file.")
        if current_graph is not None:
            current_graph.add_variant_cluster(variant_cluster, variant_cluster_ids, True)
            self.graphs[previous_chrom] = current_graph

        # order chromosomes by descending number of bubbles (reference
        # processes big chromosomes first for better thread packing)
        sizes = sorted(
            ((g.size(), name) for name, g in self.graphs.items()), reverse=True
        )
        self.chromosomes = [name for _, name in sizes]
        self.nr_variants = sum(g.size() for g in self.graphs.values())

    # -- k-mer counting corpus -------------------------------------------

    def write_path_segments(self, filename: str, fasta_reader: FastaReader) -> None:
        """Write the graph k-mer corpus FASTA: reference unitigs between
        bubbles + all allele sequences (with flanks) per bubble.

        (reference src/graphbuilder.cpp:293-353)
        """
        with open(filename, "w") as out:
            vcf_chromosomes = set(self.graphs.keys())
            # VCF chromosomes first (size-descending, as ordered by
            # construction), then FASTA-only chromosomes
            all_names = list(self.chromosomes) + [
                n for n in fasta_reader.get_names() if n not in vcf_chromosomes
            ]
            for element in all_names:
                if element in vcf_chromosomes:
                    graph = self.graphs[element]
                    if graph.variants_were_deleted():
                        raise RuntimeError(
                            "PanelBuilder.write_path_segments: variants were deleted."
                        )
                    reader = graph.fasta_reader
                    chrom_seq = reader.get_sequence(element)
                    prev_end = 0
                    parts: List[str] = []
                    for i in range(graph.size()):
                        variant = graph.get_variant(i)
                        start_pos = variant.start_position
                        parts.append(f">{element}_reference_{start_pos}\n")
                        parts.append(
                            chrom_seq[prev_end:start_pos].decode("ascii")
                        )
                        parts.append("\n")
                        seqs, _undef = variant.selection_alleles()
                        for allele, seq in enumerate(seqs):
                            parts.append(f">{element}_{start_pos}_{allele}\n")
                            parts.append(seq.decode("ascii"))
                            parts.append("\n")
                        prev_end = variant.get_end_position()
                        if len(parts) >= 4096:
                            out.write("".join(parts))
                            parts = []
                    out.write("".join(parts))
                    out.write(f">{element}_reference_end\n")
                    chr_len = reader.get_size_of(element)
                    out.write(
                        reader.get_subsequence(element, prev_end, chr_len).decode("ascii")
                        + "\n"
                    )
                else:
                    out.write(f">{element}_reference_end\n")
                    chr_len = fasta_reader.get_size_of(element)
                    out.write(
                        fasta_reader.get_subsequence(element, 0, chr_len).decode("ascii")
                        + "\n"
                    )

    def get_chromosomes(self) -> List[str]:
        return list(self.chromosomes)

    def nr_of_paths(self) -> int:
        return self.nr_paths

    def get_kmer_size(self) -> int:
        return self.kmer_size
