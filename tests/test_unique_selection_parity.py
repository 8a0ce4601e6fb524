"""The flat-vectorized UniqueKmerComputer must match the per-bubble
reference implementation bubble-for-bubble (kmers, counts, incidence,
coverage, undefined flags) on a simulated panel with merged bubbles,
multi-allelics, SVs and missing genotypes."""

import numpy as np

from pangenie_tpu.kmers.counter import ExactKmerCounter
from pangenie_tpu.kmers.unique import UniqueKmerComputer
from pangenie_tpu.model.probabilities import ProbabilityTable
from pangenie_tpu.panel.builder import PanelBuilder
from pangenie_tpu.utils import simulate as sim


def _records_equal(a, b):
    assert a.variant_position == b.variant_position
    assert a.coverage == b.coverage
    assert np.array_equal(a.path_to_allele, b.path_to_allele)
    assert np.array_equal(a.kmer_counts, b.kmer_counts)
    assert np.array_equal(a.allele_data, b.allele_data)
    assert np.array_equal(a.allele_indptr, b.allele_indptr)
    assert a.alleles == b.alleles


def test_vectorized_selection_matches_reference(tmp_path):
    rng = np.random.default_rng(5)
    ref = sim.random_reference(60_000, rng)
    variants = sim.simulate_panel(
        ref, nr_samples=8, rng=rng, mean_distance=120,
        cluster_fraction=0.15, sv_fraction=0.05, sv_length=120,
    )
    # plant a missing genotype (undefined-allele path)
    variants[3].genotypes[2] = (variants[3].genotypes[2][0], None)
    with open(tmp_path / "panel.vcf", "w") as out:
        out.write("##fileformat=VCFv4.2\n")
        out.write(
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + "\t".join(f"S{i}" for i in range(8)) + "\n"
        )
        for v in variants:
            gts = "\t".join(
                f"{x if x is not None else '.'}|"
                f"{y if y is not None else '.'}"
                for x, y in v.genotypes
            )
            out.write(
                f"chr1\t{v.position + 1}\t.\t{v.ref.decode()}\t"
                f"{','.join(a.decode() for a in v.alts)}\t.\tPASS\t.\tGT\t"
                + gts + "\n"
            )
    with open(tmp_path / "ref.fa", "w") as out:
        out.write(">chr1\n" + ref.decode() + "\n")

    k = 31
    builder = PanelBuilder(
        str(tmp_path / "panel.vcf"), str(tmp_path / "ref.fa"),
        str(tmp_path / "segments.fa"), k, False,
    )
    genomic = ExactKmerCounter.count_file(str(tmp_path / "segments.fa"), k)
    h1, h2 = sim.haplotype_sequences(ref, variants, 0)
    reads = sim.simulate_reads(h1, h2, 12.0, 100, rng)
    with open(tmp_path / "reads.fa", "w") as out:
        for i, r in enumerate(reads):
            out.write(f">r{i}\n{r.decode()}\n")
    read_counts = ExactKmerCounter.count_file_primed(
        str(tmp_path / "reads.fa"), [str(tmp_path / "segments.fa")], k
    )
    peak = read_counts.compute_histogram(10000, False)
    probs = ProbabilityTable(peak // 4, peak * 4, 2 * peak, 0.01)

    graph = builder.graphs["chr1"]
    new = UniqueKmerComputer(
        genomic, read_counts, graph, peak
    ).compute_unique_kmers(probs)
    old = UniqueKmerComputer(
        genomic, read_counts, graph, peak
    ).compute_unique_kmers_reference(probs)
    assert len(new) == len(old) and len(new) > 20
    n_kmers = 0
    for a, b in zip(new, old):
        _records_equal(a, b)
        n_kmers += a.size()
    assert n_kmers > 100


def test_vectorized_selection_small_k(tmp_path):
    """k small enough that flank segments hit the short-segment path."""
    rng = np.random.default_rng(9)
    ref = sim.random_reference(8_000, rng)
    variants = sim.simulate_panel(
        ref, nr_samples=3, rng=rng, mean_distance=300, kmer_size=7,
    )
    with open(tmp_path / "panel.vcf", "w") as out:
        out.write("##fileformat=VCFv4.2\n")
        out.write(
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + "\t".join(f"S{i}" for i in range(3)) + "\n"
        )
        for v in variants:
            gts = "\t".join(f"{x}|{y}" for x, y in v.genotypes)
            out.write(
                f"chr1\t{v.position + 1}\t.\t{v.ref.decode()}\t"
                f"{','.join(a.decode() for a in v.alts)}\t.\tPASS\t.\tGT\t"
                + gts + "\n"
            )
    with open(tmp_path / "ref.fa", "w") as out:
        out.write(">chr1\n" + ref.decode() + "\n")
    k = 7
    builder = PanelBuilder(
        str(tmp_path / "panel.vcf"), str(tmp_path / "ref.fa"),
        str(tmp_path / "segments.fa"), k, False,
    )
    genomic = ExactKmerCounter.count_file(str(tmp_path / "segments.fa"), k)
    h1, h2 = sim.haplotype_sequences(ref, variants, 0)
    reads = sim.simulate_reads(h1, h2, 10.0, 60, rng)
    with open(tmp_path / "reads.fa", "w") as out:
        for i, r in enumerate(reads):
            out.write(f">r{i}\n{r.decode()}\n")
    read_counts = ExactKmerCounter.count_file_primed(
        str(tmp_path / "reads.fa"), [str(tmp_path / "segments.fa")], k
    )
    peak = read_counts.compute_histogram(10000, False)
    probs = ProbabilityTable(peak // 4, peak * 4, 2 * peak, 0.01)
    graph = builder.graphs["chr1"]
    new = UniqueKmerComputer(
        genomic, read_counts, graph, peak
    ).compute_unique_kmers(probs)
    old = UniqueKmerComputer(
        genomic, read_counts, graph, peak
    ).compute_unique_kmers_reference(probs)
    assert len(new) == len(old) and len(new) > 3
    for a, b in zip(new, old):
        _records_equal(a, b)
