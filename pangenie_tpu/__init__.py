"""pangenie_tpu: a TPU-native pangenome genotyper.

A from-scratch JAX/XLA/Pallas re-design of the PanGenie short-read
genotyper (pangenome-based k-mer genotyping with a Li-Stephens pair HMM).

Layer map (mirrors capabilities of the reference C++ implementation,
re-architected for TPU):

- ``io``      : FASTA / VCF parsing and index serialization (host side)
- ``panel``   : pangenome graph construction (bubble clustering / allele
                merging), VCF output writers
- ``kmers``   : canonical k-mer counting (sorted-table engine with a
                numpy host path and a JAX/TPU device path), histogram /
                coverage estimation, unique-kmer selection
- ``model``   : copy-number probability model (geometric + Poisson with
                regularization), emission factorization
- ``hmm``     : batched forward/backward + Viterbi pair-HMM scans and the
                integer min-plus haplotype-sampling DP
- ``parallel``: device meshes, sharding of (chromosome-batch, path-subset)
                work over TPU slices
- ``cli``     : `pangenie-tpu index|genotype|vcf|sample` entry points
"""

__version__ = "0.1.0"
