"""Single-process multi-chip genotyping: on the 8-virtual-device CPU
mesh (conftest), run_genotype_command routes the HMM grid through
run_grid_local_sharded. Output must be bit-identical to the
single-device execution (PANGENIE_TPU_NO_LOCAL_SHARD=1)."""

import os

import numpy as np
import pytest

from pangenie_tpu.utils import simulate as sim


def _build_inputs(tmp_path, rng):
    chroms = {}
    with open(tmp_path / "ref.fa", "w") as fa, open(
        tmp_path / "panel.vcf", "w"
    ) as vcf:
        vcf.write("##fileformat=VCFv4.2\n")
        vcf.write(
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + "\t".join(f"S{i}" for i in range(6)) + "\n"
        )
        for name in ("chr1", "chr2", "chr3"):
            ref = sim.random_reference(20_000, rng)
            variants = sim.simulate_panel(ref, nr_samples=6, rng=rng)
            chroms[name] = (ref, variants)
            fa.write(f">{name}\n{ref.decode()}\n")
            for v in variants:
                gts = "\t".join(f"{a}|{b}" for a, b in v.genotypes)
                vcf.write(
                    f"{name}\t{v.position + 1}\t.\t{v.ref.decode()}\t"
                    f"{','.join(x.decode() for x in v.alts)}\t.\tPASS\t.\t"
                    f"GT\t{gts}\n"
                )
    reads = []
    for name, (ref, variants) in chroms.items():
        h1, h2 = sim.haplotype_sequences(ref, variants, 0)
        reads.extend(sim.simulate_reads(h1, h2, 20, 100, rng))
    with open(tmp_path / "reads.fa", "w") as out:
        for i, r in enumerate(reads):
            out.write(f">r{i}\n{r.decode()}\n")


def _body(path):
    return [l for l in open(path) if not l.startswith("##")]


def test_local_sharded_grid_bitmatches_single_device(tmp_path, monkeypatch):
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs multiple (virtual) devices")

    from pangenie_tpu.commands import run_genotype_command, run_index_command
    from pangenie_tpu.panel.sampling import reset_global_rand

    rng = np.random.default_rng(17)
    _build_inputs(tmp_path, rng)

    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        run_index_command("ref.fa", "panel.vcf", 31, "idx")
        # path-subset grid (-a) x 3 chromosomes + phasing: a 9-item grid
        reset_global_rand()
        monkeypatch.delenv("PANGENIE_TPU_NO_LOCAL_SHARD", raising=False)
        run_genotype_command(
            "idx", "reads.fa", "sharded", only_genotyping=False,
            sampling_size=5,
        )
        reset_global_rand()
        monkeypatch.setenv("PANGENIE_TPU_NO_LOCAL_SHARD", "1")
        run_genotype_command(
            "idx", "reads.fa", "single", only_genotyping=False,
            sampling_size=5,
        )
    finally:
        os.chdir(cwd)

    for suffix in ("genotyping", "phasing"):
        assert _body(tmp_path / f"sharded_{suffix}.vcf") == _body(
            tmp_path / f"single_{suffix}.vcf"
        ), suffix
