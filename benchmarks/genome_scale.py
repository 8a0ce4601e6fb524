"""Genome-scale end-to-end workload: simulate, run, report per-phase walls.

Builds a multi-chromosome simulated panel (HPRC-like shape: P>100
haplotypes so auto-sampling engages, reference-like variant density)
plus an error-prone read set, then drives ``run_single_command`` —
the same CLI path as `pangenie-tpu single` — and reports wall clock,
variants/s and the per-phase summary.

Inputs are cached in --workdir keyed by the workload parameters, so
repeated runs (e.g. profiling different engines) skip simulation.

Usage:
  python benchmarks/genome_scale.py --mb 10 --chroms 2 --samples 61 \
      --coverage 20 --distance 200 [--workdir /tmp/pg_genome]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_inputs(args, workdir):
    from pangenie_tpu.utils import simulate as sim

    tag = (
        f"mb{args.mb}_c{args.chroms}_s{args.samples}_cov{args.coverage}"
        f"_d{args.distance}_seed{args.seed}"
    )
    casedir = os.path.join(workdir, tag)
    done = os.path.join(casedir, "DONE")
    if os.path.exists(done):
        return casedir
    os.makedirs(casedir, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    chrom_mb = args.mb / args.chroms
    length = int(chrom_mb * 1_000_000)
    t0 = time.monotonic()
    n_var_total = 0
    with open(os.path.join(casedir, "ref.fa"), "w") as fa, open(
        os.path.join(casedir, "panel.vcf"), "w"
    ) as vcf, open(os.path.join(casedir, "truth.vcf"), "w") as tr, open(
        os.path.join(casedir, "reads.fa"), "wb"
    ) as rd:
        vcf.write("##fileformat=VCFv4.2\n")
        header = (
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\t"
            + "\t".join(f"S{i}" for i in range(args.samples))
            + "\n"
        )
        vcf.write(header)
        tr.write("##fileformat=VCFv4.2\n")
        tr.write(
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS\n"
        )
        read_no = 0
        for c in range(args.chroms):
            name = f"chr{c + 1}"
            ref = sim.random_reference(length, rng)
            variants = sim.simulate_panel(
                ref, nr_samples=args.samples, rng=rng,
                mean_distance=args.distance,
            )
            n_var_total += len(variants)
            fa.write(f">{name}\n")
            seq = ref.decode()
            for i in range(0, len(seq), 10_000_000):
                fa.write(seq[i:i + 10_000_000] + "\n")
            rows = []
            for v in variants:
                gts = "\t".join(f"{a}|{b}" for a, b in v.genotypes)
                rows.append(
                    f"{name}\t{v.position + 1}\t.\t{v.ref.decode()}\t"
                    f"{','.join(x.decode() for x in v.alts)}\t.\tPASS\t.\t"
                    f"GT\t{gts}\n"
                )
            vcf.write("".join(rows))
            rows = []
            for v in variants:
                a, b = sorted(v.genotypes[0])
                rows.append(
                    f"{name}\t{v.position + 1}\t.\t{v.ref.decode()}\t"
                    f"{','.join(x.decode() for x in v.alts)}\t.\tPASS\t.\t"
                    f"GT\t{a}/{b}\n"
                )
            tr.write("".join(rows))
            # sample 0 is the genotyped individual
            h1, h2 = sim.haplotype_sequences(ref, variants, 0)
            read_no += sim.simulate_reads_to_file(
                h1, h2, args.coverage, args.read_len, rng, rd
            )
    with open(done, "w") as out:
        out.write(f"variants={n_var_total}\n")
    print(f"[sim] built {args.mb} Mb x{args.chroms} chrom, "
          f"{n_var_total} variants, {time.monotonic() - t0:.1f}s",
          file=sys.stderr)
    return casedir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=10.0, help="total Mb")
    ap.add_argument("--chroms", type=int, default=2)
    ap.add_argument("--samples", type=int, default=61)
    ap.add_argument("--coverage", type=float, default=20.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--distance", type=int, default=200)
    ap.add_argument("--seed", type=int, default=11)
    ap.add_argument("--workdir", default="/tmp/pg_genome")
    ap.add_argument("--threads", type=int, default=2)
    ap.add_argument("--skip-run", action="store_true")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run the pipeline this many times in-process; "
                    "report the last (warm: XLA compiles amortized)")
    args = ap.parse_args()

    casedir = build_inputs(args, args.workdir)
    if args.skip_run:
        return

    from pangenie_tpu.commands import run_single_command
    from pangenie_tpu.eval.concordance import genotype_concordance

    outpref = os.path.join(casedir, "out")
    for rep in range(args.repeat):
        t0 = time.monotonic()
        run_single_command(
            os.path.join(casedir, "reads.fa"),
            os.path.join(casedir, "ref.fa"),
            os.path.join(casedir, "panel.vcf"),
            31,
            outpref,
            nr_jellyfish_threads=args.threads,
            nr_core_threads=args.threads,
        )
        wall = time.monotonic() - t0
        result = genotype_concordance(
            outpref + "_genotyping.vcf", os.path.join(casedir, "truth.vcf")
        )
        print(json.dumps({
            "metric": "genome_scale_e2e_variants_per_sec",
            "value": round(result.total / wall, 1),
            "unit": "variants/s",
            "rep": rep,
            "warm": rep > 0,
            "wall_s": round(wall, 2),
            "variants": result.total,
            "mb": args.mb,
            "chroms": args.chroms,
            "paths": 2 * args.samples + 1,
            "coverage": args.coverage,
            "concordance": round(result.concordance, 5),
        }), flush=True)


if __name__ == "__main__":
    main()
