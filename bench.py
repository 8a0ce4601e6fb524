"""Driver benchmark: three JSON lines covering the pipeline's metrics.

Line 1  kmer_count_device_primed_mbps — the genotype-phase read-counting
        engine (PRIME+UPDATE streaming against a fixed graph-kmer table,
        kmers/device_counter.py) on a synthetic-genome workload.
        vs_baseline: the reference's only end-to-end number implies its
        Jellyfish phase streams ~90 Gbp of 30x reads inside the 55-min
        24-core genotyping wall (BASELINE.md) => >=27.3 Mbp/s.

Line 2  e2e_genotype_variants_per_sec — a full simulated genotyping run
        (graph build, counting, unique-kmer selection, HMM, VCF write)
        via run_single_command, measured in genotyped variants/sec
        including XLA compiles. vs_baseline: the reference genotypes
        36M variants in 55 min on 24 cores => 10,909 variants/sec.

Line 3  hmm_variant_columns_per_sec_per_chip — the HMM hot loop
        (batched f32 forward-backward pair-HMM), same shape and sync
        discipline as round 1 so the numbers stay comparable.
        vs_baseline: columns/sec against the reference's implied
        10,909 end-to-end columns/sec (upper-bound-flavored: this
        covers the dominant compute phase only).

Timing honesty: on the tunneled TPU backend, ``block_until_ready`` can
return before the device has executed anything, and repeated identical
dispatches may be deduplicated. Every timed run therefore (a) uses a
DISTINCT input buffer and (b) is synced by a device-side reduction of
its outputs whose scalar is copied to the host — the copy cannot
complete before the run has.
"""

import json
import os
import sys
import tempfile
import time
import traceback

BASELINE_COLUMNS_PER_SEC = 36_000_000 / (55 * 60)  # reference README.md:254
BASELINE_KMER_MBPS = 90_000 / (55 * 60)  # 30x human reads in the same wall


def _ensure_backend() -> None:
    """Fail over to CPU if the (tunneled, occasionally flaky) TPU
    backend cannot initialize — an honest-but-small number beats a
    crashed benchmark run."""
    import jax

    for attempt in range(2):
        try:
            jax.devices()
            return
        except RuntimeError as e:
            print(f"backend init failed (attempt {attempt}): {e}",
                  file=sys.stderr)
            time.sleep(20)
    jax.config.update("jax_platforms", "cpu")
    jax.devices()
    print("WARNING: benchmarking on CPU fallback", file=sys.stderr)


def bench_kmers() -> None:
    """Device PRIME+UPDATE counting rate on genome-derived reads.

    The graph-kmer table is PRIMED once, untimed — it is the per-panel
    index artifact the reference also builds once (its jellyfish hash
    of the path-segments corpus) and then reuses across the whole read
    stream. Each timed run then streams 8 distinct 33.5 Mbp read
    batches (mask-free 2-bit packing: 0.25 bytes/base over the link)
    through the UPDATE path and flushes, synced by a device-side
    reduction. Counting is validated exactly: reads are pure genome
    slices, so every one of their canonical k-mer windows must land in
    the table — the final count mass is asserted equal to the total
    window count across all runs.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pangenie_tpu.kmers.counter import ExactKmerCounter
    from pangenie_tpu.kmers.device_counter import (
        PrimedDeviceCounter, pack_codes_2bit,
    )

    # 256k-read batches: one fused ingest dispatch per 33 Mbp (launch
    # latency on the tunneled backend is ~25 ms per dispatch)
    K, GENOME_MBP, READ_LEN, BATCH = 31, 4, 128, 262_144
    BATCHES_PER_RUN = 8
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=GENOME_MBP * 1_000_000).astype(np.uint8)
    lut = np.frombuffer(b"ACGT", dtype=np.uint8)
    keys = np.unique(ExactKmerCounter._extract_canonical(
        [lut[genome].tobytes()], K
    ))

    def make_packed(seed):
        r = np.random.default_rng(seed)
        n_reads = BATCHES_PER_RUN * BATCH
        starts = r.integers(0, len(genome) - READ_LEN, size=n_reads)
        reads = genome[starts[:, None] + np.arange(READ_LEN)[None, :]]
        return [
            pack_codes_2bit(reads[b * BATCH:(b + 1) * BATCH])[0]
            for b in range(BATCHES_PER_RUN)
        ]

    # a DISTINCT read set per timed run (no dispatch deduplication)
    packed_sets = [make_packed(seed) for seed in range(3)]
    mbp = BATCHES_PER_RUN * BATCH * READ_LEN / 1e6

    counter = PrimedDeviceCounter(K, keys)  # PRIME: once, untimed

    def run(packed):
        for words in packed:
            counter.update_packed_batch(words, None, READ_LEN)
        counter._flush()
        # device-side reduce + scalar host copy = true completion sync
        float(np.asarray(jnp.sum(counter._counts)))

    run(packed_sets[2])  # compile + warm up
    best = float("inf")
    for i in range(2):
        start = time.perf_counter()
        run(packed_sets[i])
        best = min(best, time.perf_counter() - start)
    _, counts = counter.to_host_arrays()
    windows_per_run = BATCHES_PER_RUN * BATCH * (READ_LEN - K + 1)
    assert counts.sum() == 3 * windows_per_run, (
        f"count mass {counts.sum()} != {3 * windows_per_run}"
    )
    value = mbp / best
    print(json.dumps({
        "metric": "kmer_count_device_primed_mbps",
        "value": round(value, 1),
        "unit": "Mbp/s",
        "graph_kmers": int(len(keys)),
        "backend": jax.devices()[0].platform,
        "vs_baseline": round(value / BASELINE_KMER_MBPS, 3),
    }), flush=True)


def bench_e2e() -> None:
    """Genome-scale end-to-end genotyping: variants/sec.

    Workload (VERDICT r02 item 3): 50 Mb over 5 chromosomes, 61
    diploid samples = 123 haplotype paths (auto-sampling to 15
    engages, as on every real panel), reference-like variant density
    (~270k variants), 12x error-prone 150 bp reads (~600 Mbp).

    The full `single` pipeline runs TWICE in-process: the first (cold)
    run pays XLA compiles — minutes-scale on the tunneled backend and
    not cacheable across processes (a persistent-cache entry still
    recompiled in 437 s when loaded from a fresh process) — the second
    run is the steady state. Both walls are reported; vs_baseline uses
    the warm number. Per-phase wall summaries for both runs print to
    stderr above the JSON line, so host-bound phases (VCF parse,
    selection — 2 CPU cores here vs the reference baseline's 24) are
    attributable.
    """
    import types

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from benchmarks.genome_scale import build_inputs
    from pangenie_tpu.commands import run_single_command
    from pangenie_tpu.eval.concordance import genotype_concordance

    args = types.SimpleNamespace(
        mb=50.0, chroms=5, samples=61, coverage=12.0, read_len=150,
        distance=150, seed=11,
    )
    with tempfile.TemporaryDirectory(prefix="pangenie_bench_") as workdir:
        casedir = build_inputs(args, workdir)
        outpref = os.path.join(casedir, "out")
        walls = []
        for rep in range(2):
            t0 = time.monotonic()
            run_single_command(
                os.path.join(casedir, "reads.fa"),
                os.path.join(casedir, "ref.fa"),
                os.path.join(casedir, "panel.vcf"),
                31,
                outpref,
                nr_jellyfish_threads=2,
                nr_core_threads=2,
            )
            walls.append(time.monotonic() - t0)
        result = genotype_concordance(
            outpref + "_genotyping.vcf", os.path.join(casedir, "truth.vcf")
        )
        value = result.total / walls[-1]
        print(json.dumps({
            "metric": "e2e_genotype_variants_per_sec",
            "value": round(value, 1),
            "unit": "variants/s",
            "warm_wall_s": round(walls[-1], 2),
            "cold_wall_s": round(walls[0], 2),
            "variants": result.total,
            "length_bp": int(args.mb * 1_000_000),
            "chromosomes": args.chroms,
            "paths": 2 * args.samples + 1,
            "coverage": args.coverage,
            "concordance": round(result.concordance, 5),
            "vs_baseline": round(value / BASELINE_COLUMNS_PER_SEC, 3),
        }), flush=True)


def bench_hmm() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pangenie_tpu.hmm.batch import forward_backward_batch
    from pangenie_tpu.utils.synthetic import synthetic_columns

    B, N, P, K = 128, 4096, 32, 16

    def make(seed):
        cols = synthetic_columns(
            n_columns=N, n_paths=P, n_kmers=K, batch_dims=(B,),
            dtype=jnp.float32, seed=seed,
        )
        return type(cols)(*[jnp.asarray(x) for x in cols])

    fb = jax.jit(forward_backward_batch)

    def device_sum(result):
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(result))

    # distinct inputs per timed dispatch: no dedup possible. Dispatches
    # are pipelined (enqueued back-to-back, one device-reduce + scalar
    # host copy of ALL outputs at the end) — the production pattern:
    # run_deferred streams batch after batch without host syncs, so
    # per-dispatch tunnel latency overlaps device compute.
    reps = 4
    inputs = [make(seed) for seed in range(reps + 1)]

    def timed(fn):
        float(np.asarray(device_sum(fn(inputs[-1]))))  # compile + warm
        best = float("inf")
        for _ in range(2):
            start = time.perf_counter()
            results = [fn(inputs[seed]) for seed in range(reps)]
            total = sum(device_sum(r) for r in results)
            float(np.asarray(total))  # completion sync
            best = min(best, time.perf_counter() - start)
        return best / reps

    from pangenie_tpu.hmm import batch as hmm_batch

    elapsed = timed(fb)
    dispatch = hmm_batch.last_dispatch

    # reference point: the portable XLA scan on the same inputs — the
    # kernel-vs-scan comparison VERDICT r02 asked the artifact to carry.
    # A fresh wrapper function forces a re-trace (jax.jit shares its
    # cache per function object, so the env flag alone would silently
    # reuse the kernel executable).
    os.environ["PANGENIE_TPU_NO_PALLAS"] = "1"
    try:
        scan_elapsed = timed(jax.jit(lambda c: forward_backward_batch(c)))
        scan_dispatch = hmm_batch.last_dispatch
    finally:
        del os.environ["PANGENIE_TPU_NO_PALLAS"]
    assert scan_dispatch == "xla_scan", scan_dispatch

    columns_per_sec = B * N / elapsed
    print(json.dumps({
        "metric": "hmm_variant_columns_per_sec_per_chip",
        "value": round(columns_per_sec, 1),
        "unit": "columns/s",
        "dispatch": dispatch,
        "kernel_ms_per_batch": round(elapsed * 1000, 1),
        "xla_scan_ms_per_batch": round(scan_elapsed * 1000, 1),
        "kernel_speedup_vs_scan": round(scan_elapsed / elapsed, 2),
        "vs_baseline": round(columns_per_sec / BASELINE_COLUMNS_PER_SEC, 3),
    }), flush=True)


def main() -> None:
    known = {"kmers", "e2e", "hmm"}
    unknown = set(sys.argv[1:]) - known
    if unknown:
        print(f"unknown benchmark(s): {sorted(unknown)}; "
              f"choose from {sorted(known)}", file=sys.stderr)
        sys.exit(2)
    _ensure_backend()
    which = set(sys.argv[1:]) or known
    # hmm last: the driver's primary parsed metric, comparable to r01
    for name, fn in (("kmers", bench_kmers), ("e2e", bench_e2e),
                     ("hmm", bench_hmm)):
        if name not in which:
            continue
        try:
            fn()
        except Exception:
            traceback.print_exc()
            print(json.dumps({
                "metric": f"bench_{name}_failed", "value": None,
                "unit": "", "vs_baseline": None,
            }), flush=True)


if __name__ == "__main__":
    main()
