"""Benchmark: HMM variant-columns/sec/chip (the genotyper's hot loop).

Runs the batched forward-backward pair-HMM scan (float32 production
path) on a synthetic workload shaped like a real genotyping run
(P=32 paths after panel reduction, K=16 kmers/column, B=128 concurrent
(chromosome-block x path-subset) work items — a whole-genome run keeps
hundreds in flight) and prints ONE JSON line.

Timing honesty: on the tunneled TPU backend, ``block_until_ready`` can
return before the device has executed anything, and repeated identical
dispatches may be deduplicated. Every timed run therefore (a) uses a
DISTINCT input buffer and (b) is synced by a device-side reduction of
its outputs whose scalar is copied to the host — the copy cannot
complete before the run has.

vs_baseline: the reference genotypes 36M variants in 55 min on 24 CPU
cores (BASELINE.md) ≈ 10,909 variant-columns/sec end-to-end — the only
published throughput number. Our metric covers the HMM phase (the
dominant compute), so vs_baseline = columns_per_sec / 10909 is an
upper-bound-flavored comparison; the end-to-end benchmark configs in
BASELINE.json land in later rounds.
"""

import json
import sys
import time

BASELINE_COLUMNS_PER_SEC = 36_000_000 / (55 * 60)


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


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pangenie_tpu.hmm.batch import forward_backward_batch
    from pangenie_tpu.utils.synthetic import synthetic_columns

    _ensure_backend()
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

    # distinct inputs per timed run: no dispatch deduplication possible
    reps = 4
    inputs = [make(seed) for seed in range(reps + 1)]
    float(np.asarray(device_sum(fb(inputs[-1]))))  # compile + warm up

    times = []
    for seed in range(reps):
        start = time.perf_counter()
        result = fb(inputs[seed])
        # device-side reduce + scalar host copy = true completion sync
        float(np.asarray(device_sum(result)))
        times.append(time.perf_counter() - start)
    elapsed = min(times)

    columns_per_sec = B * N / elapsed
    print(
        json.dumps(
            {
                "metric": "hmm_variant_columns_per_sec_per_chip",
                "value": round(columns_per_sec, 1),
                "unit": "columns/s",
                "vs_baseline": round(
                    columns_per_sec / BASELINE_COLUMNS_PER_SEC, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
