"""Real-TPU smoke + timing for the generic (any-A) Pallas FB path.

Compares against the XLA scan on device for numerics and wall-clock.
Run: python benchmarks/smoke_tpu_generic.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from pangenie_tpu.hmm.batch import use_pallas_generic
from pangenie_tpu.hmm.forward_backward import forward_backward
from pangenie_tpu.hmm.pallas_fb import forward_backward_batch_pallas_e
from tests.test_pallas_fb_generic import _f32_device, _mixed_allele_columns


def main():
    print("backend:", jax.devices()[0].platform, flush=True)
    B, N, P, K, A_hi = 128, 4096, 32, 16, 16
    cols = _f32_device(_mixed_allele_columns(B, N, P, K, A_hi, wide_every=97))
    print("eligible:", use_pallas_generic(cols), flush=True)

    t0 = time.perf_counter()
    pal_p, pal_c = forward_backward_batch_pallas_e(cols)
    float(np.asarray(jnp.sum(pal_p)))
    print(f"pallas_e compile+run: {time.perf_counter() - t0:.2f}s", flush=True)

    # timed (distinct input to defeat dedup)
    cols2 = _f32_device(
        _mixed_allele_columns(B, N, P, K, A_hi, wide_every=97, seed=11)
    )
    t0 = time.perf_counter()
    p2, c2 = forward_backward_batch_pallas_e(cols2)
    float(np.asarray(jnp.sum(p2)))
    dt = time.perf_counter() - t0
    print(f"pallas_e steady: {dt:.3f}s = {B * N / dt / 1e6:.2f}M cols/s",
          flush=True)

    # numerics vs XLA scan (smaller shape to keep scan time sane)
    Bs, Ns = 16, 512
    small = _f32_device(_mixed_allele_columns(Bs, Ns, P, K, A_hi))
    ref_p, ref_c = jax.jit(jax.vmap(forward_backward))(small)
    sp, sc = forward_backward_batch_pallas_e(small)
    err = np.max(np.abs(np.asarray(sp) - np.asarray(ref_p)))
    rel = err / max(np.max(np.abs(np.asarray(ref_p))), 1e-30)
    print(f"max abs err vs scan: {err:.3e} (rel {rel:.3e})", flush=True)
    np.testing.assert_allclose(np.asarray(sc), np.asarray(ref_c))
    assert rel < 1e-3, rel
    print("OK", flush=True)


if __name__ == "__main__":
    main()
