import time, jax, jax.numpy as jnp, numpy as np
import pangenie_tpu.hmm.pallas_fb as pfb
from pangenie_tpu.utils.synthetic import synthetic_columns

def sync(r):
    return float(np.asarray(sum(jnp.sum(jnp.where(jnp.isfinite(l), l, 0)) for l in jax.tree_util.tree_leaves(r))))

B, N, P, K = 128, 4096, 32, 16
cols = synthetic_columns(n_columns=N, n_paths=P, n_kmers=K, batch_dims=(B,), dtype=jnp.float32)
d1 = type(cols)(*[jnp.asarray(x) for x in cols])
cols2 = synthetic_columns(n_columns=N, n_paths=P, n_kmers=K, batch_dims=(B,), dtype=jnp.float32, seed=1)
d2 = type(cols)(*[jnp.asarray(x) for x in cols2])

for S in (8, 16):
    pfb._pick_segment = lambda P, S=S: S
    f = jax.jit(pfb.forward_backward_batch_pallas.__wrapped__)
    try:
        sync(f(d1)); sync(f(d2))
        ts = []
        for d in (d1, d2, d1, d2):
            t0 = time.perf_counter(); sync(f(d)); ts.append(time.perf_counter()-t0)
        t = min(ts)
        print(f"S={S}: {t*1e3:.1f}ms  {B*N/t:,.0f} cols/s")
    except Exception as e:
        print(f"S={S}: FAIL {str(e)[:120]}")
