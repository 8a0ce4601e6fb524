import jax, jax.numpy as jnp, numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, LB, S, A = 32, 128, 4, 2

def try_case(name, kern, out_shape, in_shapes):
    try:
        with jax.enable_x64(False):
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in in_shapes],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            args = [jnp.ones(s, jnp.float32) for s in in_shapes]
            r = jax.jit(f)(*args)
            print(f"{name}: OK {np.asarray(r).ravel()[0]}")
    except Exception as e:
        print(f"{name}: FAIL {str(e).splitlines()[0][:110]}")

# 3D -> 2D reduce
def k1(x_ref, o_ref):
    o_ref[:] = jnp.sum(x_ref[:], axis=0)
try_case("3d->2d reduce ax0", k1, (P, LB), [(P, P, LB)])

# 2D -> 1D reduce + 1D write row
def k2(x_ref, o_ref):
    o_ref[0, :] = jnp.sum(x_ref[:, 0, :], axis=0)
try_case("2d->1d reduce + row write", k2, (S, LB), [(P, P, LB)])

# 2D->2D keepdims + 2D row write via ds
def k3(x_ref, o_ref):
    v = jnp.sum(x_ref[:, 0, :], axis=0, keepdims=True)  # [1, LB]
    o_ref[pl.ds(0, 1), :] = v
try_case("keepdims + ds write", k3, (S, LB), [(P, P, LB)])

# 1D extract from 3D, re-expand
def k4(x_ref, o_ref):
    t = x_ref[0]  # [3?, LB] -> here [P, LB]
    o_ref[:] = t[0][None, None, :] * jnp.ones((P, P, LB), jnp.float32)
try_case("1d extract broadcast", k4, (P, P, LB), [(P, P, LB)])

# dynamic s indexing inside fori
def k5(x_ref, o_ref):
    def body(s, acc):
        acc = acc + x_ref[s]
        o_ref[s] = acc
        return acc
    jax.lax.fori_loop(jnp.int32(0), jnp.int32(S), body,
                      jnp.zeros((P, P, LB), jnp.float32))
try_case("dyn index fori write", k5, (S, P, P, LB), [(S, P, P, LB)])
