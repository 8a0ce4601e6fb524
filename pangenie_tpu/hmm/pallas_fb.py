"""Fused Pallas TPU kernels for the batched forward-backward pair HMM.

The XLA ``lax.scan`` formulation (forward_backward.py) pays ~25us of
per-step dispatch overhead for a few microseconds of VPU work — the
scan over N columns is latency-bound. These kernels run the whole
sequential recurrence inside a single Mosaic kernel with the carry
resident in VMEM, cutting the per-column cost to the VPU work itself.

Layout: the batch dim B is the LANE dim. All arrays are transposed to
[N, ..., B] with B padded to a multiple of 128, so every [P, P, B]
state tensor tiles the (8, 128) VPU registers exactly:

  EA    [N, A*A, B]    linear per-column allele-pair emissions (row-major)
  oh    [N, A, P, B]   exact 0/1 path->local-allele one-hot
  trans [N, 3, B]      (stay^2, stay*switch, switch^2)
  alphas[N, P, P, B]   forward pass output (consumed by backward)
  posts [N, A*A, B]    collapsed allele-pair posteriors

Mosaic constraint shaping: every in-kernel slice is either on a
LEADING dim (oh[s][a] -> [P, B]) or a static 2D [1, B] slice
(ea[a*A+c : +1]); reductions keep >= 2 dims. Slices at non-zero
offsets of a minor dim do not lower.

The emission expansion E = H @ EA @ H^T and the posterior collapse
H^T @ (alpha*cur*c) @ H become A^2 (resp. A) fused multiply-add passes
over [P, P, B] — no gathers, pure VPU broadcasting.

Semantics match forward_backward.forward_backward column-for-column
(reference src/hmm.cpp:175-405): per-column sum normalization with the
underflow -> uniform fallback, is_first/is_last boundary handling, and
raw posterior = alpha * cur * c_fwd. Results agree with the XLA scan
up to f32 reduction-order rounding.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .forward_backward import ColumnArrays, _allele_emissions

LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _expand_emission(ea_s, oh_s, P: int, A: int, dtype):
    """ea_s [A*A, LB], oh_s [A, P, LB] -> E [P, P, LB] (A^2 FMAs)."""
    LB = ea_s.shape[-1]
    E = jnp.zeros((P, P, LB), dtype)
    for a in range(A):
        oh_a = oh_s[a][:, None, :]           # [P, 1, LB]
        for c in range(A):
            oh_c = oh_s[c][None, :, :]       # [1, P, LB]
            term = ea_s[a * A + c: a * A + c + 1, :][None]  # [1, 1, LB]
            E += oh_a * oh_c * term
    return E


def _mix(carry, t0, t1, t2):
    h_i = jnp.sum(carry, axis=1, keepdims=True)   # [P, 1, LB]
    h_j = jnp.sum(carry, axis=0, keepdims=True)   # [1, P, LB]
    h = jnp.sum(h_i, axis=0, keepdims=True)       # [1, 1, LB]
    return (
        t0 * carry
        + t1 * (h_i + h_j - 2.0 * carry)
        + t2 * (h - h_i - h_j + carry)
    )


def _norm(cur, P: int):
    """Per-column sum normalization with uniform underflow fallback.

    Returns (normalized [P, P, LB], c [1, LB]) — c = sum (or 1 if the
    column underflowed to all-zero; src/hmm.cpp:253-267).
    """
    LB = cur.shape[-1]
    ssum = jnp.sum(cur.reshape(P * P, LB), axis=0, keepdims=True)  # [1, LB]
    pos = ssum > 0
    safe = jnp.where(pos, ssum, jnp.ones_like(ssum))
    normed = jnp.where(
        pos[None], cur / safe[None], jnp.full_like(cur, 1.0 / (P * P))
    )
    return normed, safe


def _trans_parts(tr_s):
    """[3, LB] -> three [1, 1, LB] broadcastable factors."""
    return (
        tr_s[0:1, :][None],
        tr_s[1:2, :][None],
        tr_s[2:3, :][None],
    )


def _fwd_kernel(ea_ref, oh_ref, tr_ref, alpha_ref, cfwd_ref, carry_ref,
                *, S: int, P: int, A: int):
    i_n = pl.program_id(1)
    dtype = carry_ref.dtype

    def body(s, carry):
        E = _expand_emission(ea_ref[s], oh_ref[s], P, A, dtype)
        t0, t1, t2 = _trans_parts(tr_ref[s])
        prev = _mix(carry, t0, t1, t2)
        is_first = jnp.logical_and(i_n == jnp.int32(0), s == jnp.int32(0))
        prev = jnp.where(is_first, jnp.ones_like(prev), prev)
        cur = prev * E
        alpha, c = _norm(cur, P)
        alpha_ref[s] = alpha
        cfwd_ref[pl.ds(s, 1), :] = c
        return alpha

    carry_ref[:] = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(S), body, carry_ref[:])


def _bwd_kernel(alpha_ref, cfwd_ref, ean_ref, ohn_ref, trn_ref, oh_ref,
                last_ref, posts_ref, beta_ref, *, S: int, P: int, A: int):
    i_n = pl.program_id(1)
    dtype = beta_ref.dtype

    @pl.when(i_n == jnp.int32(0))
    def _():
        beta_ref[:] = jnp.zeros_like(beta_ref)

    def body(r, beta):
        s = jnp.int32(S - 1) - r
        E_next = _expand_emission(ean_ref[s], ohn_ref[s], P, A, dtype)
        helper = beta * E_next
        t0, t1, t2 = _trans_parts(trn_ref[s])
        mixed = _mix(helper, t0, t1, t2)
        is_last = last_ref[s][None] > 0          # [1, 1, LB]
        cur = jnp.where(is_last, jnp.ones_like(mixed), mixed)
        beta_new, _c = _norm(cur, P)
        cf = cfwd_ref[pl.ds(s, 1), :][None]      # [1, 1, LB]
        post = alpha_ref[s] * cur * cf           # [P, P, LB]
        oh_s = oh_ref[s]                         # [A, P, LB]
        rows = []
        for a in range(A):
            tmp = jnp.sum(oh_s[a][:, None, :] * post, axis=0)  # [P, LB]
            for c in range(A):
                rows.append(
                    jnp.sum(oh_s[c] * tmp, axis=0, keepdims=True)  # [1, LB]
                )
        posts_ref[s] = jnp.concatenate(rows, axis=0)  # [A*A, LB]
        return beta_new

    beta_ref[:] = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(S), body, beta_ref[:])


def _pick_segment(P: int) -> int:
    """Columns per grid step. The (S, LANE) c_fwd block requires
    S % 8 == 0; S=16 halves grid overhead when the [S, P, P, 128]
    alpha block (double-buffered by the pipeline) still fits VMEM."""
    return 16 if 16 * P * P * LANE * 4 <= 8 * 1024 * 1024 else 8


@partial(jax.jit, static_argnames=("interpret",))
def forward_backward_batch_pallas(columns: ColumnArrays,
                                  interpret: bool = False):
    """Fused-TPU-kernel version of vmap(forward_backward).

    Args:
      columns: ColumnArrays with leading dims [B, N, ...], float32.

    Returns:
      (posteriors [B, N, A, A], log_correction [B, N]) matching
      :func:`forward_backward` up to f32 reduction-order rounding.
    """
    B, N, P = columns.alleles.shape
    A = columns.incidence.shape[3]
    dtype = columns.lp.dtype

    EA = jax.vmap(_allele_emissions)(columns)          # [B, N, A, A]
    oh = jax.nn.one_hot(columns.allele_local, A, dtype=dtype)  # [B,N,P,A]

    LB = _round_up(max(B, 1), LANE)
    S = _pick_segment(P)
    NP = _round_up(max(N, 1), S)

    def to_lanes(x):
        """[B, N, ...] -> [NP, ..., LB] zero-padded."""
        x = jnp.moveaxis(x, 0, -1)  # [N, ..., B]
        pad = [(0, NP - x.shape[0])] + [(0, 0)] * (x.ndim - 2) + [(0, LB - B)]
        return jnp.pad(x.astype(dtype), pad)

    ea_t = to_lanes(EA.reshape(B, N, A * A))           # [NP, A*A, LB]
    oh_t = to_lanes(jnp.swapaxes(oh, 2, 3))            # [NP, A, P, LB]
    tr_t = to_lanes(columns.trans)                     # [NP, 3, LB]
    last_t = to_lanes(columns.is_last.astype(dtype)[:, :, None])  # [NP,1,LB]

    nb_n = NP // S
    grid = (LB // LANE, nb_n)
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )

    def spec(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    # the package enables jax_enable_x64 globally (f64 host paths);
    # Mosaic supports no 64-bit types, and under x64 even index_map
    # literals trace as i64 — trace the kernels in 32-bit mode
    with jax.enable_x64(False):
        alphas, c_fwd = pl.pallas_call(
            partial(_fwd_kernel, S=S, P=P, A=A),
            grid=grid,
            in_specs=[
                spec((S, A * A, LANE), lambda b, n: (n, 0, b)),
                spec((S, A, P, LANE), lambda b, n: (n, 0, 0, b)),
                spec((S, 3, LANE), lambda b, n: (n, 0, b)),
            ],
            out_specs=[
                spec((S, P, P, LANE), lambda b, n: (n, 0, 0, b)),
                spec((S, LANE), lambda b, n: (n, b)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((NP, P, P, LB), dtype),
                jax.ShapeDtypeStruct((NP, LB), dtype),
            ],
            scratch_shapes=[pltpu.VMEM((P, P, LANE), dtype)],
            compiler_params=params,
            interpret=interpret,
        )(ea_t, oh_t, tr_t)

    # backward consumes each column's SUCCESSOR emission: shift by one
    ean_t = jnp.roll(ea_t, -1, axis=0)
    ohn_t = jnp.roll(oh_t, -1, axis=0)
    trn_t = jnp.roll(tr_t, -1, axis=0)

    rev = lambda n: nb_n - 1 - n  # noqa: E731

    with jax.enable_x64(False):
        posts = pl.pallas_call(
            partial(_bwd_kernel, S=S, P=P, A=A),
            grid=grid,
            in_specs=[
                spec((S, P, P, LANE), lambda b, n: (rev(n), 0, 0, b)),
                spec((S, LANE), lambda b, n: (rev(n), b)),
                spec((S, A * A, LANE), lambda b, n: (rev(n), 0, b)),
                spec((S, A, P, LANE), lambda b, n: (rev(n), 0, 0, b)),
                spec((S, 3, LANE), lambda b, n: (rev(n), 0, b)),
                spec((S, A, P, LANE), lambda b, n: (rev(n), 0, 0, b)),
                spec((S, 1, LANE), lambda b, n: (rev(n), 0, b)),
            ],
            out_specs=spec((S, A * A, LANE), lambda b, n: (rev(n), 0, b)),
            out_shape=jax.ShapeDtypeStruct((NP, A * A, LB), dtype),
            scratch_shapes=[pltpu.VMEM((P, P, LANE), dtype)],
            compiler_params=params,
            interpret=interpret,
        )(alphas, c_fwd, ean_t, ohn_t, trn_t, oh_t, last_t)

    posteriors = jnp.moveaxis(posts, -1, 0)[:B, :N].reshape(B, N, A, A)

    next_scale = jnp.concatenate(
        [columns.scale[:, 1:], jnp.zeros((B, 1), columns.scale.dtype)],
        axis=1,
    )
    return posteriors, columns.scale + next_scale
