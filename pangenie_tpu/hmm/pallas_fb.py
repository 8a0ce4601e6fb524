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
    """ea_s [A*A, LB], oh_s [A, P, LB] -> E [P, P, LB].

    Two-stage expansion: per output-row allele a, first contract the
    column axis (row_a[q] = sum_c ea[a,c] * oh[c][q], A cheap [P, LB]
    FMAs), then one [P, P, LB] FMA spreads it over rows — 2A full-size
    passes instead of the naive 3A^2 (at A=8: 16 vs 192)."""
    LB = ea_s.shape[-1]
    E = jnp.zeros((P, P, LB), dtype)
    for a in range(A):
        row = jnp.zeros((P, LB), dtype)
        for c in range(A):
            row = row + oh_s[c] * ea_s[a * A + c: a * A + c + 1, :]
        E = E + oh_s[a][:, None, :] * row[None, :, :]
    return E


def _mix(carry, u0, u1, u2):
    """Rank-1 transition mix in FACTORED form.

    prev = t0*c + t1*(h_i+h_j-2c) + t2*(h-h_i-h_j+c) regroups to
    u0*c + u1*(h_i+h_j) + u2*h with u0 = t0-2*t1+t2, u1 = t1-t2,
    u2 = t2 (precomputed outside the kernel by `_factor_trans`):
    3 full-size FMA passes instead of 8. With u = (1, 0, 0) this is the
    identity, which removes the per-column is-first select — the carry
    is initialized to ones and u[0] set to (1, 0, 0)."""
    h_i = jnp.sum(carry, axis=1, keepdims=True)   # [P, 1, LB]
    h_j = jnp.sum(carry, axis=0, keepdims=True)   # [1, P, LB]
    h = jnp.sum(h_i, axis=0, keepdims=True)       # [1, 1, LB]
    return u0 * carry + u1 * (h_i + h_j) + u2 * h


def _factor_trans(trans):
    """[..., 3] (t0, t1, t2) -> (u0, u1, u2) for :func:`_mix`, with the
    first column pinned to the identity mix (1, 0, 0)."""
    t0 = trans[..., 0]
    t1 = trans[..., 1]
    t2 = trans[..., 2]
    u = jnp.stack([t0 - 2.0 * t1 + t2, t1 - t2, t2], axis=-1)
    return u.at[..., 0, :].set(
        jnp.asarray([1.0, 0.0, 0.0], u.dtype)
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

    # tr holds FACTORED coefficients (u0, u1, u2) with u[0] = (1, 0, 0):
    # initializing the carry to ones makes the first column's mix the
    # all-ones prev without a per-column select (src/hmm.cpp:236-239).
    @pl.when(i_n == jnp.int32(0))
    def _():
        carry_ref[:] = jnp.ones_like(carry_ref)

    def body(s, carry):
        E = _expand_emission(ea_ref[s], oh_ref[s], P, A, dtype)
        u0, u1, u2 = _trans_parts(tr_ref[s])
        prev = _mix(carry, u0, u1, u2)
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
        u0, u1, u2 = _trans_parts(trn_ref[s])
        mixed = _mix(helper, u0, u1, u2)
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
    tr_t = to_lanes(_factor_trans(columns.trans))      # [NP, 3, LB]
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


# ---------------------------------------------------------------------------
# Generic (any-A) kernel pair: consumes PRECOMPUTED [P, P] state
# emissions instead of expanding them from [A, A] in-kernel, so there is
# no per-column allele cap — one multiallelic SV bubble no longer knocks
# a whole chromosome off the fused path (reference keeps such bubbles in
# the same HMM, src/multiallelicuniquekmers.cpp). Emissions are computed
# A-bucketed (each column pays its own A^2 cost) in
# `bucketed_state_emissions`; posteriors come back raw [P, P] and are
# collapsed to allele pairs outside.
# ---------------------------------------------------------------------------


def _fwd_kernel_e(e_ref, tr_ref, alpha0_ref, alpha_ref, cfwd_ref,
                  carry_ref, *, S: int, P: int):
    i_n = pl.program_id(1)

    # carry enters from alpha0 (ones for the first chunk — with the
    # factored (u0, u1, u2), u[0] = (1, 0, 0) this replaces the
    # per-column is-first select; for later N-chunks it is the
    # previous chunk's final alpha, making the recurrence continuous)
    @pl.when(i_n == jnp.int32(0))
    def _():
        carry_ref[:] = alpha0_ref[:]

    def body(s, carry):
        E = e_ref[s]
        u0, u1, u2 = _trans_parts(tr_ref[s])
        prev = _mix(carry, u0, u1, u2)
        cur = prev * E
        alpha, c = _norm(cur, P)
        alpha_ref[s] = alpha
        cfwd_ref[pl.ds(s, 1), :] = c
        return alpha

    carry_ref[:] = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(S), body, carry_ref[:])


def _bwd_kernel_e(alpha_ref, cfwd_ref, en_ref, trn_ref, last_ref,
                  beta0_ref, posts_ref, beta_out_ref, beta_ref,
                  *, S: int, P: int):
    i_n = pl.program_id(1)

    # beta enters from beta0 (zeros for the final chunk — the is_last
    # override re-seeds at the true last column; for earlier N-chunks
    # it is the following chunk's outgoing beta)
    @pl.when(i_n == jnp.int32(0))
    def _():
        beta_ref[:] = beta0_ref[:]

    def body(r, beta):
        s = jnp.int32(S - 1) - r
        helper = beta * en_ref[s]
        u0, u1, u2 = _trans_parts(trn_ref[s])
        mixed = _mix(helper, u0, u1, u2)
        is_last = last_ref[s][None] > 0          # [1, 1, LB]
        cur = jnp.where(is_last, jnp.ones_like(mixed), mixed)
        beta_new, _c = _norm(cur, P)
        cf = cfwd_ref[pl.ds(s, 1), :][None]      # [1, 1, LB]
        posts_ref[s] = alpha_ref[s] * cur * cf   # [P, P, LB]
        return beta_new

    beta_ref[:] = jax.lax.fori_loop(
        jnp.int32(0), jnp.int32(S), body, beta_ref[:])
    # the same (0, 0, b) output block is revisited every grid step, so
    # the final write is the chunk's outgoing carry
    beta_out_ref[:] = beta_ref[:]


def _pick_segment_e(P: int) -> int:
    """The generic kernels stage three/four [S, P, P, 128] blocks
    (double-buffered); keep their sum within ~8 MB of VMEM."""
    per = P * P * LANE * 4
    for s in (16, 8):
        if 4 * s * per <= 8 * 1024 * 1024:
            return s
    return 8


def _column_buckets(nr_local_np):
    """Host-side bucketing of flat column indices by allele count
    rounded up to a power of two. Returns [(a_bucket, idx, idx_padded)].
    Padded gather rows repeat idx[0] (a member of the same bucket, so
    its truncated-A computation is valid) and are scattered to a dummy
    row."""
    import numpy as np

    out = []
    a_b = 2
    max_nr = int(nr_local_np.max())
    lo = 0
    while lo < max_nr:
        idx = np.nonzero((nr_local_np > lo) & (nr_local_np <= a_b))[0]
        if len(idx):
            padded_n = 1 << max(0, int(np.ceil(np.log2(len(idx)))))
            idx_p = np.concatenate(
                [idx, np.full(padded_n - len(idx), idx[0], dtype=np.int64)]
            )
            out.append((a_b, idx, idx_p))
        lo = a_b
        a_b *= 2
    return out


@partial(jax.jit, static_argnames=("a_s", "P"))
def _bucket_emission_rows(lp, incidence, kmer_mask, undefined,
                          all_zeros, scale, allele_local, a_s: int, P: int):
    """[Mb, P, P] linear state emissions for one bucket.

    The expansion runs as a_s^2 fused elementwise FMA passes over
    [Mb, P, P] — NOT a batched-tiny einsum, which XLA pads to MXU tiles
    (observed: 40x slower and an 80+ s compile on v5e).
    """
    from .emissions import log_emission_allele_matrix

    dtype = lp.dtype
    EA = jnp.exp(jax.vmap(log_emission_allele_matrix)(
        lp, incidence, kmer_mask, undefined, all_zeros, scale
    ))  # [Mb, a_s, a_s]
    Mb = EA.shape[0]
    E = jnp.zeros((Mb, P, P), dtype)
    for a in range(a_s):
        sel_a = (allele_local == a).astype(dtype)[:, :, None]   # [Mb, P, 1]
        for c in range(a_s):
            sel_c = (allele_local == c).astype(dtype)[:, None, :]  # [Mb,1,P]
            E += sel_a * sel_c * EA[:, a, c][:, None, None]
    # flattened [Mb, P*P]: a [*, P, P] jit-boundary buffer gets padded
    # to (8, 128) tiles on TPU (4x HBM at P=32); P*P is lane-aligned
    return E.reshape(Mb, P * P)


def bucketed_state_emissions(columns: ColumnArrays) -> jax.Array:
    """Per-column LINEAR [P, P] state emissions, computed A-bucketed.

    Columns are grouped (host-side) by their own allele count rounded to
    a power of two, so a chromosome whose columns are 99% biallelic pays
    A=2 emission math for those columns even when one SV bubble forces
    the array-wide A to 16. Results are bitwise equal to the full-A
    computation (the extra one-hot terms there multiply exact zeros).

    Args:
      columns: ColumnArrays with leading dims [B, N, ...].

    Returns:
      E [B, N, P*P] linear state emissions (rescaled by exp(-scale)),
      flattened to keep the jit-boundary layout unpadded.
    """
    import numpy as np

    B, N, P = columns.alleles.shape
    A = columns.incidence.shape[3]
    dtype = columns.lp.dtype
    M = B * N

    flat = jax.tree.map(
        lambda x: x.reshape((M,) + x.shape[2:]), columns
    )
    nr_local = np.asarray(flat.nr_local)

    # scatter into row M = dummy row for gather padding; dropped after
    E = jnp.zeros((M + 1, P * P), dtype)
    for a_b, idx, idx_p in _column_buckets(nr_local):
        gidx = jnp.asarray(idx_p)
        a_s = min(a_b, A)
        E_b = _bucket_emission_rows(
            flat.lp[gidx],
            flat.incidence[gidx][:, :, :a_s],
            flat.kmer_mask[gidx],
            flat.undefined[gidx][:, :a_s],
            flat.all_zeros[gidx],
            flat.scale[gidx],
            flat.allele_local[gidx],
            a_s=a_s,
            P=P,
        )
        sidx = np.full(len(idx_p), M, dtype=np.int64)
        sidx[: len(idx)] = idx
        E = E.at[jnp.asarray(sidx)].set(E_b)
    return E[:M].reshape(B, N, P * P)


def bucketed_collapse(posts: jax.Array, columns: ColumnArrays) -> jax.Array:
    """Collapse raw [B, N, P, P] posteriors to allele pairs, A-bucketed.

    posteriors[b, n, a, c] = sum_{p, q: al[p]=a, al[q]=c} posts[b,n,p,q]
    — as masked reduction passes (A per axis), not a batched-tiny
    einsum (same XLA pathology as the emission expansion).
    """
    import numpy as np

    B, N, P = columns.alleles.shape
    A = columns.incidence.shape[3]
    dtype = posts.dtype
    M = B * N

    flat_posts = posts.reshape(M, P * P)
    al = columns.allele_local.reshape(M, P)
    nr_local = np.asarray(columns.nr_local).reshape(M)

    out = jnp.zeros((M + 1, A * A), dtype)
    for a_b, idx, idx_p in _column_buckets(nr_local):
        gidx = jnp.asarray(idx_p)
        a_s = min(a_b, A)
        out_b = _bucket_collapse_rows(
            flat_posts[gidx], al[gidx], a_s=a_s, A=A
        )
        sidx = np.full(len(idx_p), M, dtype=np.int64)
        sidx[: len(idx)] = idx
        out = out.at[jnp.asarray(sidx)].set(out_b)
    return out[:M].reshape(B, N, A, A)


@partial(jax.jit, static_argnames=("a_s", "A"))
def _bucket_collapse_rows(posts_flat, al, a_s: int, A: int):
    dtype = posts_flat.dtype
    Mb, P = al.shape
    posts = posts_flat.reshape(Mb, P, P)
    # rows: [Mb, a_s, P] — sum over p grouped by al[p]
    rows = jnp.stack(
        [
            jnp.sum(posts * (al == a).astype(dtype)[:, :, None], axis=1)
            for a in range(a_s)
        ],
        axis=1,
    )
    # cols: [Mb, a_s, a_s] — sum over q grouped by al[q]
    out = jnp.stack(
        [
            jnp.sum(rows * (al == c).astype(dtype)[:, None, :], axis=2)
            for c in range(a_s)
        ],
        axis=2,
    )
    pad = [(0, 0), (0, A - a_s), (0, A - a_s)]
    # flat [Mb, A*A] keeps the jit-boundary layout unpadded
    return jnp.pad(out, pad).reshape(Mb, A * A)


def forward_backward_batch_pallas_e(columns: ColumnArrays,
                                    interpret: bool = False):
    """Any-A fused forward-backward: bucketed emissions + generic kernels.

    Returns (posteriors [B, N, A, A], log_correction [B, N]) matching
    :func:`forward_backward` up to f32 reduction-order rounding.
    """
    B, N, P = columns.alleles.shape
    A = columns.incidence.shape[3]
    dtype = columns.lp.dtype

    del dtype, A
    E = bucketed_state_emissions(columns)  # [B, N, P*P]
    chunk = _pick_chunk(N, P, B)
    if B < 32 and chunk < _round_up(N, _pick_segment_e(P)):
        # small batches that NEED chunking run per batch element: the
        # kernels want B on lanes, and XLA layout assignment otherwise
        # relayouts the whole resident [B, N, P*P] tensor to B-minor —
        # whose (8,128) tile pads B=2 to 128 (a 64x, tens-of-GB copy).
        # With B=1 the lane transpose is a free singleton reshape, and
        # lane utilization is no worse than the 2-of-128 it was.
        posts_l, corr_l = [], []
        for b in range(B):
            p_b, c_b = _fb_pallas_e_core(
                E[b:b + 1], columns.trans[b:b + 1],
                columns.is_last[b:b + 1], columns.scale[b:b + 1],
                P=P, chunk=chunk, interpret=interpret,
            )
            posts_l.append(p_b)
            corr_l.append(c_b)
        posts = jnp.concatenate(posts_l, axis=0)
        log_corr = jnp.concatenate(corr_l, axis=0)
    else:
        posts, log_corr = _fb_pallas_e_core(
            E, columns.trans, columns.is_last, columns.scale, P=P,
            chunk=chunk, interpret=interpret,
        )
    posteriors = bucketed_collapse(posts, columns)
    return posteriors, log_corr


def _pick_chunk(N: int, P: int, B: int) -> int:
    """Columns per N-chunk: the lane-padded [chunk, P, P, LB] tensors
    (E, alphas, posts, shifted-E — ~5 live at once in the backward
    step) must fit the HBM budget. B is lane-padded to 128, so at
    production batch sizes (B=2 chromosome blocks) chunking is what
    keeps genome-scale N on the kernel at all."""
    from .batch import _hbm_budget

    S = _pick_segment_e(P)
    LB = _round_up(max(B, 1), LANE)
    per_col = P * P * LB * 4
    max_cols = max(S, int(_hbm_budget() // (5 * per_col)))
    NP = _round_up(max(N, 1), S)
    return min(NP, (max_cols // S) * S)


@partial(jax.jit, static_argnames=("P", "chunk", "interpret"))
def _fb_pallas_e_core(E_flat, trans, is_last, scale, P: int,
                      chunk: int = 0, interpret: bool = False):
    """Forward-backward over [B, N] columns in N-chunks of `chunk`
    columns: a lax.scan carries (alpha, beta, boundary E/trans) between
    chunks, each chunk lane-pads and runs the fused kernels, and only
    COMPACT [B, chunk, P*P] tensors cross the scan boundary — the
    checkpoint-recompute pattern (forward twice, alphas chunk-local)
    that keeps HBM at O(chunk * P^2 * 128) instead of O(N * ...)."""
    B, N = E_flat.shape[0], E_flat.shape[1]
    dtype = E_flat.dtype

    LB = _round_up(max(B, 1), LANE)
    S = _pick_segment_e(P)
    if chunk <= 0:
        chunk = _round_up(max(N, 1), S)
    chunk = _round_up(chunk, S)
    NP = _round_up(max(N, 1), chunk)
    n_chunks = NP // chunk

    # pad compact inputs to the chunk multiple (padding sits after the
    # true last column: is_last re-seeds the backward there, so garbage
    # flowing through padded columns never reaches a real posterior —
    # the same argument as the old per-S padding). Chunks are carved
    # with dynamic_slice from the naturally-laid-out [B, NP, ...]
    # tensors: a leading-n_chunks transpose made XLA assign a layout
    # that tile-padded the B=2 axis 64x (34 GB for a 0.5 GB tensor).
    def pad_n(x):
        return jnp.pad(x, [(0, 0), (0, NP - N)] + [(0, 0)] * (x.ndim - 2))

    E_pad = pad_n(E_flat)                              # [B, NP, PP]
    tr_pad = pad_n(_factor_trans(trans))               # [B, NP, 3]
    last_pad = pad_n(is_last.astype(dtype))            # [B, NP]

    def chunk_of(x, i):
        # the barrier stops layout assignment from propagating the
        # kernels' B-minormost preference back through the slice onto
        # the resident tensor (whose (8,128) tile would pad B=2 to 128
        # — a 64x, tens-of-GB relayout copy)
        sl = jax.lax.dynamic_slice_in_dim(x, i * chunk, chunk, axis=1)
        return jax.lax.optimization_barrier(sl)

    def to_lanes(x):  # [B, chunk, ...] -> [chunk, ..., LB]
        x = jnp.moveaxis(x, 0, -1)
        pad = [(0, 0)] * (x.ndim - 1) + [(0, LB - B)]
        return jnp.pad(x.astype(dtype), pad)

    grid = (LB // LANE, chunk // S)
    params = pltpu.CompilerParams(
        dimension_semantics=("arbitrary", "arbitrary"),
        vmem_limit_bytes=100 * 1024 * 1024,
    )

    def spec(block, index_map):
        return pl.BlockSpec(block, index_map, memory_space=pltpu.VMEM)

    def run_fwd(e_t, tr_t, alpha0):
        with jax.enable_x64(False):
            return pl.pallas_call(
                partial(_fwd_kernel_e, S=S, P=P),
                grid=grid,
                in_specs=[
                    spec((S, P, P, LANE), lambda b, n: (n, 0, 0, b)),
                    spec((S, 3, LANE), lambda b, n: (n, 0, b)),
                    spec((P, P, LANE), lambda b, n: (0, 0, b)),
                ],
                out_specs=[
                    spec((S, P, P, LANE), lambda b, n: (n, 0, 0, b)),
                    spec((S, LANE), lambda b, n: (n, b)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((chunk, P, P, LB), dtype),
                    jax.ShapeDtypeStruct((chunk, LB), dtype),
                ],
                scratch_shapes=[pltpu.VMEM((P, P, LANE), dtype)],
                compiler_params=params,
                interpret=interpret,
            )(e_t, tr_t, alpha0)

    def fstep(alpha, i):
        e_t = to_lanes(chunk_of(E_pad, i).reshape(B, chunk, P, P))
        tr_t = to_lanes(chunk_of(tr_pad, i))
        alphas, _c_fwd = run_fwd(e_t, tr_t, alpha)
        return alphas[chunk - 1], alpha            # emit the ENTRY

    alpha_init = jnp.ones((P, P, LB), dtype)
    _, entries = jax.lax.scan(
        fstep, alpha_init, jnp.arange(n_chunks, dtype=jnp.int32)
    )

    nb_n = chunk // S
    rev = lambda n: nb_n - 1 - n  # noqa: E731

    def run_bwd(alphas, c_fwd, en_t, trn_t, last_t, beta0):
        with jax.enable_x64(False):
            return pl.pallas_call(
                partial(_bwd_kernel_e, S=S, P=P),
                grid=grid,
                in_specs=[
                    spec((S, P, P, LANE), lambda b, n: (rev(n), 0, 0, b)),
                    spec((S, LANE), lambda b, n: (rev(n), b)),
                    spec((S, P, P, LANE), lambda b, n: (rev(n), 0, 0, b)),
                    spec((S, 3, LANE), lambda b, n: (rev(n), 0, b)),
                    spec((S, 1, LANE), lambda b, n: (rev(n), 0, b)),
                    spec((P, P, LANE), lambda b, n: (0, 0, b)),
                ],
                out_specs=[
                    spec((S, P, P, LANE),
                         lambda b, n: (rev(n), 0, 0, b)),
                    spec((P, P, LANE), lambda b, n: (0, 0, b)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((chunk, P, P, LB), dtype),
                    jax.ShapeDtypeStruct((P, P, LB), dtype),
                ],
                scratch_shapes=[pltpu.VMEM((P, P, LANE), dtype)],
                compiler_params=params,
                interpret=interpret,
            )(alphas, c_fwd, en_t, trn_t, last_t, beta0)

    def bstep(carry, inp):
        beta, e_first, tr_first = carry
        i, entry = inp
        e_t = to_lanes(chunk_of(E_pad, i).reshape(B, chunk, P, P))
        tr_t = to_lanes(chunk_of(tr_pad, i))
        # recompute this chunk's alphas from its entry carry
        alphas, c_fwd = run_fwd(e_t, tr_t, entry)
        # columns shifted by -1; the chunk's last column reads the
        # FIRST column of the following chunk (from the reverse carry)
        en_t = jnp.concatenate([e_t[1:], e_first[None]], axis=0)
        trn_t = jnp.concatenate([tr_t[1:], tr_first[None]], axis=0)
        last_t = to_lanes(chunk_of(last_pad, i)[:, :, None])
        posts, beta_out = run_bwd(alphas, c_fwd, en_t, trn_t, last_t, beta)
        posts_b = jnp.moveaxis(posts, -1, 0)[:B].reshape(B, chunk, P * P)
        return (beta_out, e_t[0], tr_t[0]), posts_b

    carry0 = (
        jnp.zeros((P, P, LB), dtype),
        jnp.zeros((P, P, LB), dtype),
        jnp.zeros((3, LB), dtype),
    )
    _, posts_chunks = jax.lax.scan(
        bstep, carry0,
        (jnp.arange(n_chunks, dtype=jnp.int32), entries), reverse=True,
    )                                          # [nc, B, chunk, PP]

    posts_b = jnp.moveaxis(posts_chunks, 0, 1).reshape(B, NP, P * P)[:, :N]

    next_scale = jnp.concatenate(
        [scale[:, 1:], jnp.zeros((B, 1), scale.dtype)], axis=1
    )
    return posts_b, scale + next_scale
